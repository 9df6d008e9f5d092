"""Table abstraction: parquet fallback + deterministic pseudo-snapshot."""

from __future__ import annotations

from pdf_parser_spark.sources.table import (
    current_snapshot_id,
    is_iceberg_ref,
    load_table,
)


def test_iceberg_ref_detection(tmp_path):
    assert is_iceberg_ref("catalog.db.turns")
    assert not is_iceberg_ref("/data/turns")
    assert not is_iceberg_ref(str(tmp_path))       # existing dir
    assert not is_iceberg_ref("data/turns")


def test_parquet_snapshot_tracks_changes(spark, tmp_path):
    from pdf_parser_spark.sources.turns import synthetic_turns

    d = str(tmp_path / "turns")
    synthetic_turns(spark, 5).write.mode("overwrite").parquet(d)
    s1 = current_snapshot_id(spark, d)
    s1_again = current_snapshot_id(spark, d)
    assert s1 == s1_again                          # stable when unchanged

    assert load_table(spark, d).count() == \
        synthetic_turns(spark, 5).count()

    synthetic_turns(spark, 3).write.mode("append").parquet(d)
    s2 = current_snapshot_id(spark, d)
    assert s2 != s1                                # input change detected

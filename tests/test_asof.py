"""asof_join edge semantics: inclusivity at equal timestamps, null for
no-prior-right, forward-fill across multiple rights."""

from __future__ import annotations

import datetime as dt

from pdf_parser_spark.operators.asof import asof_join


def test_asof_semantics(spark):
    T = dt.datetime
    left = spark.createDataFrame(
        [(1, 10, T(2024, 1, 5)),    # after r2 -> price 200
         (2, 10, T(2024, 1, 3)),    # exactly at r2 -> inclusive, 200
         (3, 10, T(2024, 1, 2)),    # between r1 and r2 -> 100
         (4, 10, T(2023, 12, 1)),   # before everything -> null
         (5, 99, T(2024, 1, 5))],   # key with no right rows -> null
        "event_id long, k long, ts timestamp")
    right = spark.createDataFrame(
        [(10, T(2024, 1, 1), 100),
         (10, T(2024, 1, 3), 200)],
        "k long, rts timestamp, price long")
    out = {r["event_id"]: r["price"] for r in
           asof_join(left, right, key="k", left_ts="ts",
                     right_ts="rts", right_payload=["price"]).collect()}
    assert out == {1: 200, 2: 200, 3: 100, 4: None, 5: None}


def test_asof_null_payload_field_not_backfilled(spark):
    """A NULL field in the matched (latest) right row must stay NULL —
    the fill picks whole right rows atomically, never mixing columns
    from different right rows."""
    from pdf_parser_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 100)], "k long, lts long")
    right = spark.createDataFrame(
        [(1, 10, 5.0, "old"), (1, 50, None, "new")],
        "k long, rts long, px double, tag string")
    out = asof_join(left, right, key="k", left_ts="lts",
                    right_ts="rts", right_payload=["px", "tag"]).collect()
    assert len(out) == 1
    r = out[0]
    # latest right row (rts=50) has px NULL: must NOT backfill 5.0
    assert r["px"] is None
    assert r["tag"] == "new"

"""Skew handling evidence (north_rule: explicit salting for skewed
long conversations): a corpus with one giant conversation must spread
across many tasks when salted, and collapse to few without."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _skewed_turns(spark, big=2000, small=50):
    """One conversation with `big` turns + `small` singleton convs."""
    from pdf_parser_spark.fixtures import get_fixture
    pdf, _g = get_fixture("pdf-min-text")
    text = pdf.decode("latin-1")
    rows = ([("conv-big", i, text) for i in range(big)]
            + [(f"conv-{i:04d}", 0, text) for i in range(small)])
    schema = T.StructType([
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
    ])
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "turn_idx", "text"]),
        schema=schema)


def test_salting_spreads_giant_conversation(spark):
    from pdf_parser_spark.operators.extraction import extract_turns

    turns = _skewed_turns(spark)

    # without salt: hash(conv_id) repartition puts the giant conv in 1
    # partition
    unsalted = turns.repartition(8, F.xxhash64("conv_id"))
    parts_unsalted = (unsalted
                      .filter(F.col("conv_id") == "conv-big")
                      .select(F.spark_partition_id().alias("p"))
                      .distinct().count())
    assert parts_unsalted == 1

    # with salt: the same repartition extract_turns(salt=4) performs
    # spreads the conversation over ~salt partitions
    slim = turns.select("conv_id", "turn_idx", "text").repartition(
        8, F.xxhash64("conv_id"),
        F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(4)))
    parts_salted = (slim.filter(F.col("conv_id") == "conv-big")
                    .select(F.spark_partition_id().alias("p"))
                    .distinct().count())
    assert parts_salted >= 3  # 4 salt values land in >=3 of 8 partitions

    # correctness unaffected: every turn extracted exactly once
    out = extract_turns(turns, salt=4, partitions=8)
    assert out.count() == turns.count()
    assert out.filter(F.col("parse_error").isNotNull()).count() == 0
    assert (out.select("conv_id", "turn_idx").distinct().count()
            == turns.count())

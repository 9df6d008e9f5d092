"""Streaming windowed aggregation with watermark over the events table
shape (event_id, ts, user_id, event_type, value, props).

Demonstrates the late-data-tolerant rollup a transcript-ingest pipeline
runs next to extraction (events/min per type, milli-unit sums — the
same integer-unit determinism rule as the batch queries). State is
bounded by the watermark: windows older than ``watermark`` past the
max observed ts are finalized and dropped from the state store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def windowed_event_counts(events: DataFrame, window: str = "1 hour",
                          watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window rollup; works on both a streaming
    and a batch DataFrame (batch ignores the watermark), so tests can
    assert stream == batch on a drained source."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.round(F.col("value") * 1000).cast("long"))
                 .alias("value_milli"))
            .select(F.col("w.start").alias("window_start"),
                    "event_type", "n_events", "value_milli"))


def events_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    return (spark.readStream.schema(EVENTS_SCHEMA)
            .format("parquet").load(input_dir))

"""Streaming exact deduplication over a turns/documents stream.

A transcript-ingest pipeline sees the same payload repeatedly
(retries, re-sent conversations); deduplicating BEFORE the expensive
extraction kernel is the streaming face of
``operators/extraction.py::extract_turns_dedup``.

``dedup_stream`` uses ``dropDuplicatesWithinWatermark`` on a content
digest: state is bounded by the event-time watermark (an unbounded
``dropDuplicates`` would grow state forever at 10^12 turns — the
watermark IS the scale story), while duplicates inside the watermark
horizon are suppressed exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(turns: DataFrame, ts_col: str = "ts",
                 text_col: str = "text",
                 watermark: str = "1 hour") -> DataFrame:
    """Keep the first-seen row per content digest within the watermark
    horizon. Works on a streaming DataFrame (bounded state) and on a
    batch frame in tests via the batch equivalent below."""
    return (turns
            .withColumn("_digest", F.md5(F.col(text_col)))
            .withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(["_digest"])
            .drop("_digest"))


def dedup_batch(turns: DataFrame, ts_col: str = "ts",
                text_col: str = "text") -> DataFrame:
    """Batch oracle: first row (min ts, then stable tiebreak on
    conv_id/turn_idx) per digest across the whole input."""
    from pyspark.sql.window import Window

    w = (Window.partitionBy(F.md5(F.col(text_col)))
         .orderBy(F.col(ts_col).asc(), F.col("conv_id").asc(),
                  F.col("turn_idx").asc()))
    return (turns.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))

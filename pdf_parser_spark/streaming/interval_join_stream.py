"""Watermarked STREAM-STREAM interval join: clicks attributed to the
errors they precede (the streaming face of the q20 batch range join).

Both sides carry event-time watermarks and the join predicate bounds
the time skew (click in the hour before the error), so Spark can expire
buffered state on both sides — the state-bounded shape required for an
unbounded 10^12-event stream. Without the time bound a stream-stream
join would buffer forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def clicks_before_errors(events: DataFrame, window_s: int = 3600,
                         watermark: str = "2 hours") -> DataFrame:
    """One row per (error, preceding click) pair within ``window_s``.

    ``events`` may be a streaming OR batch DataFrame with the events
    schema; the same code runs both (the batch face is the equality
    oracle in tests). Inner join: zero-click errors produce no rows
    (the batch q20 keeps them via left join + count)."""
    # watermarks require TIMESTAMP (not NTZ); session tz is UTC so the
    # cast is value-preserving and monotone
    ts = F.col("ts").cast("timestamp")
    errors = (events.filter(F.col("event_type") == "error")
              .select(F.col("event_id").alias("error_id"),
                      F.col("user_id").alias("e_user"),
                      ts.alias("e_ts"))
              .withWatermark("e_ts", watermark))
    clicks = (events.filter(F.col("event_type") == "click")
              .select(F.col("event_id").alias("click_id"),
                      F.col("user_id").alias("c_user"),
                      ts.alias("c_ts"))
              .withWatermark("c_ts", watermark))
    cond = (
        (F.col("e_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("e_ts") - F.expr(
            f"INTERVAL {window_s} SECONDS"))
        & (F.col("c_ts") < F.col("e_ts"))
    )
    return (errors.join(clicks, cond)
            .select("error_id", "click_id",
                    F.col("e_user").alias("user_id"), "e_ts", "c_ts"))

"""Custom stateful streaming operator: gap-based sessionization of the
events stream via ``applyInPandasWithState``.

Events for a user belong to one session while consecutive events are
less than ``gap`` apart; a session closes when the watermark passes its
last event + gap (event-time timeout), emitting one row per session.
This is the canonical "operator Spark lacks as a built-in" shape from
the brief — per-key mutable state, event-time timeouts, incremental
emission — and the batch equivalent (lag + cumulative sum of
gap-breaks) is provided for equivalence testing.

State per user: (session_start_us, last_ts_us, n_events, value_milli).
All metric sums are integer milli-units (the repo-wide cross-engine
determinism rule).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_start", T.TimestampType()),
    T.StructField("session_end", T.TimestampType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("value_milli", T.LongType()),
])

STATE_SCHEMA = T.StructType([
    T.StructField("start_us", T.LongType()),
    T.StructField("last_us", T.LongType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("value_milli", T.LongType()),
])

DEFAULT_GAP_S = 1800


def _sessionize_fn(gap_s: int):
    gap_us = gap_s * 1_000_000

    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
           ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        sessions = []

        if state.hasTimedOut:
            if state.exists:
                start_us, last_us, n, vm = state.get
                sessions.append((user_id, start_us, last_us, n, vm))
            state.remove()
        else:
            # ignore_index: Arrow delivers multiple chunks whose
            # RangeIndex labels overlap — concat without it would make
            # .loc/label-alignment fan out and mispair ts/value rows.
            rows = (pd.concat(list(pdfs), ignore_index=True)
                    .sort_values("ts", kind="mergesort"))
            ts_us = rows["ts"].astype("int64") // 1000
            # HALF_UP (away from zero), matching Spark F.round in the
            # batch oracle — pandas .round() is round-half-to-even.
            scaled = rows["value"] * 1000
            vals = (np.sign(scaled)
                    * np.floor(np.abs(scaled) + 0.5)).astype("int64")
            if state.exists:
                start_us, last_us, n, vm = state.get
            else:
                start_us, last_us, n, vm = None, None, 0, 0
            for t, v in zip(ts_us, vals):
                t = int(t)
                if last_us is None:
                    start_us, last_us, n, vm = t, t, 1, int(v)
                elif t - last_us < gap_us:
                    last_us = max(last_us, t)
                    n += 1
                    vm += int(v)
                else:
                    sessions.append((user_id, start_us, last_us, n, vm))
                    start_us, last_us, n, vm = t, t, 1, int(v)
            state.update((int(start_us), int(last_us), int(n), int(vm)))
            # close the open session when event time passes last+gap
            state.setTimeoutTimestamp((last_us + gap_us) // 1000)

        if sessions:
            out = pd.DataFrame(
                sessions, columns=["user_id", "start_us", "last_us",
                                   "n_events", "value_milli"])
            yield pd.DataFrame({
                "user_id": out["user_id"],
                "session_start": pd.to_datetime(out["start_us"], unit="us"),
                "session_end": pd.to_datetime(out["last_us"], unit="us"),
                "n_events": out["n_events"],
                "value_milli": out["value_milli"],
            })

    return fn


def sessionize_stream(events: DataFrame, gap_s: int = DEFAULT_GAP_S,
                      watermark: str = "2 hours") -> DataFrame:
    """Streaming sessionization (append mode): one row per CLOSED
    session; open sessions stay in state until their event-time
    timeout fires."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(
                _sessionize_fn(gap_s),
                outputStructType=SESSION_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout))


def sessionize_batch(events: DataFrame, gap_s: int = DEFAULT_GAP_S
                     ) -> DataFrame:
    """Batch-equivalent sessionization (lag + cumsum of gap breaks) —
    the oracle for the stateful operator AND a usable batch rollup."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    # interval arithmetic (works for TIMESTAMP_NTZ, which cannot cast
    # to BIGINT): break when ts >= prev + gap
    prev = F.lag("ts").over(w)
    gap_break = F.when(
        prev.isNotNull()
        & (F.col("ts") >= prev + F.expr(f"INTERVAL {gap_s} SECONDS")),
        1).otherwise(0)
    sess = (events
            .withColumn("brk", gap_break)
            .withColumn("session_no", F.sum("brk").over(
                w.rowsBetween(Window.unboundedPreceding, 0))))
    return (sess.groupBy("user_id", "session_no")
            .agg(F.min("ts").alias("session_start"),
                 F.max("ts").alias("session_end"),
                 F.count(F.lit(1)).alias("n_events"),
                 F.sum(F.round(F.col("value") * 1000).cast("long"))
                 .alias("value_milli"))
            .drop("session_no"))

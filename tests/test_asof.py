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


def test_asof_sliced_equals_unsliced_under_hot_key(spark):
    """Skew path: one key holds 90% of rows. Sliced execution must (a)
    produce exactly the unsliced result and (b) actually spread the hot
    key across many (key, slice) window partitions."""
    import random

    from pyspark.sql import functions as F

    from pdf_parser_spark.operators.asof import asof_join

    rng = random.Random(13)
    left_rows, right_rows = [], []
    # hot key 0: 900 left rows; cold keys 1..9: 10 each
    for k, n in [(0, 900)] + [(i, 10) for i in range(1, 10)]:
        for _ in range(n):
            left_rows.append((k, rng.randrange(0, 100_000)))
        for ts in rng.sample(range(0, 100_000), 25):
            right_rows.append((k, ts, f"p{k}-{ts}", float(ts) * 0.5))
    left = spark.createDataFrame(left_rows, "k long, lts long")
    right = spark.createDataFrame(
        right_rows, "k long, rts long, tag string, px double")

    kw = dict(key="k", left_ts="lts", right_ts="rts",
              right_payload=["tag", "px"])
    plain = asof_join(left, right, **kw)
    sliced = asof_join(left, right, slices=16, **kw)
    assert plain.exceptAll(sliced).count() == 0
    assert sliced.exceptAll(plain).count() == 0

    # task-size: hot key's 900+25 rows span >= 8 of the 16 slices
    mn, mx = 0, 100_000
    width = max(1.0, (mx - mn + 1) / 16)
    hot_slices = {min(15, int((ts - mn) // width))
                  for k, ts in left_rows if k == 0}
    assert len(hot_slices) >= 8


def test_asof_duplicate_right_ts_deterministic(spark):
    """Duplicate (key, right_ts) rows with distinct payloads: sliced
    and unsliced paths must pick the SAME winner (max payload-struct
    xxhash64) — the tie is deterministic, not engine-dependent."""
    from pyspark.sql import functions as F

    from pdf_parser_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("k", 100, 1), ("k", 50, 2)], "key string, ts long, lid int")
    right = spark.createDataFrame(
        [("k", 50, 10), ("k", 50, 20), ("k", 50, 30), ("k", 90, 7)],
        "key string, ts long, payload int")

    uns = asof_join(left, right, key="key", left_ts="ts", right_ts="ts",
                    right_payload=["payload"])
    sl = asof_join(left, right, key="key", left_ts="ts", right_ts="ts",
                   right_payload=["payload"], slices=4)
    got_u = {r["lid"]: r["payload"] for r in uns.collect()}
    got_s = {r["lid"]: r["payload"] for r in sl.collect()}
    assert got_u == got_s
    assert got_u[1] == 7                       # unambiguous latest
    # the ts=50 winner is the max-xxhash64 payload struct, computed
    # here independently of either execution path
    win = (right.filter("ts = 50")
           .select(F.struct("payload").alias("_r"))
           .withColumn("h", F.xxhash64("_r"))
           .orderBy(F.col("h").desc()).head()["_r"]["payload"])
    assert got_u[2] == win

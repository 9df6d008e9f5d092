"""As-of join — an operator Spark lacks as a built-in, composed from
union + window forward-fill (SURVEY.md custom-operator rule (a):
express with existing DataFrame ops when semantics allow).

``asof_join(left, right, ...)``: for each left row, attach the right
row with the greatest ``right_ts <= left_ts`` for the same key
(inclusive, the standard trade/quote semantics). Implementation:

  1. tag both sides and union them on (key, ts, side, payload...)
  2. one window per key ordered by (ts, side) — right rows sort BEFORE
     left rows at equal ts, making the match inclusive
  3. forward-fill the right payload with last(..., ignorenulls=True)
  4. keep the left rows

Cost: ONE shuffle of both sides on the key (the window partition) —
same as a sort-merge join; no range explosion. Right side must be
unique per (key, ts) — pre-aggregate it deterministically first
(ties would otherwise be engine-dependent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(left: DataFrame, right: DataFrame, key: str,
              left_ts: str, right_ts: str,
              right_payload: list[str],
              slices: int | None = None) -> DataFrame:
    """Left as-of join; output = left columns + right_payload columns
    (null when no right row is at-or-before the left timestamp).

    ``slices``: skew handling. The window partitions by key, so one
    hot key (a conversation holding 90% of rows) lands in one task.
    With ``slices=S`` the timeline is split into S contiguous time
    ranges and the window runs per (key, slice); rows whose match
    lies in an earlier slice get it from a boundary-carry pass — a
    per-(key, slice) summary (<= S rows per key, never skewed) whose
    forward-fill is joined back on (key, slice). Results are
    identical to the unsliced path (pytest-asserted under a planted
    90%-hot-key corpus).

    Duplicate (key, right_ts) rows: both paths break the tie with the
    SAME deterministic rule — the right row whose payload struct has
    the greatest xxhash64 wins — so sliced and unsliced agree even on
    non-pre-aggregated right sides. NOTE for callers: WHICH payload
    survives a true (key, ts) tie is therefore arbitrary (hash order,
    not data order) — merely stable across runs, partitionings and both
    code paths. (Payload-identical duplicates are indistinguishable
    anyway; distinct payloads colliding in xxhash64 is the only
    residual nondeterminism, at 2^-64 odds.) Standard
    practice is still to pre-aggregate the right side to one row per
    (key, ts) — see q19/q21 in queries.py."""
    left_cols = left.columns
    # The entire right payload rides in ONE struct column so the
    # forward-fill picks whole right rows atomically: a NULL in one
    # payload field of the latest right row must surface as NULL, not
    # be backfilled from an older row (per-column last(ignorenulls)
    # would mix columns from different right rows).
    r_struct_type = (
        "struct<" + ",".join(
            f"{c}:{dict(right.dtypes)[c]}" for c in right_payload) + ">")
    l_tagged = left.select(
        F.col(key).alias("_k"), F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left_cols],
        F.lit(None).cast(r_struct_type).alias("_r"))
    r_tagged = right.select(
        F.col(key).alias("_k"), F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
          for c in left_cols],
        F.struct(*[F.col(c) for c in right_payload]).alias("_r"))
    unioned = l_tagged.unionByName(r_tagged)
    if slices and slices > 1:
        filled = _sliced_ffill(unioned, slices)
    else:
        # _side then payload-hash: right rows (side 0) sort before left
        # rows at equal ts (inclusive match), and duplicate-(key, ts)
        # right rows order deterministically — last() picks max hash,
        # mirroring the sliced path's max_by tie-break
        w = (Window.partitionBy("_k")
             .orderBy(F.col("_ts").asc(), F.col("_side").asc(),
                      F.xxhash64("_r").asc())
             .rowsBetween(Window.unboundedPreceding, 0))
        filled = unioned.select(
            "*", F.last("_r", ignorenulls=True).over(w).alias("_f"))
    return (filled.filter(F.col("_side") == 1)
            .select(*[F.col(c) for c in left_cols],
                    *[F.col(f"_f.{c}").alias(c) for c in right_payload]))


def _ts_numeric(unioned: DataFrame) -> "F.Column":
    """Monotone numeric image of _ts for range slicing (UTC session
    tz, so NTZ -> TIMESTAMP -> micros preserves order)."""
    dt = dict(unioned.dtypes)["_ts"]
    if dt.startswith("timestamp"):
        return F.unix_micros(F.col("_ts").cast("timestamp"))
    if dt == "date":
        return F.datediff(F.col("_ts"), F.lit("1970-01-01")).cast("long")
    return F.col("_ts").cast("double")


def _sliced_ffill(unioned: DataFrame, slices: int) -> DataFrame:
    """Forward-fill _r per key with the timeline split into ``slices``
    contiguous ranges + a boundary-carry pass, so a hot key never
    concentrates in one window task."""
    num = _ts_numeric(unioned)
    bounds = unioned.agg(F.min(num).alias("_mn"), F.max(num).alias("_mx"))
    width = F.greatest(
        F.lit(1.0), (F.col("_mx") - F.col("_mn") + 1) / F.lit(slices))
    sliced = (unioned.crossJoin(F.broadcast(bounds))
              .withColumn("_sl", F.least(
                  F.lit(slices - 1),
                  F.floor((num - F.col("_mn")) / width)).cast("int"))
              .drop("_mn", "_mx"))
    # local fill within (key, slice): each hot key spreads over up to
    # `slices` tasks instead of one
    w1 = (Window.partitionBy("_k", "_sl")
          .orderBy(F.col("_ts").asc(), F.col("_side").asc(),
                   F.xxhash64("_r").asc())
          .rowsBetween(Window.unboundedPreceding, 0))
    filled = sliced.select(
        "*", F.last("_r", ignorenulls=True).over(w1).alias("_fl"))
    # boundary carry: per (key, slice) the latest right struct (max_by
    # skips the null ordering of left rows; the (ts, payload-hash)
    # struct key makes equal-ts ties deterministic and identical to
    # the window's ordering above), forward-filled across slices — at
    # most `slices` rows per key, so the per-key window here cannot be
    # skewed. Slices are time-contiguous, hence every right row in an
    # earlier slice is at-or-before every row here.
    summary = (sliced.groupBy("_k", "_sl")
               .agg(F.max_by(
                   "_r",
                   F.when(F.col("_side") == 0,
                          F.struct(F.col("_ts"),
                                   F.xxhash64("_r").alias("_h"))))
                    .alias("_last")))
    w2 = (Window.partitionBy("_k").orderBy("_sl")
          .rowsBetween(Window.unboundedPreceding, -1))
    carry = summary.select(
        "_k", "_sl",
        F.last("_last", ignorenulls=True).over(w2).alias("_carry"))
    return (filled.join(carry, ["_k", "_sl"], "left")
            .withColumn("_f", F.coalesce("_fl", "_carry"))
            .drop("_fl", "_carry", "_sl"))

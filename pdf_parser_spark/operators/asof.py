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
              right_payload: list[str]) -> DataFrame:
    """Left as-of join; output = left columns + right_payload columns
    (null when no right row is at-or-before the left timestamp)."""
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
    w = (Window.partitionBy("_k")
         .orderBy(F.col("_ts").asc(), F.col("_side").asc())
         .rowsBetween(Window.unboundedPreceding, 0))
    filled = unioned.select(
        "*", F.last("_r", ignorenulls=True).over(w).alias("_f"))
    return (filled.filter(F.col("_side") == 1)
            .select(*[F.col(c) for c in left_cols],
                    *[F.col(f"_f.{c}").alias(c) for c in right_payload]))

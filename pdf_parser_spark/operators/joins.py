"""Skew-safe join utilities.

``salted_join`` — the classic hot-key remedy when AQE's skew-join
splitting isn't available or isn't enough: the big (skewed) side gets
a random salt in [0, salt), the small side is replicated salt times,
and the join key becomes (key, salt). One hot key then hashes to
``salt`` different shuffle partitions instead of one. Correctness is
salt-invariant: every big-side row still meets every matching
small-side row exactly once.

Cost model: small side inflates salt×(so keep it the dimension side),
big side shuffles once either way. At 100 TB with a known hot-key
distribution, derive ``salt`` from observed bytes-per-key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(big: DataFrame, small: DataFrame, on: str,
                salt: int = 8, how: str = "inner",
                seed: int = 42) -> DataFrame:
    """Join ``big`` (skewed on ``on``) with ``small`` using key
    salting. Output columns = the plain join's (salt column dropped).
    """
    if salt < 1:
        raise ValueError("salt must be >= 1")
    if how not in ("inner", "left", "left_outer", "leftouter",
                   "left_semi", "leftsemi", "left_anti", "leftanti"):
        # right/full would emit unmatched SMALL rows once per salt
        # replica — wrong by construction
        raise ValueError(f"salted_join does not support how={how!r}")
    big_s = big.withColumn(
        SALT_COL, (F.rand(seed) * salt).cast("int"))
    small_s = small.withColumn(
        SALT_COL,
        F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    joined = big_s.join(small_s, [on, SALT_COL], how)
    return joined.drop(SALT_COL)

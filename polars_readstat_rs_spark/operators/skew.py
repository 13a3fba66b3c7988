"""Skew-handling join utilities.

``salted_join`` is the classic hot-key remedy: the skewed (large) side
gets a random salt in [0, salts), the small side is exploded once per
salt value, and the join key becomes (key, salt) — a hot key's rows
spread over ``salts`` shuffle partitions instead of one straggler task.
AQE's skew-join splitting handles moderate skew automatically; salting
is for the pathological keys AQE can't subdivide (single-key hash
aggregations feeding the join, power-law key distributions at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


_SALT_SAFE_HOW = ("inner", "left", "leftouter", "left_outer", "left_semi", "leftsemi",
                  "left_anti", "leftanti", "semi", "anti")


def salted_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    how: str = "inner",
    salts: int = 16,
) -> DataFrame:
    """Equi-join on ``key`` with the large side salted.

    Result is identical to ``large.join(small, key, how)`` for the
    supported join types; only the shuffle distribution changes.
    ``small`` is replicated ``salts`` times, so keep it the dimension
    side. Right/full-outer joins are rejected: unmatched small-side rows
    would surface once per salt replica, silently duplicating output.
    """
    if how.lower().replace("_", "") not in {h.replace("_", "") for h in _SALT_SAFE_HOW}:
        raise ValueError(
            f"salted_join supports inner/left/left_semi/left_anti joins, not {how!r}: "
            "the exploded small side would duplicate unmatched right-side rows"
        )
    salted_large = large.withColumn("__salt", (F.rand(seed=42) * salts).cast("int"))
    salted_small = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salts)]))
    )
    out = salted_large.join(salted_small, [key, "__salt"], how)
    return out.drop("__salt")

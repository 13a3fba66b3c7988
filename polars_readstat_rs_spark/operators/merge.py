"""Upsert (MERGE INTO) for plain-parquet pipelines.

Spark's SQL MERGE needs a transactional table format; a continuously
ingesting pipeline on raw parquet expresses the same "updates win,
inserts append" contract as one shuffle: tag each side with a priority,
union, and keep the highest-priority row per key. That is a single
hash-shuffle on the key (no join at all — the union's map side is
shuffle-free), so it scales like a groupBy and is immune to the
full-outer-join null-handling traps.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def upsert(base: DataFrame, updates: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    """Rows of ``updates`` replace same-key rows of ``base``; unmatched
    update rows are inserted. Schemas must match. Keys are assumed
    unique within each side (the usual CDC contract); if a side carries
    duplicates, every duplicate of the winning side survives —
    deterministic, but call dropDuplicates first if that's not wanted.
    """
    if base.columns != updates.columns:
        raise ValueError(f"schema mismatch: {base.columns} vs {updates.columns}")
    clash = {"_pri", "_mx"} & set(base.columns)
    if clash:
        # withColumn would silently REPLACE (and drop() later remove) a
        # user column of the same name — refuse instead of destroying data
        raise ValueError(f"upsert reserves column names {sorted(clash)}; rename them first")
    tagged = updates.withColumn("_pri", F.lit(1)).unionByName(
        base.withColumn("_pri", F.lit(0))
    )
    w = Window.partitionBy(*key_cols)
    return (
        tagged.withColumn("_mx", F.max("_pri").over(w))
        .filter(F.col("_pri") == F.col("_mx"))
        .drop("_pri", "_mx")
    )


def snapshot_diff(
    old: DataFrame, new: DataFrame, keys: list[str], compare_cols: list[str]
) -> DataFrame:
    """Keyed diff of two table snapshots — the CDC-audit companion to
    :func:`upsert`: classify every key as added / removed / changed /
    unchanged by a full outer join on the key and null-safe column
    comparison (no hashing, so the classification is engine-exact and
    null-vs-null counts as equal).

    One shuffle on the key on each side. At 100 TB both sides are
    key-partitioned scans; emit-side filters (e.g. dropping 'unchanged')
    push into the join's output projection.
    """
    clash = {"_in_o", "_in_n"} & (set(old.columns) | set(new.columns))
    if clash:
        raise ValueError(f"snapshot_diff reserves column names {sorted(clash)}; rename them first")
    # presence sentinels (a compare column may be legitimately NULL, so
    # side-membership can't be inferred from the data columns)
    o = old.select(*keys, F.lit(1).alias("_in_o"), *[F.col(c).alias(f"_o_{c}") for c in compare_cols])
    n = new.select(*keys, F.lit(1).alias("_in_n"), *[F.col(c).alias(f"_n_{c}") for c in compare_cols])
    j = o.join(n, keys, "full_outer")
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
    change = (
        F.when(F.col("_in_o").isNull(), F.lit("added"))
        .when(F.col("_in_n").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(*keys, change.alias("change_type"))

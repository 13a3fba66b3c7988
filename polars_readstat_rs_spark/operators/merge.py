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
    tagged = updates.withColumn("_pri", F.lit(1)).unionByName(
        base.withColumn("_pri", F.lit(0))
    )
    w = Window.partitionBy(*key_cols)
    return (
        tagged.withColumn("_mx", F.max("_pri").over(w))
        .filter(F.col("_pri") == F.col("_mx"))
        .drop("_pri", "_mx")
    )

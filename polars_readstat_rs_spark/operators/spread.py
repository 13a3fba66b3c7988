"""Narrow-input widening without the shrink-at-scale trap.

The synthetic document tables arrive as ONE parquet split, which would
serialize per-row-expensive stages (explode/shingle/hash) on a single
task — so several operators repartition first. A FIXED repartition(32),
however, is a scale bug in the other direction: at 100 TB the corpus
arrives in thousands of partitions and a fixed number would CONCENTRATE
it. ``spread`` widens only when the input is narrower than the
session's parallelism and is a no-op on an already-wide corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, minimum: int | None = None) -> DataFrame:
    """Repartition up to ``minimum`` (default: defaultParallelism) only
    if the plan currently has fewer partitions; never shrinks."""
    target = minimum or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df

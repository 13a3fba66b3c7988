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
    if the plan currently has fewer partitions; never shrinks.

    The probe (df.rdd.getNumPartitions) costs one extra physical
    planning pass at operator-construction time and is unavailable on
    Spark Connect — there the input is left untouched (Connect sources
    split via maxPartitionBytes; AQE handles the rest)."""
    try:
        sc = df.sparkSession.sparkContext
        current = df.rdd.getNumPartitions()
    except Exception:  # Spark Connect: no RDD access
        return df
    target = minimum or sc.defaultParallelism
    if current < target:
        return df.repartition(target)
    return df

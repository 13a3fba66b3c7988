"""Bucketed tables: pre-shuffled layouts for co-located joins and aggs.

At 100 TB the dominant cost of a fact-fact join is the shuffle of both
sides. Writing the fact tables bucketed (hash-partitioned into a fixed
number of files per key column, optionally sorted within buckets) moves
that shuffle to write time, once; every subsequent equi-join or groupBy
on the bucket columns reads both sides already co-partitioned and runs
shuffle-free (Catalyst recognizes the bucketing as a satisfied
HashPartitioning requirement — the plan shows SortMergeJoin with NO
Exchange under either side).

Rules of thumb encoded here:
- bucket counts must MATCH (or divide) across tables meant to be joined,
  so both sides land in compatible hash spaces;
- sortBy on the join key makes the within-bucket merge zero-sort;
- bucket count is a real tuning knob: ~(table size / 256 MB) rounded to
  a power of two, fixed once per table family.

Spark only honors bucketing through the catalog (``saveAsTable``), not
bare ``parquet(path)`` — these helpers write external tables with an
explicit ``path`` so the data stays wherever the pipeline keeps it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: Sequence[str],
    num_buckets: int,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as an external bucketed parquet table named ``table``
    at ``path``. ``sort_cols`` defaults to ``bucket_cols`` (sorted
    buckets make downstream merge joins sort-free)."""
    writer = (
        df.write.format("parquet")
        .mode(mode)
        .option("path", path)
        .bucketBy(num_buckets, *bucket_cols)
    )
    writer = writer.sortBy(*(sort_cols if sort_cols is not None else bucket_cols))
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str],
    how: str = "inner",
    force_merge: bool = False,
) -> DataFrame:
    """Join two identically-bucketed catalog tables on their bucket
    columns. With matching bucket counts this plans as a shuffle-free
    sort-merge join; tests assert the absence of Exchange nodes.
    ``force_merge`` adds a MERGE hint so the co-located SMJ survives
    even when one side is small enough to broadcast — at test scale the
    dims fit the broadcast threshold, but the plan being pinned is the
    100 TB fact-fact shape where neither side broadcasts."""
    lt = spark.table(left_table)
    if force_merge:
        lt = lt.hint("merge")
    return lt.join(spark.table(right_table), list(on), how)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    mode: str = "overwrite",
) -> None:
    """Hive-style partitioned parquet layout (``path/col=value/...``).

    The complementary layout to bucketing: bucketing pre-shuffles for
    JOIN keys, directory partitioning prunes for FILTER keys. At 100 TB
    a date/tenant-partitioned fact table turns a day's query into a
    one-directory scan — the listing itself is the pushdown. Keep
    partition cardinality bounded (date, region — never user_id): each
    value is a directory, and millions of tiny files kill the listing
    and the name node alike.
    """
    df.write.format("parquet").mode(mode).partitionBy(*partition_cols).save(path)


def read_pruned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned layout; filters on partition columns prune at
    planning time (assert via explain: PartitionFilters, and the scan's
    'number of files read')."""
    return spark.read.parquet(path)


def zvalue(cols: list, bits: int = 16):
    """Morton (Z-order) key: interleave the low ``bits`` bits of each
    (non-negative integral) column expression. Rows close in z-value are
    close in EVERY interleaved dimension, so range-partitioning by
    z-value clusters a multi-dimensional space onto files — the layout
    lever that lets min/max (row-group / file) statistics prune scans
    filtered on ANY of the dimensions, where a plain sort only serves
    its leading column.

    Pure bit arithmetic (shiftleft/or) inside codegen; 2 dims x 16 bits
    fills 32 bits — widen ``bits`` as domains require (total must stay
    < 63)."""
    assert len(cols) * bits < 63, "z-value must fit a signed 64-bit long"
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * len(cols) + i))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    files: int = 8,
    bits: int = 16,
    fmt: str = "parquet",
) -> None:
    """Write ``df`` as ``files`` files range-partitioned by the Morton
    key of ``cols`` — multi-dimensional clustering for stats-based
    pruning. One range shuffle (sampled boundaries), no global sort.
    The key column name dodges collisions so a table that already has a
    ``_z`` column round-trips untouched (zorder_compact rewrites
    arbitrary on-disk tables through this)."""
    zcol = "_z"
    while zcol in df.columns:
        zcol += "_"
    keyed = df.withColumn(zcol, zvalue([F.col(c) for c in cols], bits))
    (
        keyed.repartitionByRange(files, zcol)
        .sortWithinPartitions(zcol)
        .drop(zcol)
        .write.format(fmt)
        .mode("overwrite")
        .save(path)
    )

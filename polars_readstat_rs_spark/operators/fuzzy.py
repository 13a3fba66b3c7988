"""Blocked fuzzy entity matching (edit-distance record linkage).

The classic entity-resolution shape for catalog/name data: normalize to
DISTINCT names first (vocabulary-sized, orders of magnitude smaller than
the fact table), generate candidate pairs only WITHIN a blocking key,
then verify candidates with an exact edit-distance predicate.

Scale shape (100 TB): the distinct() reduces the problem from row count
to vocabulary size before any pairing; the self-join is an equi-join on
the block key (one shuffle, AQE free to broadcast the deduplicated
side); the quadratic term is bounded per block and hot blocks above
``max_block`` are excluded deterministically (same hot-cell discipline
as similarity.blocked_neardup / semantic_dedup). levenshtein() is a
JVM built-in — no Python in the pair loop.

No reference counterpart (the reference is a statistical-file reader);
this is part of the training-data-pipeline surface (entity dedup of
titles/authors/product names before text dedup).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def blocked_fuzzy_pairs(
    df: DataFrame,
    name_col: str,
    block: Column,
    max_dist: int = 3,
    max_block: int = 10_000,
) -> DataFrame:
    """All pairs of DISTINCT ``name_col`` values sharing a block key with
    levenshtein distance <= ``max_dist``.

    ``block`` is an expression over the column ``name`` (the distinct,
    renamed name column) — e.g. the last token, a phonetic code, a
    length bucket. Blocks with more than ``max_block`` distinct names
    are dropped entirely (deterministic — a block is in or out based on
    its size, never a partial sample), keeping the per-block quadratic
    cost bounded; at real scale a too-hot block means the blocking key
    is wrong, not that more compute is needed.

    Returns (name_a, name_b, dist) with name_a < name_b (each unordered
    pair once).
    """
    names = df.select(F.col(name_col).alias("name")).distinct()
    blocked = names.withColumn("_blk", block)
    sizes = blocked.groupBy("_blk").agg(F.count(F.lit(1)).alias("_bn"))
    ok = blocked.join(
        F.broadcast(sizes.filter(F.col("_bn") <= max_block).select("_blk")), "_blk"
    )
    a = ok.select(F.col("_blk"), F.col("name").alias("name_a"))
    b = ok.select(F.col("_blk"), F.col("name").alias("name_b"))
    return (
        a.join(b, "_blk")
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= max_dist)
        .select("name_a", "name_b", "dist")
    )


def fuzzy_join(
    facts: DataFrame,
    dim: DataFrame,
    fact_id: str,
    fact_name: str,
    dim_name: str,
    block_fact: Column,
    block_dim: Column,
    max_dist: int = 2,
) -> DataFrame:
    """Fuzzy left-join of a fact table to a (small) dimension by name:
    block-key equi-join + levenshtein verify, keeping each fact row's
    single best (lowest-distance, ties broken by dim name) match.
    ``fact_id`` must be a unique row key on the fact side.

    The dim side is deduplicated and broadcast (dimension tables are
    small by contract); the only wide shuffle is the per-fact-row
    best-match selection, a window keyed on the fact's own id — the
    natural uniform partition key."""
    from pyspark.sql.window import Window

    d = F.broadcast(
        dim.select(F.col(dim_name).alias("_dname"), block_dim.alias("_blk")).distinct()
    )
    cand = (
        facts.withColumn("_blk", block_fact)
        .join(d, "_blk", "left")
        .withColumn(
            "dist",
            F.when(
                F.levenshtein(F.col(fact_name), F.col("_dname")) <= max_dist,
                F.levenshtein(F.col(fact_name), F.col("_dname")),
            ),
        )
    )
    w = Window.partitionBy(fact_id).orderBy(
        F.col("dist").asc_nulls_last(), F.col("_dname").asc_nulls_last()
    )
    return (
        cand.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            *facts.columns,
            F.when(F.col("dist").isNotNull(), F.col("_dname")).alias("matched_name"),
            F.col("dist").alias("match_dist"),
        )
    )

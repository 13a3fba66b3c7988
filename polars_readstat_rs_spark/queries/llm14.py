"""Round-12 gates: the chunk-pair near-dup decomposition and the
clustering-mode compaction plan.

v24 gates the r12 rewrite of
``operators/similarity.py:blocked_neardup_pairs`` AT THE DECOMPOSED
SHAPE: chunk_rows=16 forces every sf0.001+ blocking cell through
multiple diagonal AND cross chunk-pair tasks (cells are 50+ vectors),
and the oracle is the same exhaustive same-label pair enumeration v02
uses — so a wrong triangle split (a dropped cross pair, a duplicated
diagonal pair, a fold-order drift in the per-chunk Gram) hash-
mismatches immediately. v02 keeps gating the default (cells below the
4096 default degenerate to one task); v24 pins the multi-task path the
sf10 scale route actually exercises.

p19 gates ``compaction_plan(keep_zero_benefit=True)`` — the CLUSTERING
plan mode zorder_compact consumes (r12: suppressing zero-benefit bins
left those files outside the z-order, overlapping the clustered
output). Identical packing semantics to p18 minus the benefit filter:
the oracle drops p18's HAVING clause and nothing else, so the delta
under test is exactly the retained zero-benefit rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import maintenance, similarity
from ..tables import load_table
from .llm import _cosine_sql
from .llm13 import _P18_MOD, _P18_MULT, _P18_SMALL, _P18_TARGET
from .registry import register

# ---------------------------------------------------------------- v24


@register(
    "v24_chunked_neardup_parity",
    oracle=f"""
    SELECT blk, a_id, b_id, sim FROM (
      SELECT a.label AS blk, a.vec_id AS a_id, b.vec_id AS b_id,
             {_cosine_sql('a.embedding', 'b.embedding')} AS sim
      FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
    ) WHERE sim >= 0.4
    """,
)
def v24_chunked_neardup_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """blocked_neardup_pairs with chunk_rows=16: the triangle chunk-pair
    decomposition must reproduce the exhaustive same-cell pair set
    exactly while running every cell as many independent tasks (cells
    hold 50+ vectors at every SF, so 16-row chunks force >= 4 chunks
    per cell: diagonal within-chunk tasks plus all cross-chunk
    bipartite tasks)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.blocked_neardup_pairs(emb, threshold=0.4, chunk_rows=16)


# ---------------------------------------------------------------- p19


@register(
    "p19_clustering_plan",
    oracle=f"""
    WITH files AS (
      SELECT p_brand AS part, CAST(p_partkey AS BIGINT) AS file_id,
             CAST((p_partkey * {_P18_MULT}) % {_P18_MOD} + 1024 AS BIGINT) AS size_bytes
      FROM part),
    small AS (SELECT * FROM files WHERE size_bytes < {_P18_SMALL}),
    eligible AS (SELECT part FROM small GROUP BY part HAVING count(*) >= 2),
    cand AS (SELECT s.* FROM small s JOIN eligible e USING (part)),
    packed AS (
      SELECT part, file_id, size_bytes,
             sum(size_bytes) OVER (PARTITION BY part
               ORDER BY size_bytes DESC, file_id
               ROWS UNBOUNDED PRECEDING) AS _cum
      FROM cand),
    jobs AS (
      SELECT part, file_id, size_bytes,
             CAST((_cum - size_bytes) // {_P18_TARGET} AS INT) AS job_idx
      FROM packed)
    SELECT part, job_idx,
           CAST(count(*) AS INT) AS n_files,
           CAST(sum(size_bytes) AS BIGINT) AS input_bytes,
           CAST(greatest(1, ceil(sum(size_bytes) / CAST({_P18_TARGET} AS DOUBLE))) AS INT)
             AS est_output_files,
           CAST(count(*) - greatest(1, ceil(sum(size_bytes) / CAST({_P18_TARGET} AS DOUBLE))) AS INT)
             AS files_removed,
           string_agg(CAST(file_id AS VARCHAR), ',' ORDER BY size_bytes DESC, file_id)
             AS file_manifest
    FROM jobs GROUP BY part, job_idx
    """,
)
def p19_clustering_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The clustering-mode compaction plan (keep_zero_benefit=True):
    identical eligibility/packing/byte accounting to p18, but
    zero-benefit bins survive — zorder_compact rewrites them anyway,
    and suppressing them would leave files outside the z-order whose
    ranges overlap the clustered output."""
    part = load_table(spark, sf_dir, "part")
    files = part.select(
        F.col("p_brand").alias("part"),
        F.col("p_partkey").cast("long").alias("file_id"),
        (
            (F.col("p_partkey").cast("long") * F.lit(_P18_MULT)) % F.lit(_P18_MOD)
            + F.lit(1024)
        ).alias("size_bytes"),
    )
    return maintenance.compaction_plan(
        files,
        part_col="part",
        file_col="file_id",
        size_col="size_bytes",
        target_bytes=_P18_TARGET,
        small_threshold=_P18_SMALL,
        keep_zero_benefit=True,
    )

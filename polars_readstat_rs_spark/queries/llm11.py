"""Round-11 additions.

v19 quantifies the ``max_block`` cap on blocked near-dup pairs (r10
verdict item 4): ``blocked_neardup_pairs`` is exact but O(cell^2) per
blocking cell, so at 100 TB a runaway hot cell needs the cap — which
deterministically keeps only the ``max_block`` lowest-id members.  This
gate measures the pair recall each cap retains against the uncapped
truth, completing the sizing-curve family (d19/d20 band widths, v17
nprobe, v18 PQ m): the scale-safe setting ships with a measured number,
not prose.

Determinism: counts are exact BIGINTs; recall is one correctly-rounded
IEEE division of two BIGINTs with the zero-truth NULL guard on both
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup, similarity, textstats
from ..tables import load_table
from .llm import _bpe_train_oracle, _cosine_sql
from .registry import register

# truncation curve against the testdata label cells (sf0.01 max cell 59,
# sf0.1 max 218): 16 truncates everywhere, 64 only at sf0.1, 256 nowhere
# (the cap >= cell regime must report recall exactly 1.0)
_V19_CAPS = (16, 64, 256)


def _v19_oracle() -> str:
    cap_ctes = ",\n    ".join(
        f"f{k} AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS c FROM ("
        f"SELECT {_cosine_sql('a.embedding', 'b.embedding')} AS sim "
        f"FROM r a JOIN r b ON a.label = b.label AND a.vec_id < b.vec_id "
        f"AND a.rk <= {k} AND b.rk <= {k}) WHERE sim >= 0.4)"
        for k in _V19_CAPS
    )
    rows = " UNION ALL ".join(
        f"SELECT {k} AS max_block, t.c AS n_truth, f{k}.c AS n_found, "
        f"CASE WHEN t.c = 0 THEN NULL "
        f"ELSE CAST(f{k}.c AS DOUBLE) / CAST(t.c AS DOUBLE) END AS recall "
        f"FROM f{k}, t"
        for k in _V19_CAPS
    )
    return f"""
    WITH r AS MATERIALIZED (
      SELECT label, vec_id, embedding,
             row_number() OVER (PARTITION BY label ORDER BY vec_id) AS rk
      FROM embeddings
      WHERE label IS NOT NULL AND vec_id IS NOT NULL AND embedding IS NOT NULL),
    t AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS c FROM (
      SELECT {_cosine_sql('a.embedding', 'b.embedding')} AS sim
      FROM r a JOIN r b ON a.label = b.label AND a.vec_id < b.vec_id)
      WHERE sim >= 0.4),
    {cap_ctes}
    {rows}
    """


@register(
    "v20_semdedup_keep",
    oracle=f"""
    WITH pairs AS MATERIALIZED (
      SELECT a_id, b_id FROM (
        SELECT a.vec_id AS a_id, b.vec_id AS b_id,
               {_cosine_sql('a.embedding', 'b.embedding')} AS sim
        FROM embeddings a JOIN embeddings b
          ON a.label = b.label AND a.vec_id < b.vec_id
      ) WHERE sim >= 0.4),
    edges AS MATERIALIZED (SELECT a_id AS src, b_id AS dst FROM pairs
              UNION SELECT b_id, a_id FROM pairs),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    -- label propagation, NOT full transitive closure: only labels
    -- SMALLER than the receiving node travel (r.comp < e.dst). Exact:
    -- the component minimum m reaches every member along any path,
    -- because every other member's id exceeds m, so each hop's
    -- condition holds; labels >= dst can never win dst's min. The r11
    -- closure variant kept ALL k^2 (node, label) pairs per component
    -- and degenerated at sf1 (big cells -> dense near-dup clusters),
    -- which is exactly the fixture-degeneration this round's sf1
    -- sweep existed to catch.
    reach AS (
      WITH RECURSIVE r(node, comp) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT e.dst, r.comp FROM r JOIN edges e
          ON e.src = r.node AND r.comp < e.dst
      ) SELECT node, comp FROM r),
    comp AS (SELECT node, min(comp) AS comp FROM reach GROUP BY node)
    SELECT comp AS keep_id, CAST(count(*) AS BIGINT) AS n_members
    FROM comp GROUP BY comp
    """,
)
def v20_semdedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-shaped SEMANTIC dedup end to end (Abbas et al. 2023's
    cluster -> within-cluster cosine near-dup -> keep-one pipeline, the
    embedding-space sibling of the text-side d06/d12 compositions):
    blocked cosine pairs within each label cell
    (operators/similarity.py:blocked_neardup_pairs — one shuffle +
    per-cell numpy Gram), distributed min-label connected components
    (operators/dedup.py:neardup_components — localCheckpoint'd
    propagation, O(diameter) iterations), then one row per duplicate
    cluster: the kept representative (smallest reachable id — the
    component label itself) and the cluster size.  The oracle walks the
    same graph with recursive SQL over the v02 pair set."""
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = similarity.blocked_neardup_pairs(emb, threshold=0.4)
    comp = dedup.neardup_components(pairs.select("a_id", "b_id"))
    return comp.groupBy(F.col("comp").alias("keep_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members")
    )


@register("t25_bpe_batched_train", oracle=_bpe_train_oracle(8))
def t25_bpe_batched_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-merge BPE training through the BATCHED pass scheduler
    (operators/textstats.py:bpe_train, r11 rewrite): multiple merges
    apply per Spark job when the driver-side safety proof holds, and
    the learned vocabulary must STILL match DuckDB running all 8
    iterations unrolled one-at-a-time — the cross-engine re-statement
    of the batch-equals-sequential equivalence the unit test pins."""
    docs = load_table(spark, sf_dir, "documents")
    return textstats.bpe_train(docs, n_merges=8)


@register("v19_capped_neardup_recall", oracle=_v19_oracle())
def v19_capped_neardup_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall retained by ``blocked_neardup_pairs(max_block=K)`` vs the
    uncapped truth (operators/similarity.py:blocked_neardup_pairs).
    The cap keeps the K lowest-id members of each cell — deterministic,
    so the DuckDB oracle replicates it exactly with a row_number rank
    filter.  Capped pairs are a strict subset of the truth pairs (the
    cap only removes rows), so n_found / n_truth IS pair recall."""
    emb = load_table(spark, sf_dir, "embeddings")
    truth = similarity.blocked_neardup_pairs(emb, threshold=0.4)
    # 1-row bounded aggs, eagerly cut so each union reference doesn't
    # re-run the Gram kernels (the d19/v17/g05 lineage discipline)
    t = truth.agg(F.count(F.lit(1)).cast("bigint").alias("n_truth")).localCheckpoint()
    out = None
    for k in _V19_CAPS:
        capped = similarity.blocked_neardup_pairs(emb, threshold=0.4, max_block=k)
        nf = capped.agg(F.count(F.lit(1)).cast("bigint").alias("n_found")).localCheckpoint()
        row = nf.crossJoin(t).select(
            F.lit(k).alias("max_block"),
            F.col("n_truth"),
            F.col("n_found"),
            F.when(
                F.col("n_truth") > 0,
                F.col("n_found").cast("double") / F.col("n_truth").cast("double"),
            ).alias("recall"),
        )
        out = row if out is None else out.unionByName(row)
    return out

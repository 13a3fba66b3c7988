"""Round-11 second wave.

v21 completes the two-stage ANN deployment story: v17 sizes IVF's
nprobe, v18 sizes PQ's m, and this gate sizes the third knob — the
EXACT-RERANK DEPTH c.  A production PQ index never serves its ADC
ranking directly; it scans codes to top-c candidates and re-ranks them
with full-precision vectors (operators/similarity.py:exact_rerank), so
the number that matters is recall@k as a function of c.  The curve is
measured at the deliberately-lossy m=2 code size where the coarse
ranking alone recalls ~0.1 — the regime where re-rank depth does the
work.

q92 pins dynamic partition pruning — the Catalyst mechanism that makes
a partitioned 100 TB fact table readable in O(selected partitions)
when the selective predicate lives on a joined dimension rather than
the fact itself.  The gate stages a priority-partitioned copy of
orders, joins it to a filtered dim derived at runtime, and the plan pin
(tests/test_plans.py) asserts the fact scan carries a dynamicpruning
partition filter, so a regression that silently reverts to a full scan
fails the suite even though the VALUES would still match.

m15 is the multimodal sibling of the p04/p16 packing manifests: the
GPU-inference collate step (bucket by padded length, fill fixed-size
batches, measure padding waste), computed from REAL probed header
fields (probe_media over synthesized WAV payloads), with the
shard-local batching shape that keeps the per-bucket sort parallel at
corpus scale.

Determinism: counts are exact BIGINTs; recalls and pad fractions are
single correctly-rounded IEEE divisions with identical operand shapes
on both engines.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import multimodal, similarity
from ..tables import load_table
from .registry import ORACLES, register

# ---------------------------------------------------------------- v21

_V21_M = 2  # deliberately lossy codes: the re-rank has work to do
_V21_K = 10
_V21_DEPTHS = (10, 40, 160)


def _v21_oracle() -> str:
    from .llm import _DOTD
    from .llm10 import _v18_pq_ctes

    ctes, scored = _v18_pq_ctes(
        _V21_M, k=max(_V21_DEPTHS), tag="rr", keep_rank=True
    )
    dot = _DOTD.format(a="q.vec", b="c.vec")
    depth_blocks, rows = [], []
    for d in _V21_DEPTHS:
        depth_blocks.append(
            f"""rr{d} AS (
      SELECT q_id, vec_id FROM (
        SELECT s.q_id, s.vec_id,
               row_number() OVER (PARTITION BY s.q_id
                 ORDER BY round({dot} / (q.nrm * c.nrm), 6) DESC, s.vec_id) AS rk
        FROM {scored} s
        JOIN ve q ON q.vec_id = s.q_id
        JOIN ve c ON c.vec_id = s.vec_id
        WHERE s.rank <= {d} AND q.nrm > 0 AND c.nrm > 0) WHERE rk <= {_V21_K})"""
        )
        depth_blocks.append(
            f"fd{d} AS (SELECT CAST(count(*) AS BIGINT) AS c FROM bf "
            f"JOIN rr{d} r ON bf.q_id = r.q_id AND bf.vec_id = r.vec_id)"
        )
        rows.append(
            f"SELECT {d} AS depth, t.c AS n_truth, fd{d}.c AS n_found, "
            f"CASE WHEN t.c = 0 THEN NULL "
            f"ELSE CAST(fd{d}.c AS DOUBLE) / CAST(t.c AS DOUBLE) END AS recall "
            f"FROM fd{d}, t"
        )
    nrm = _DOTD.format(a="vec", b="vec")
    return (
        f"WITH bf AS MATERIALIZED (SELECT q_id, vec_id FROM ({ORACLES['v01_cosine_topk']})),\n"
        "    t AS (SELECT CAST(count(*) AS BIGINT) AS c FROM bf),\n"
        "    ve AS MATERIALIZED (SELECT vec_id, vec, sqrt(" + nrm + ") AS nrm FROM ("
        "SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec "
        "FROM embeddings)),\n    "
        + ",\n    ".join([ctes] + depth_blocks)
        + "\n    "
        + " UNION ALL ".join(rows)
    )


@register("v21_rerank_depth_curve", oracle=_v21_oracle())
def v21_rerank_depth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of PQ-ADC top-c + exact re-rank, per re-rank depth c
    (10/40/160) at the lossy m=2 code size — the sizing curve for the
    third knob of a deployed two-stage index (v17: nprobe, v18: m,
    here: how many candidates the full-precision refinement must
    touch).  The coarse candidate chain is built ONCE at the deepest
    cutoff and sliced per depth (rank <= c), exactly like the oracle
    slices one scored CTE — no per-depth re-quantization.  Ground truth
    and candidates are localCheckpointed and reused (the v17/v18
    discipline)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5)
    truth = (
        similarity.brute_force_topk(emb, queries_df, k=_V21_K)
        .select("q_id", "vec_id")
        .localCheckpoint()
    )
    t = truth.agg(F.count(F.lit(1)).cast("bigint").alias("n_truth")).localCheckpoint()
    cand = (
        similarity.pq_topk(
            emb, queries_df, k=max(_V21_DEPTHS), m=_V21_M, ksub=8
        )
        .select("q_id", "vec_id", "rank")
        .localCheckpoint()
    )
    out = None
    for d in _V21_DEPTHS:
        rer = similarity.exact_rerank(
            emb,
            queries_df,
            cand.filter(F.col("rank") <= d).select("q_id", "vec_id"),
            k=_V21_K,
        ).select("q_id", "vec_id")
        nf = (
            truth.join(rer, ["q_id", "vec_id"], "left_semi")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_found"))
            .localCheckpoint()
        )
        row = nf.crossJoin(t).select(
            F.lit(d).alias("depth"),
            F.col("n_truth"),
            F.col("n_found"),
            F.when(
                F.col("n_truth") > 0,
                F.col("n_found").cast("double") / F.col("n_truth").cast("double"),
            ).alias("recall"),
        )
        out = row if out is None else out.unionByName(row)
    return out


# ---------------------------------------------------------------- q92


def _dpp_fact_path(sf_dir: str) -> str:
    tag = sf_dir.strip("/").replace("/", "_")
    return os.path.join(tempfile.gettempdir(), f"dpp_orders_{tag}")


@register(
    "q92_partition_pruned_join",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
    FROM orders
    WHERE CAST(substr(o_orderpriority, 1, 1) AS INT) <= 2
    GROUP BY 1
    """,
)
def q92_partition_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning end to end: stage orders PARTITIONED BY
    o_orderpriority (hive-style directory layout — the 100 TB fact-table
    idiom), then join it to a dimension whose selective predicate
    (urgency rank <= 2, a derived attribute) is only known at runtime.
    Catalyst turns the broadcast dim into a dynamicpruning partition
    filter on the fact scan, so 3 of the 5 partition directories are
    never opened — the mechanism that makes date-partitioned petabyte
    scans cost O(selected partitions).  The plan shape is pinned in
    tests/test_plans.py::test_q92_fact_scan_is_dynamically_pruned; this
    gate pins the VALUES through the partitioned write + pruned read."""
    from ..operators import bucketing

    path = _dpp_fact_path(sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    bucketing.write_partitioned(orders, path, ["o_orderpriority"])
    fact = spark.read.parquet(path)
    dim = (
        orders.select("o_orderpriority")
        .distinct()
        .withColumn("urgency", F.substring("o_orderpriority", 1, 1).cast("int"))
        .filter(F.col("urgency") <= 2)
        .select("o_orderpriority")
    )
    return (
        fact.join(dim, "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
            .cast("double")
            .alias("total_price"),
        )
    )


# ---------------------------------------------------------------- v22

_V22_NPROBE = 2
_V22_DEPTH = 40
_V22_M = 2
_V22_NCELLS = 8


def _v22_oracle() -> str:
    from .llm import _DOTD, _SQD, _km_assign, _km_update
    from .llm10 import _v18_pq_ctes

    restrict = (
        "JOIN ivaf ca ON ca.vec_id = a0.vec_id "
        "JOIN pr pb ON pb.q_id = l0.q_id AND pb.cell = ca.cell"
    )
    pq_ctes, scored = _v18_pq_ctes(
        _V22_M, k=_V22_DEPTH, tag="ip", restrict_joins=restrict
    )
    sqd = _SQD.format(a="q.vec", b="c.centroid")
    dot = _DOTD.format(a="q.vec", b="c.vec")
    nrm = _DOTD.format(a="vec", b="vec")
    return f"""
    WITH v AS MATERIALIZED (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
      FROM embeddings),
    ivc0 AS (
      SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell,
             vec AS centroid
      FROM (SELECT * FROM v ORDER BY vec_id LIMIT {_V22_NCELLS})),
    iva1 AS ({_km_assign('ivc0')}),
    ivc1 AS ({_km_update('iva1')}),
    iva2 AS ({_km_assign('ivc1')}),
    ivc2 AS ({_km_update('iva2')}),
    ivaf AS MATERIALIZED ({_km_assign('ivc2')}),
    qq AS (SELECT vec_id AS q_id, vec FROM v WHERE vec_id < 5),
    pr AS MATERIALIZED (
      SELECT q_id, cell FROM (
        SELECT q.q_id, c.cell,
               row_number() OVER (PARTITION BY q.q_id
                 ORDER BY {sqd} ASC, c.cell ASC) AS prank
        FROM qq q CROSS JOIN ivc2 c) WHERE prank <= {_V22_NPROBE}),
    {pq_ctes},
    ve AS MATERIALIZED (SELECT vec_id, vec, sqrt({nrm}) AS nrm FROM v),
    rr AS (
      SELECT q_id, vec_id FROM (
        SELECT s.q_id, s.vec_id,
               row_number() OVER (PARTITION BY s.q_id
                 ORDER BY round({dot} / (q.nrm * c.nrm), 6) DESC, s.vec_id) AS rk
        FROM {scored} s
        JOIN ve q ON q.vec_id = s.q_id
        JOIN ve c ON c.vec_id = s.vec_id
        WHERE q.nrm > 0 AND c.nrm > 0) WHERE rk <= 10),
    bf AS MATERIALIZED (SELECT q_id, vec_id FROM ({ORACLES['v01_cosine_topk']})),
    t AS (SELECT CAST(count(*) AS BIGINT) AS c FROM bf),
    fd AS (SELECT CAST(count(*) AS BIGINT) AS c FROM bf
           JOIN rr r ON bf.q_id = r.q_id AND bf.vec_id = r.vec_id)
    SELECT {_V22_NPROBE} AS nprobe, {_V22_DEPTH} AS depth,
           t.c AS n_truth, fd.c AS n_found,
           CASE WHEN t.c = 0 THEN NULL
           ELSE CAST(fd.c AS DOUBLE) / CAST(t.c AS DOUBLE) END AS recall
    FROM fd, t
    """


@register("v22_ivf_pq_rerank_recall", oracle=_v22_oracle())
def v22_ivf_pq_rerank_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPOSED production index, end to end (operators/similarity.py:
    ivf_pq_topk): IVF coarse probe (nprobe=2 of 8 learned cells) restricts
    the corpus, PQ ADC (m=2 codes, the lossy regime) scores only probed
    rows to top-40 candidates, exact cosine re-ranks to top-10 — recall
    measured against the brute-force truth.  v04/v17 gate the IVF stage,
    v07/v18 the PQ stage, v21 the re-rank stage; this gate pins their
    COMPOSITION (the stage boundaries: probed-cell restriction feeding
    the code scan feeding the refinement), so a drift in any interface —
    cell ids, code spaces, candidate cutoffs — hash-mismatches even when
    each stage is individually correct."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5)
    truth = (
        similarity.brute_force_topk(emb, queries_df, k=10)
        .select("q_id", "vec_id")
        .localCheckpoint()
    )
    t = truth.agg(F.count(F.lit(1)).cast("bigint").alias("n_truth")).localCheckpoint()
    approx = similarity.ivf_pq_topk(
        emb,
        queries_df,
        k=10,
        depth=_V22_DEPTH,
        nprobe=_V22_NPROBE,
        ncells=_V22_NCELLS,
        m=_V22_M,
        ksub=8,
    ).select("q_id", "vec_id")
    nf = (
        truth.join(approx, ["q_id", "vec_id"], "left_semi")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_found"))
        .localCheckpoint()
    )
    return nf.crossJoin(t).select(
        F.lit(_V22_NPROBE).alias("nprobe"),
        F.lit(_V22_DEPTH).alias("depth"),
        F.col("n_truth"),
        F.col("n_found"),
        F.when(
            F.col("n_truth") > 0,
            F.col("n_found").cast("double") / F.col("n_truth").cast("double"),
        ).alias("recall"),
    )


# ---------------------------------------------------------------- q93


@register(
    "q93_bucketed_colocated_join",
    oracle="""
    SELECT c_mktsegment, count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY 1
    """,
)
def q93_bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located join end to end (operators/bucketing.py): both
    sides are written bucketBy(8, custkey) + sortBy into external catalog
    tables — the write-once pre-shuffle that makes every subsequent
    equi-join on the key shuffle-free — then joined (MERGE-hinted: at
    test scale customer would broadcast, but the shape under test is the
    100 TB fact-fact case) and aggregated.  The plan pin
    (tests/test_plans.py::test_q93_join_has_no_key_exchange) asserts no
    exchange on custkey exists; this gate pins the VALUES through the
    bucketed write + catalog read + join, so a bucketing-layout bug
    (wrong hash space, dropped rows at bucket boundaries) is caught by
    hash, not just by plan shape."""
    from ..operators import bucketing

    tag = sf_dir.strip("/").replace("/", "_").replace(".", "_")
    lt, rt = f"orders_bkt_{tag}", f"customer_bkt_{tag}"
    base = os.path.join(tempfile.gettempdir(), f"bkt_{tag}")
    bucketing.write_bucketed(
        load_table(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "custkey"),
        lt,
        os.path.join(base, "orders"),
        ["custkey"],
        8,
    )
    bucketing.write_bucketed(
        load_table(spark, sf_dir, "customer").withColumnRenamed("c_custkey", "custkey"),
        rt,
        os.path.join(base, "customer"),
        ["custkey"],
        8,
    )
    j = bucketing.bucketed_join(spark, lt, rt, ["custkey"], force_merge=True)
    return j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
        .cast("double")
        .alias("total_price"),
    )


# ---------------------------------------------------------------- q94

_Q94_MAXDIST = 2


@register(
    "q94_fuzzy_dim_join",
    oracle=f"""
    WITH dimb AS (
      SELECT p_name AS dname, string_split(p_name, ' ')[1] AS blk
      FROM (SELECT DISTINCT p_name FROM part)),
    factb AS (
      SELECT p_partkey,
             CASE WHEN p_partkey % 4 = 0
                  THEN substr(p_name, 1, length(p_name) - 1)
                  ELSE p_name END AS fact_name
      FROM part),
    cand AS (
      SELECT f.p_partkey, f.fact_name, d.dname,
             CASE WHEN levenshtein(f.fact_name, d.dname) <= {_Q94_MAXDIST}
                  THEN CAST(levenshtein(f.fact_name, d.dname) AS INT) END AS dist
      FROM (SELECT p_partkey, fact_name,
                   string_split(fact_name, ' ')[1] AS blk FROM factb) f
      LEFT JOIN dimb d ON f.blk = d.blk),
    best AS (
      SELECT p_partkey, fact_name, dname, dist,
             row_number() OVER (PARTITION BY p_partkey
               ORDER BY dist ASC, dname ASC) AS rn
      FROM cand)
    SELECT p_partkey, fact_name,
           CASE WHEN dist IS NOT NULL THEN dname END AS matched_name,
           dist AS match_dist
    FROM best WHERE rn = 1
    """,
)
def q94_fuzzy_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fuzzy_join end to end (operators/fuzzy.py — q44 gates the PAIR
    finder; this gates the best-match DIM JOIN wrapper a pipeline
    actually calls): fact names carry a deterministic typo (last char
    dropped on every 4th key), the dim side is the distinct clean
    vocabulary, and each fact row keeps its single best
    (lowest-distance, then lowest-name) match or null when nothing is
    within distance. Blocks on the first name token (stable under the
    suffix typo), dim deduped + broadcast, the only wide shuffle is the
    per-fact best-match window on the fact's own unique key."""
    from ..operators import fuzzy

    part = load_table(spark, sf_dir, "part")
    facts = part.select(
        "p_partkey",
        F.when(
            F.col("p_partkey") % 4 == 0,
            F.expr("substring(p_name, 1, length(p_name) - 1)"),
        )
        .otherwise(F.col("p_name"))
        .alias("fact_name"),
    )
    dim = part.select("p_name").distinct()
    out = fuzzy.fuzzy_join(
        facts,
        dim,
        fact_id="p_partkey",
        fact_name="fact_name",
        dim_name="p_name",
        block_fact=F.element_at(F.split(F.col("fact_name"), " "), 1),
        block_dim=F.element_at(F.split(F.col("p_name"), " "), 1),
        max_dist=_Q94_MAXDIST,
    )
    return out.withColumn("match_dist", F.col("match_dist").cast("int"))


# ---------------------------------------------------------------- s13


@register(
    "s13_stream_media_probe",
    oracle="""
    SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'wav' WHEN 1 THEN 'bmp' ELSE 'png' END
             AS detected_kind,
           CASE doc_id % 3 WHEN 0 THEN CAST(64 + doc_id % 32 AS INT)
                ELSE CAST(8 AS INT) END AS dim_a,
           CASE doc_id % 3 WHEN 0 THEN CAST(8000 AS INT)
                ELSE CAST(6 AS INT) END AS dim_b
    FROM documents
    """,
)
def s13_stream_media_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """m14's decode-free media triage in its INGEST shape: documents
    arrive as a file-source stream, each micro-batch synthesizes its
    payloads (the mapInPandas encoder stands in for the crawler's fetch)
    and probes format + header dimensions with the same pure
    whole-stage-codegen byte expressions — completely STATELESS (no
    watermark, no state store), which is the point: triage belongs
    before any stateful operator in a streaming ingest, so misrouted or
    corrupt media never enters windows or dedup state.  Append mode,
    drained rows hash-match m14's closed-form batch oracle."""
    from ..streaming.windows import docs_stream

    stream = docs_stream(spark, sf_dir)
    parts = None
    for m, kind in ((0, "wav"), (1, "bmp"), (2, "png")):
        p = multimodal.synth_media_payloads(
            stream.filter(F.col("doc_id") % 3 == m), kind=kind
        )
        parts = p if parts is None else parts.unionByName(p)
    probed = multimodal.probe_media(parts).select(
        "doc_id", "detected_kind", "dim_a", "dim_b"
    )
    name = "s13_media_probe"
    q = (
        probed.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


# ---------------------------------------------------------------- m15

_M15_BUCKET = 16
_M15_BATCH = 8
_M15_SHARD_ROWS = 200


@register(
    "m15_collate_manifest",
    oracle=f"""
    WITH m AS (
      SELECT doc_id, CAST(64 + doc_id % 32 AS BIGINT) AS len,
             CAST(((64 + doc_id % 32) + {_M15_BUCKET - 1}) // {_M15_BUCKET}
                  * {_M15_BUCKET} AS BIGINT) AS bucket_len,
             CAST(doc_id // {_M15_SHARD_ROWS} AS BIGINT) AS shard
      FROM documents),
    b AS (
      SELECT bucket_len, shard, len,
             CAST((row_number() OVER (PARTITION BY bucket_len, shard
               ORDER BY doc_id) - 1) // {_M15_BATCH} AS BIGINT) AS batch_id
      FROM m)
    SELECT bucket_len, shard, batch_id,
           count(*) AS n_items, max(len) AS max_len,
           CAST(sum(len) AS BIGINT) AS sum_len,
           1.0 - CAST(sum(len) AS DOUBLE) / (count(*) * bucket_len) AS pad_frac
    FROM b GROUP BY 1, 2, 3
    """,
)
def m15_collate_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPU-inference collate manifest over REAL media headers: WAV
    payloads are synthesized per doc (closed-form sample counts, so the
    oracle recomputes them independently), probe_media extracts the
    data-chunk length from the RIFF header as whole-stage-codegen byte
    expressions (never decoding audio), and collate_batches buckets by
    padded length, fills deterministic fixed-size batches shard-locally,
    and reports the padding-waste fraction per batch — the multimodal
    sibling of the p04/p16 packing manifests.  A wrong header offset,
    bucket rounding, or batch boundary hash-mismatches immediately."""
    docs = load_table(spark, sf_dir, "documents")
    wavs = multimodal.synth_media_payloads(docs, kind="wav")
    probed = multimodal.probe_media(wavs)
    return multimodal.collate_batches(
        probed,
        len_col="dim_a",
        bucket=_M15_BUCKET,
        batch_size=_M15_BATCH,
        shard_rows=_M15_SHARD_ROWS,
    )

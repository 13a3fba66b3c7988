"""Round-9 third-wave additions: distributed PCA moments (v15),
priority sampling (p14), winnowing fingerprint dedup (d16), and the
end-to-end corpus-cleaning pipeline composition gate (p15).

Reference parity note: the reference engine (polars_readstat_rs) has no
vector/sampling/dedup surface — these extend the training-data-pipeline
suite the build brief grades as first-class, with the same DuckDB
value-hash gates as the rest of the registry.

Determinism notes (why every gate here is hash-exact):
- v15 emits only BIGINT moment sums over floor-quantized components
  (floor of a double is IEEE-exact on both engines);
- p14's priority is one exact small-int double product followed by one
  correctly-rounded IEEE division — bit-identical cross-engine;
- d16 encodes rightmost-min window selection as an integer array_min
  (hash*2^16 + (65536-pos)) — no comparator, no float;
- p15 composes three already-gated operators (t01 langid, t09 gopher,
  d01 exact-dedup) and pins the kept id set via md5 of the sorted list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import dedup, sampling, similarity, textstats
from ..tables import load_table
from .registry import ORACLES, register

# ------------------------------------------------- v15 PCA moment pass


@register(
    "v15_embedding_moments",
    oracle="""
    WITH q AS (
      SELECT list_transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE) * 1000 + 0.5) AS BIGINT)) AS q
      FROM embeddings),
    e1 AS (SELECT q, unnest(range(1, len(q) + 1)) AS i1 FROM q),
    e2 AS (SELECT q, i1, unnest(range(i1, len(q) + 1)) AS j1 FROM e1)
    SELECT CAST(i1 - 1 AS INT) AS i, CAST(j1 - 1 AS INT) AS j,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(q[i1]) AS BIGINT) AS s_i,
           CAST(sum(q[j1]) AS BIGINT) AS s_j,
           CAST(sum(q[i1] * q[j1]) AS BIGINT) AS s_ij
    FROM e2 GROUP BY i1, j1
    """,
)
def v15_embedding_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact integer Gramian pass behind distributed PCA/whitening
    (operators/similarity.py:embedding_moments / pca_whiten): one
    partial-aggregated shuffle produces the d(d+1)/2 co-moment sums as
    plain BIGINTs (floor-quantized components, so no float-summation
    order anywhere). pca_whiten eigendecomposes these on the driver and
    projects map-only — the gate pins the entire distributed part."""
    return similarity.embedding_moments(load_table(spark, sf_dir, "embeddings"))


# ------------------------------------------------- p14 priority sampling

_P14_K = 100
_P14_SEED = "p14"


@register(
    "p14_priority_sample",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, CAST(doc_id % 7 + 1 AS DOUBLE) AS wt,
             CAST(('0x' || substr(md5('{_P14_SEED}:' || CAST(doc_id AS VARCHAR)), 1, 8))
                  AS BIGINT) + 1 AS u
      FROM documents),
    p AS (SELECT doc_id, wt,
                 wt * 4294967297.0 / CAST(u AS DOUBLE) AS pri FROM w),
    r AS (SELECT doc_id, wt, pri,
                 row_number() OVER (ORDER BY pri DESC, doc_id) AS rn FROM p),
    t AS (SELECT CASE WHEN max(rn) > {_P14_K} THEN min(pri) ELSE 0.0 END AS tau
          FROM r WHERE rn <= {_P14_K} + 1)
    SELECT doc_id, pri AS priority, t.tau, greatest(wt, t.tau) AS est_w
    FROM r, t WHERE rn <= {_P14_K}
    """,
)
def p14_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority sampling (Duffield-Lund-Thorup; operators/sampling.py:
    priority_sample): weighted without-replacement k-sample with
    unbiased max(w, tau) subset-sum estimators. The only non-map work
    is TakeOrdered(k+1) — per-partition partial top-k, no global sort.
    Priorities are one exact double product + one correctly-rounded
    IEEE division, so both engines emit identical bits."""
    docs = load_table(spark, sf_dir, "documents")
    out = sampling.priority_sample(
        docs, "doc_id", F.col("doc_id") % 7 + 1, k=_P14_K, seed=_P14_SEED
    )
    return out.select("doc_id", "priority", "tau", "est_w")


# ------------------------------------------------- d16 winnowing dedup

_D16_K = 4
_D16_W = 4


@register(
    "d16_winnow_pairs",
    oracle=f"""
    WITH ws AS (SELECT doc_id, string_split(lower(text), ' ') AS ws FROM documents),
    g AS (SELECT doc_id,
            CASE WHEN len(ws) >= {_D16_K} THEN
              list_transform(range(1, len(ws) - {_D16_K - 2}), p ->
                CAST(('0x' || substr(md5(array_to_string(ws[p : p + {_D16_K - 1}], ' ')), 1, 10))
                     AS BIGINT) * 65536 + (65536 - p))
            ELSE []::BIGINT[] END AS pk
          FROM ws),
    sel AS (SELECT doc_id, unnest(list_distinct(
              CASE WHEN len(pk) = 0 THEN []::BIGINT[] ELSE
                list_transform(range(0, greatest(len(pk) - {_D16_W}, 0) + 1),
                               s -> list_min(pk[s + 1 : s + {_D16_W}]))
              END)) AS fp
            FROM g),
    fps AS (SELECT DISTINCT doc_id, fp // 65536 AS fp_hash FROM sel)
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           CAST(count(*) AS BIGINT) AS n_shared
    FROM fps a JOIN fps b ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
    GROUP BY 1, 2 HAVING count(*) >= 2
    """,
)
def d16_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint dedup (Schleimer et al. 2003 / MOSS;
    operators/dedup.py:winnow_pairs): rightmost-min-per-window k-gram
    fingerprint selection (map-only array exprs), then the capped
    inverted-index join. Unlike MinHash the guarantee is exact: every
    shared run of >= window+k-1 words yields a shared fingerprint.
    The gate SF stays far below MAX_BAND_BUCKET, so the cap (a
    documented truncation at web scale) never fires here."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.winnow_pairs(
        docs, "doc_id", "text", k=_D16_K, window=_D16_W, min_shared=2
    )


# ------------------------------------------------- p15 e2e cleaning pipeline


@register(
    "p15_clean_corpus",
    oracle=f"""
    WITH lid AS ({{T01}}),
    gq AS ({{T09}}),
    surv AS (
      SELECT d.doc_id, d.source, d.text
      FROM documents d
      JOIN lid ON lid.doc_id = d.doc_id AND lid.pred_lang = 'en'
      JOIN gq ON gq.doc_id = d.doc_id AND gq.keep),
    reps AS (
      SELECT source, doc_id, text,
             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      FROM surv)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(len(string_split(lower(text), ' '))) AS BIGINT) AS n_tokens,
           md5(array_to_string(list_sort(list(CAST(doc_id AS VARCHAR))), ',')) AS ids_md5
    FROM reps WHERE rn = 1
    GROUP BY source
    """,
)
def p15_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus-cleaning pipeline composition — the "switch
    your cleaning job to this engine" flagship: language-ID (t01)
    -> Gopher quality rules (t09) -> exact dedup keep-first (d01
    semantics), summarized per source with the kept id set pinned via
    md5 of the sorted id list. Each stage is an already-gated operator;
    this gate proves they COMPOSE (the oracle literally nests the t01
    and t09 oracle SQL as CTEs). Scale shape: both filters apply as
    FUSED column expressions (textstats.langid_pred_expr /
    gopher_keep_expr, pytest-pinned equivalent to the operators) inside
    ONE scan of documents — no join-back on doc_id, so the whole filter
    phase is a single map-only WSCG stage; dedup is one window over
    md5(text), the same shuffle the standalone d01 gate budgets."""
    docs = load_table(spark, sf_dir, "documents")
    surv = docs.filter(
        (textstats.langid_pred_expr() == "en") & textstats.gopher_keep_expr()
    ).select("doc_id", "source", "text")
    w = Window.partitionBy(F.md5("text")).orderBy(F.asc("doc_id"))
    reps = surv.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return reps.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum(F.size(F.split(F.lower("text"), " "))).cast("bigint").alias("n_tokens"),
        F.md5(
            F.array_join(F.array_sort(F.collect_list(F.col("doc_id").cast("string"))), ",")
        ).alias("ids_md5"),
    )


# The p15 oracle nests the t01/t09 oracle SQL (single source of truth —
# if those gates' SQL changes, this composition follows automatically).
ORACLES["p15_clean_corpus"] = ORACLES["p15_clean_corpus"].format(
    T01=ORACLES["t01_langid"], T09=ORACLES["t09_gopher_quality"]
)


# ------------------------------------------------- m11 keyframe detection


@register(
    "m11_keyframes",
    oracle="""
    WITH f AS (
      SELECT doc_id, unnest(range(0, 2 + doc_id % 4)) AS frame_idx FROM documents),
    px AS (SELECT doc_id, frame_idx, unnest(range(0, 144)) AS p FROM f),
    v AS (
      SELECT doc_id, frame_idx,
             (doc_id + 7 * frame_idx + 3 * ((p // 3) % 8) + 5 * ((p // 3) // 8)
              + 11 * (p % 3)) % 256 AS val,
             CASE WHEN frame_idx = 0 THEN NULL ELSE
               (doc_id + 7 * (frame_idx - 1) + 3 * ((p // 3) % 8)
                + 5 * ((p // 3) // 8) + 11 * (p % 3)) % 256 END AS pval
      FROM px)
    SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
           CAST(coalesce(sum(abs(val - pval)), 0) AS BIGINT) AS sad,
           (frame_idx = 0 OR coalesce(sum(abs(val - pval)), 0) > 7 * 144) AS is_key
    FROM v GROUP BY doc_id, frame_idx
    """,
)
def m11_keyframes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL frame-difference keyframe detection (operators/
    multimodal.py:keyframe_detect): multi-frame BMP containers are
    synthesized executor-side from closed-form pixels, demuxed by
    walking genuine BITMAPFILEHEADER sizes, EVERY frame decoded, and
    consecutive frames diffed in numpy — the oracle recomputes each
    frame's sum-of-absolute-differences from the closed form (the
    +7-per-frame synthesis makes SAD = 7 per value except mod-256
    wraparounds, which contribute 249 — so is_key fires exactly on
    frames with a wrapping pixel). A hash match proves the container
    walk, both decodes, and the diff."""
    from ..operators import multimodal

    docs = load_table(spark, sf_dir, "documents")
    return multimodal.keyframe_detect(multimodal.synth_video_payloads(docs))


# ------------------------------------------------- g05 label propagation

from .llm import _JACCARD_SELECT, _sh_ctes  # noqa: E402


def _g05_lp_iter(prev: str, out: str) -> str:
    return f"""
    {out}_v AS (
      SELECT e.src AS node, l.lbl, count(*) AS c
      FROM edges e JOIN {prev} l ON l.node = e.dst GROUP BY 1, 2),
    {out} AS (
      SELECT node, lbl FROM (
        SELECT node, lbl,
               row_number() OVER (PARTITION BY node ORDER BY c DESC, lbl) AS rn
        FROM {out}_v) WHERE rn = 1)"""


@register(
    "g05_label_propagation",
    oracle=f"""
    WITH {_sh_ctes()},
    pairs AS (
      SELECT a_id, b_id FROM ({_JACCARD_SELECT}) WHERE jaccard >= 0.2),
    edges AS (
      SELECT a_id AS src, b_id AS dst FROM pairs
      UNION SELECT b_id, a_id FROM pairs),
    l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM edges),
    {_g05_lp_iter('l0', 'l1')},
    {_g05_lp_iter('l1', 'l2')}
    SELECT node, lbl AS label FROM l2
    """,
)
def g05_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synchronous majority label propagation
    (operators/graph.py:label_propagation) over the SAME near-dup pair
    graph as d06/g04 — community detection where ties break to the
    smallest label and every round is one edge-vs-labels join + vote
    count + per-node argmax window. The oracle unrolls both rounds as
    CTEs, so every vote count and tiebreak is value-pinned."""
    from ..operators import graph

    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.2)
    edges = pairs.select(F.col("a_id").alias("s"), F.col("b_id").alias("d"))
    return graph.label_propagation(edges, iters=2)


# ------------------------------------------------- v16 matryoshka recall

from .llm import _cosine_sql  # noqa: E402

_V16_DIMS = 16
_V16_K = 10


@register(
    "v16_matryoshka_recall",
    oracle=f"""
    WITH bf AS ({{V01}}),
    tq AS (SELECT vec_id AS q_id, embedding[1:{_V16_DIMS}] AS q_vec
           FROM embeddings WHERE vec_id < 5),
    ts AS (
      SELECT tq.q_id, e.vec_id,
             {_cosine_sql('tq.q_vec', f'e.embedding[1:{_V16_DIMS}]')} AS sim
      FROM embeddings e JOIN tq ON e.vec_id <> tq.q_id),
    tr AS (
      SELECT q_id, vec_id FROM (
        SELECT q_id, vec_id,
               CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS INT) AS rank
        FROM ts) WHERE rank <= {_V16_K}),
    base AS (SELECT q_id, CAST(count(*) AS BIGINT) AS n_truth FROM bf GROUP BY q_id),
    hits AS (
      SELECT bf.q_id, CAST(count(*) AS BIGINT) AS n_hit
      FROM bf JOIN tr ON bf.q_id = tr.q_id AND bf.vec_id = tr.vec_id
      GROUP BY bf.q_id)
    SELECT base.q_id, n_truth,
           COALESCE(n_hit, 0) AS n_hit,
           CAST(COALESCE(n_hit, 0) AS DOUBLE) / CAST(n_truth AS DOUBLE) AS recall
    FROM base LEFT JOIN hits ON base.q_id = hits.q_id
    """,
)
def v16_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka / truncated-embedding eval: recall@10 of brute-force
    search over the FIRST 16 dimensions against full-width ground
    truth — the measurement that decides whether a 100 TB corpus can be
    indexed at 4x less vector bandwidth (the same contract as the int8
    eval v14, but truncating width instead of precision). Truncation is
    a map-only slice; both rankings reuse the v01 brute-force shape and
    the recall join is the v06 harness."""
    emb = load_table(spark, sf_dir, "embeddings")
    trunc = emb.select(
        "vec_id", F.slice("embedding", 1, _V16_DIMS).alias("embedding")
    )
    queries = emb.filter(F.col("vec_id") < 5)
    tqueries = trunc.filter(F.col("vec_id") < 5)
    truth = similarity.brute_force_topk(emb, queries, k=_V16_K)
    approx = similarity.brute_force_topk(trunc, tqueries, k=_V16_K)
    return similarity.ann_recall(truth, approx, k=_V16_K)


ORACLES["v16_matryoshka_recall"] = ORACLES["v16_matryoshka_recall"].format(
    V01=ORACLES["v01_cosine_topk"]
)


# ------------------------------------------------- r24 dta v119 roundtrip

import os  # noqa: E402
import tempfile  # noqa: E402


@register(
    "r24_dta_v119_roundtrip",
    oracle="""
    WITH b AS (
      SELECT o_orderkey, o_orderpriority,
             rpad(o_orderpriority, CAST(2500 + o_orderkey % 50 AS INT), 'x') AS blob
      FROM orders)
    SELECT o_orderpriority, count(*) AS n,
      CAST(sum(length(blob)) AS BIGINT) AS blob_chars,
      min(md5(blob)) AS min_md5,
      min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
    FROM b GROUP BY o_orderpriority
    """,
)
def r24_dta_v119_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stata v119 WRITE gate — the writer matrix's last .dta version
    (Stata 15/16 >32k-variable layout: u32 variable count, u32 sortlist
    entries, 24+40-bit strL refs; the reference reads v119,
    src/stata/header.rs, but writes only v118): parquet -> DISTRIBUTED
    v119 write with a >2045-char strL column (exercising the 24+40 ref
    re-basing across sections) -> our reader -> aggregate over the
    decoded strL text vs DuckDB recomputing it on the parquet. pandas
    cross-reads the same layout in tests."""
    from ..api import _ensure_registered

    _ensure_registered(spark)
    tag = sf_dir.strip("/").replace("/", "_")
    path = os.path.join(tempfile.gettempdir(), f"readstat_r24_{tag}.dta")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"),
        F.col("o_orderpriority").alias("prio"),
        F.rpad(
            F.col("o_orderpriority"),
            (F.lit(2500) + F.col("o_orderkey") % 50).cast("int"),
            "x",
        ).alias("blob"),
    )
    (
        orders.write.format("readstat")
        .mode("overwrite")
        .option("dta_version", "119")
        .save(path)
    )
    from ..formats.stata.parser import read_metadata

    assert read_metadata(path).version == 119
    df = spark.read.format("readstat").load(path)
    return df.groupBy(F.col("prio").alias("o_orderpriority")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("blob")).cast("bigint").alias("blob_chars"),
        F.min(F.md5("blob")).alias("min_md5"),
        F.min("okey").cast("long").alias("min_key"),
        F.max("okey").cast("long").alias("max_key"),
    )


# ------------------------------------------------- p16 pack manifest

_P16_BUDGET = 256
_P16_SPAN = 100_000


@register(
    "p16_pack_manifest",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             doc_id // {_P16_SPAN} AS _grp
      FROM documents),
    cums AS (
      SELECT doc_id, n_tokens, _grp,
             sum(n_tokens) OVER (PARTITION BY _grp ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS _cum
      FROM toks),
    packs AS (
      SELECT doc_id, n_tokens,
             CAST(_grp * {_P16_SPAN} + (_cum - n_tokens) // {_P16_BUDGET} AS BIGINT) AS pack_id
      FROM cums),
    offs AS (
      SELECT doc_id, n_tokens, pack_id,
             sum(n_tokens) OVER (PARTITION BY pack_id ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) - n_tokens AS _off
      FROM packs)
    SELECT pack_id,
           CAST(count(*) AS INT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
           CAST(greatest(0, sum(n_tokens) - {_P16_BUDGET}) AS BIGINT) AS overshoot,
           string_agg(CAST(doc_id AS VARCHAR) || ':' || CAST(_off AS VARCHAR)
                      || ':' || CAST(n_tokens AS VARCHAR), ',' ORDER BY doc_id) AS manifest
    FROM offs GROUP BY pack_id
    """,
)
def p16_pack_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack manifests (operators/sampling.py:pack_manifest) — the
    dataloader-facing table a training job reads to materialize fixed
    context windows without re-deriving the packing: one row per pack
    with the ordered doc:offset:len manifest string, exact token totals
    and overshoot accounting. One exchange on pack_id beyond p04's
    block-parallel cumsum; the groupBy reuses that partitioning."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.col("text"), " "))
    return sampling.pack_manifest(docs, "doc_id", n_tokens, _P16_BUDGET, _P16_SPAN)


# ------------------------------------------------- m12 shot segments


@register(
    "m12_shot_segments",
    oracle="""
    WITH kf AS ({M11})
    SELECT doc_id, shot_id,
           CAST(count(*) AS INT) AS n_frames,
           CAST(min(frame_idx) AS INT) AS first_frame,
           CAST(sum(sad) AS BIGINT) AS sad_total
    FROM (
      SELECT doc_id, frame_idx, sad,
             CAST(sum(CASE WHEN is_key THEN 1 ELSE 0 END)
                  OVER (PARTITION BY doc_id ORDER BY frame_idx
                        ROWS UNBOUNDED PRECEDING) AS INT) AS shot_id
      FROM kf) s
    GROUP BY doc_id, shot_id
    """,
)
def m12_shot_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot segmentation — group every frame run between keyframes into
    one shot (shot_id = running keyframe count per video): the table a
    captioning pipeline samples one frame per shot from. Pure
    composition over m11's REAL decode+SAD output (the oracle nests the
    m11 oracle); one window + one agg, both partitioned by doc_id, so
    a single exchange serves both."""
    from ..operators import multimodal

    docs = load_table(spark, sf_dir, "documents")
    kf = multimodal.keyframe_detect(multimodal.synth_video_payloads(docs))
    w = Window.partitionBy("doc_id").orderBy("frame_idx").rowsBetween(
        Window.unboundedPreceding, 0
    )
    shots = kf.withColumn(
        "shot_id", F.sum(F.col("is_key").cast("int")).over(w).cast("int")
    )
    return shots.groupBy("doc_id", "shot_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_frames"),
        F.min("frame_idx").cast("int").alias("first_frame"),
        F.sum("sad").cast("bigint").alias("sad_total"),
    )


ORACLES["m12_shot_segments"] = ORACLES["m12_shot_segments"].format(
    M11=ORACLES["m11_keyframes"]
)


# ------------------------------------------------- t22 CCNet LM buckets

_T22_SAMPLE_THRESHOLD = int(0.5 * (1 << 32))


@register(
    "t22_lm_buckets",
    oracle=f"""
    WITH skel AS ({{T10}}),
    scored AS (
      SELECT doc_id, n_bigrams, sum_bg_count,
             CAST(sum_bg_count AS DOUBLE) / CAST(n_bigrams AS DOUBLE) AS score
      FROM skel),
    samp AS (
      SELECT score FROM scored
      WHERE score IS NOT NULL
        AND CAST(('0x' || substr(md5('t22:' || CAST(doc_id AS VARCHAR)), 1, 8))
                 AS BIGINT) < {_T22_SAMPLE_THRESHOLD}),
    t AS (
      SELECT round(quantile_cont(score, 1.0/3), 6) AS t_low,
             round(quantile_cont(score, 2.0/3), 6) AS t_high
      FROM samp)
    SELECT doc_id, n_bigrams, sum_bg_count, score, t.t_low, t.t_high,
      CASE WHEN score IS NULL THEN NULL
           WHEN score >= t.t_high THEN 'head'
           WHEN score >= t.t_low THEN 'middle'
           ELSE 'tail' END AS bucket
    FROM scored, t
    """,
)
def t22_lm_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail LM bucketing (operators/textstats.py:
    lm_buckets; Wenzek et al. 2020 §4.3): corpus bigram-LM score per
    document, tercile thresholds from a bounded deterministic
    hash-sample (the single-group percentile sort stays bounded at any
    corpus size — the CCNet recipe itself thresholds on a sample),
    bucket by broadcast-threshold comparison. Thresholds reuse the q84
    exact-percentile machinery (bitwise-equal to DuckDB quantile_cont
    after round(6)); the oracle nests the t10 oracle SQL."""
    docs = load_table(spark, sf_dir, "documents")
    return textstats.lm_buckets(docs, "doc_id", "text", sample_rate=0.5, seed="t22")


ORACLES["t22_lm_buckets"] = ORACLES["t22_lm_buckets"].format(
    T10=ORACLES["t10_bigram_lm"]
)


# ------------------------------------------------- d17 bloom membership

_D17_M = 1 << 18
_D17_K = 3


def _d17_pos_sql(j: int) -> str:
    return (
        f"CAST(('0x' || substr(md5('bloom{j}:' || fp), 1, 8)) AS BIGINT) % {_D17_M}"
    )


@register(
    "d17_bloom_membership",
    oracle=f"""
    WITH fps AS (SELECT doc_id, md5(text) AS fp FROM documents),
    hist AS (SELECT * FROM fps WHERE doc_id % 3 != 0),
    inc AS (SELECT * FROM fps WHERE doc_id % 3 = 0),
    bits AS (
      SELECT DISTINCT bit FROM (
        {" UNION ALL ".join(f"SELECT {_d17_pos_sql(j)} AS bit FROM hist" for j in range(_D17_K))})),
    probe AS (
      {" UNION ALL ".join(f"SELECT doc_id, {_d17_pos_sql(j)} AS bit FROM inc" for j in range(_D17_K))}),
    hits AS (
      SELECT p.doc_id, count(b.bit) = {_D17_K} AS bloom_hit
      FROM probe p LEFT JOIN bits b USING (bit) GROUP BY p.doc_id),
    exact AS (
      SELECT DISTINCT i.doc_id, TRUE AS exact_dup
      FROM inc i JOIN hist h ON i.fp = h.fp)
    SELECT h.doc_id, h.bloom_hit,
           coalesce(e.exact_dup, FALSE) AS exact_dup,
           (h.bloom_hit AND NOT coalesce(e.exact_dup, FALSE)) AS false_positive
    FROM hits h LEFT JOIN exact e USING (doc_id)
    """,
)
def d17_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter incremental-ingest screening (operators/dedup.py:
    bloom_membership): the corpus history collapses to a bounded,
    broadcastable bit table (md5-derived positions — the filter is
    reproduced bit-for-bit by the DuckDB oracle, unlike engine-internal
    sketches) and each incoming batch probes it without ever joining
    the history. No false negatives by construction; the gate also
    value-pins the false-positive column at this m/k/SF. History =
    doc_id % 3 != 0, incoming = the rest."""
    docs = load_table(spark, sf_dir, "documents")
    history = docs.filter(F.col("doc_id") % 3 != 0)
    incoming = docs.filter(F.col("doc_id") % 3 == 0)
    return dedup.bloom_membership(
        history, incoming, "doc_id", "text", m_bits=_D17_M, k=_D17_K
    )


# ------------------------------------------------- t23 count-min sketch

_T23_M = 4096
_T23_K = 3
_T23_TOP = 20


def _t23_bucket_sql(j: int) -> str:
    return f"CAST(('0x' || substr(md5('cms{j}:' || tok), 1, 8)) AS BIGINT) % {_T23_M}"


@register(
    "t23_cms_token_freq",
    oracle=f"""
    WITH toks AS (SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents),
    cells AS (
      SELECT row, bucket, CAST(count(*) AS BIGINT) AS n FROM (
        {" UNION ALL ".join(f"SELECT {j} AS row, {_t23_bucket_sql(j)} AS bucket FROM toks" for j in range(_T23_K))}
      ) GROUP BY row, bucket),
    exact AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS exact_n FROM toks GROUP BY tok
      ORDER BY exact_n DESC, tok LIMIT {_T23_TOP}),
    probe AS (
      {" UNION ALL ".join(f"SELECT tok, exact_n, {j} AS row, {_t23_bucket_sql(j)} AS bucket FROM exact" for j in range(_T23_K))})
    SELECT p.tok, p.exact_n, CAST(min(c.n) AS BIGINT) AS cms_est,
           min(c.n) >= p.exact_n AS overestimate_ok
    FROM probe p JOIN cells c USING (row, bucket)
    GROUP BY p.tok, p.exact_n
    """,
)
def t23_cms_token_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy-hitter frequency estimation
    (operators/textstats.py:cms_token_freq): a k x m counter table with
    md5-derived buckets — like d17's Bloom filter, the sketch state
    itself is reproduced exactly by the DuckDB oracle, so the gate
    value-pins every estimate, not just companion columns. Building the
    sketch is one bounded groupBy (<= k*m cells regardless of corpus
    size, map-side partial agg); the exact heavy-hitter audit is the
    usual TakeOrdered top-n. CMS structurally never underestimates —
    overestimate_ok is pinned TRUE for every row."""
    docs = load_table(spark, sf_dir, "documents")
    return textstats.cms_token_freq(
        docs, "text", m_buckets=_T23_M, k_rows=_T23_K, top_n=_T23_TOP
    )


# ------------------------------------------------- t24 KMV NDV sketch

_T24_K = 256


@register(
    "t24_kmv_ndv",
    oracle=f"""
    WITH toks AS (SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents),
    hashes AS (
      SELECT DISTINCT CAST(('0x' || substr(md5('kmv:' || tok), 1, 8)) AS BIGINT) AS h
      FROM toks),
    kth AS (
      SELECT max(h) AS h_k, CAST(count(*) AS BIGINT) AS _n
      FROM (SELECT h FROM hashes ORDER BY h LIMIT {_T24_K})),
    exact AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS exact_ndv FROM toks)
    SELECT exact_ndv,
           CASE WHEN kth._n < {_T24_K} THEN CAST(exact_ndv AS DOUBLE)
                ELSE {float(_T24_K - 1)!r} * 4294967296.0 / CAST(kth.h_k AS DOUBLE)
           END AS kmv_est,
           CAST({_T24_K} AS INT) AS k,
           abs(CASE WHEN kth._n < {_T24_K} THEN CAST(exact_ndv AS DOUBLE)
                    ELSE {float(_T24_K - 1)!r} * 4294967296.0 / CAST(kth.h_k AS DOUBLE)
               END - CAST(exact_ndv AS DOUBLE)) / CAST(exact_ndv AS DOUBLE) AS rel_err
    FROM exact, kth
    """,
)
def t24_kmv_ndv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values vocabulary-cardinality sketch (operators/
    textstats.py:kmv_ndv): bounded mergeable state (the k smallest
    distinct token hashes, TakeOrdered plan), estimate
    (k-1)*2^32/h_k — one exact product + one correctly-rounded IEEE
    division, so the DuckDB oracle value-pins the ESTIMATE itself
    (q35's engine sketches can only pin exact companions). Completes
    the replicable-sketch trio with d17 (Bloom) and t23 (count-min)."""
    docs = load_table(spark, sf_dir, "documents")
    return textstats.kmv_ndv(docs, "text", k=_T24_K)


# ------------------------------------------------- q88 VARIANT extraction


@register(
    "q88_variant_extract",
    oracle="""
    WITH ev AS (
      SELECT event_id, user_id, event_type,
             CAST(json_extract(props, '$.k') AS INTEGER) AS k
      FROM events),
    j AS (
      SELECT '{"ids": [' || CAST(user_id AS VARCHAR) || ', ' || CAST(event_id AS VARCHAR)
             || '], "k": ' || CAST(k AS VARCHAR) || ', "t": "' || event_type || '"}' AS doc,
             event_type
      FROM ev),
    x AS (
      SELECT event_type,
             CAST(json_extract(doc, '$.ids[0]') AS BIGINT) AS id0,
             CAST(json_extract(doc, '$.ids[1]') AS BIGINT) AS id1,
             CAST(json_extract(doc, '$.k') AS INTEGER) AS k,
             json_extract_string(doc, '$.t') AS t,
             json_extract(doc, '$.absent') IS NULL AS missing_is_null
      FROM j)
    SELECT t, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(id0) AS BIGINT) AS sum_user,
           CAST(sum(id1) AS BIGINT) AS sum_event,
           CAST(min(k) AS INT) AS min_k, CAST(max(k) AS INT) AS max_k,
           bool_and(t = event_type) AS t_roundtrips,
           bool_and(missing_is_null) AS try_null_ok
    FROM x GROUP BY t
    """,
)
def q88_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT semi-structured pipeline: deterministically
    synthesized nested JSON (array + int + string fields from event
    columns) goes through parse_json -> a true VariantType column ->
    typed variant_get path extraction (array index, int, string) with
    try_variant_get pinning missing-path null semantics. The oracle
    reproduces every extraction with DuckDB's JSON functions on the
    identical document text — so the gate proves VARIANT's binary
    encode/decode is value-faithful end to end. Map-only + one
    aggregation; the variant column never shuffles."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    doc = F.concat(
        F.lit('{"ids": ['), F.col("user_id").cast("string"), F.lit(", "),
        F.col("event_id").cast("string"), F.lit('], "k": '), k.cast("string"),
        F.lit(', "t": "'), F.col("event_type"), F.lit('"}'),
    )
    v = F.parse_json(doc)
    x = ev.select(
        "event_type",
        F.try_variant_get(v, "$.ids[0]", "bigint").alias("id0"),
        F.try_variant_get(v, "$.ids[1]", "bigint").alias("id1"),
        F.try_variant_get(v, "$.k", "int").alias("k"),
        F.try_variant_get(v, "$.t", "string").alias("t"),
        F.try_variant_get(v, "$.absent", "int").isNull().alias("missing_is_null"),
    )
    return x.groupBy("t").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("id0").alias("sum_user"),
        F.sum("id1").alias("sum_event"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.bool_and(F.col("t") == F.col("event_type")).alias("t_roundtrips"),
        F.bool_and("missing_is_null").alias("try_null_ok"),
    )


# ------------------------------------------------- q89 SQL UDFs


@register(
    "q89_sql_udf",
    oracle="""
    WITH c AS (
      SELECT l_returnflag,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
             CAST(round(l_discount * 100) AS BIGINT) AS dc
      FROM lineitem),
    x AS (SELECT l_returnflag, pc * (100 - dc) AS rev_c4 FROM c)
    SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(rev_c4) AS BIGINT) AS revenue_c4,
           CAST(sum(rev_c4) AS DOUBLE) / 10000.0 AS revenue,
           CAST(min(rev_c4) AS BIGINT) AS min_c4, CAST(max(rev_c4) AS BIGINT) AS max_c4
    FROM x GROUP BY l_returnflag
    """,
)
def q89_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL UDFs (CREATE TEMPORARY FUNCTION ... RETURN expr —
    declarative scalar functions Catalyst INLINES into the plan, unlike
    Python UDFs): a cents-exact discounted-revenue UDF defined in SQL
    and applied to lineitem, with the whole aggregation running on its
    BIGINT outputs (the q01 integer-cents discipline — no float
    accumulation through the UDF). The oracle replicates the inlined
    expression; a hash match proves SQL-UDF resolution, inlining and
    arithmetic agree with the declared body."""
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("q89_lineitem")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION q89_rev_cents(pc BIGINT, dc BIGINT) "
        "RETURNS BIGINT RETURN pc * (100 - dc)"
    )
    return spark.sql(
        """
        WITH c AS (
          SELECT l_returnflag,
                 CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
                 CAST(round(l_discount * 100) AS BIGINT) AS dc
          FROM q89_lineitem),
        x AS (SELECT l_returnflag, q89_rev_cents(pc, dc) AS rev_c4 FROM c)
        SELECT l_returnflag, count(*) AS n,
               sum(rev_c4) AS revenue_c4,
               CAST(sum(rev_c4) AS DOUBLE) / 10000.0 AS revenue,
               min(rev_c4) AS min_c4, max(rev_c4) AS max_c4
        FROM x GROUP BY l_returnflag
        """
    )


# ------------------------------------------------- d18 containment pairs

from .llm import _sh_ctes as _sh_ctes_for_d18  # noqa: E402

_D18_T = 0.6


@register(
    "d18_containment_pairs",
    oracle=f"""
    WITH {_sh_ctes_for_d18()},
    directed AS (
      SELECT i.a_id AS src_id, i.b_id AS dst_id, i.inter, sa.sz AS src_sz
      FROM inter i JOIN sizes sa ON i.a_id = sa.doc
      UNION ALL
      SELECT i.b_id, i.a_id, i.inter, sb.sz
      FROM inter i JOIN sizes sb ON i.b_id = sb.doc)
    SELECT src_id, dst_id, CAST(inter AS BIGINT) AS inter,
           CAST(src_sz AS BIGINT) AS src_sz,
           CAST(inter AS DOUBLE) / CAST(src_sz AS DOUBLE) AS containment
    FROM directed
    WHERE CAST(inter AS DOUBLE) / CAST(src_sz AS DOUBLE) >= {_D18_T!r}
    """,
)
def d18_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed shingle-containment screening (operators/dedup.py:
    containment_pairs): C(src in dst) = |intersection|/|src| — catches
    quote/excerpt/subset relationships whose Jaccard is tiny. Same
    df-capped hashed-shingle machinery as d02; the oracle reuses the
    d02 shingle CTEs and tests both directions of every co-shingling
    pair."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.containment_pairs(docs, "doc_id", "text", n=3, threshold=_D18_T)


# ------------------------------------------------- m13 audio activity segments

_M13_THRESHOLD = 347_000  # ~16 * E[s^2] for uniform 8-bit samples


@register(
    "m13_audio_segments",
    oracle=f"""
    WITH frames AS ({{M07}}),
    marked AS (
      SELECT doc_id, frame_idx, energy,
             energy >= {_M13_THRESHOLD} AS active,
             CASE WHEN lag(energy >= {_M13_THRESHOLD})
                       OVER (PARTITION BY doc_id ORDER BY frame_idx) IS DISTINCT FROM
                       (energy >= {_M13_THRESHOLD})
                  THEN 1 ELSE 0 END AS chg
      FROM frames),
    seg AS (
      SELECT doc_id, frame_idx, energy, active,
             CAST(sum(chg) OVER (PARTITION BY doc_id ORDER BY frame_idx
                                 ROWS UNBOUNDED PRECEDING) AS INT) AS seg_id
      FROM marked)
    SELECT doc_id, seg_id, active AS is_active,
           CAST(count(*) AS INT) AS n_frames,
           CAST(min(frame_idx) AS INT) AS first_frame,
           CAST(sum(energy) AS BIGINT) AS energy_sum
    FROM seg GROUP BY doc_id, seg_id, active
    """,
)
def m13_audio_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Energy-threshold activity segmentation over the REAL audio
    framing pass — the voice-activity-detection shape that turns a
    frame table into speech/silence segments before transcription
    sampling (the audio analogue of m12's video shots). Consecutive
    frames with the same activity state group into one segment
    (seg_id = running count of state changes); the oracle nests the
    m07 oracle, so decode + framing + segmentation are all pinned.
    Window and aggregation share one doc_id exchange."""
    from ..operators import multimodal

    docs = load_table(spark, sf_dir, "documents")
    frames = multimodal.audio_frame_features(
        multimodal.synth_media_payloads(docs, kind="wav"), frame=16, hop=8
    )
    active = F.col("energy") >= _M13_THRESHOLD
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    chg = F.when(
        F.lag(active).over(w).isNull() | (F.lag(active).over(w) != active), 1
    ).otherwise(0)
    seg = frames.withColumn("active", active).withColumn(
        "seg_id",
        F.sum(chg).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("int"),
    )
    return seg.groupBy("doc_id", "seg_id", F.col("active").alias("is_active")).agg(
        F.count(F.lit(1)).cast("int").alias("n_frames"),
        F.min("frame_idx").cast("int").alias("first_frame"),
        F.sum("energy").cast("bigint").alias("energy_sum"),
    )


ORACLES["m13_audio_segments"] = ORACLES["m13_audio_segments"].format(
    M07=ORACLES["m07_audio_frames"]
)


# ------------------------------------------------- q90 collations

_Q90_KEY = """CASE WHEN doc_id % 3 = 0 THEN upper(source)
       WHEN doc_id % 3 = 1 THEN concat(upper(substring(source, 1, 1)), substring(source, 2))
       ELSE source END"""


@register(
    "q90_collation_group",
    oracle=f"""
    WITH k AS (SELECT doc_id, source, {_Q90_KEY} AS k FROM documents)
    SELECT lower(k) AS source_ci,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT k) AS BIGINT) AS n_case_variants,
           bool_and(lower(k) = lower(source)) AS all_ci_equal
    FROM k GROUP BY lower(k)
    """,
)
def q90_collation_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 string collations: the mixed-case source key groups and
    compares under COLLATE UTF8_LCASE — case-insensitive semantics
    carried by the TYPE, not by wrapping every expression in lower()
    (the post-4.0 way to make a whole pipeline case-insensitive). The
    emitted group key is normalized via lower(min(k)) so the hash is
    representative-independent; n_case_variants counts the exact-case
    variants each collated group absorbed, and the collated equality
    k = source (both sides collated) is pinned per group against the
    lower()-based oracle. Map-only + one aggregation."""
    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("q90_docs")
    return spark.sql(
        f"""
        WITH k AS (SELECT doc_id, source, {_Q90_KEY} AS k FROM q90_docs),
        c AS (SELECT source, k, k COLLATE UTF8_LCASE AS kc FROM k)
        SELECT lower(min(k)) AS source_ci,
               count(*) AS n,
               count(DISTINCT k) AS n_case_variants,
               bool_and(kc = (source COLLATE UTF8_LCASE)) AS all_ci_equal
        FROM c GROUP BY kc
        """
    )


# ------------------------------------------------- p17 exact apportionment

_P17_TARGET = 1000


@register(
    "p17_apportion_budget",
    oracle=f"""
    WITH counts AS (SELECT source, CAST(count(*) AS BIGINT) AS n_rows
                    FROM documents GROUP BY source),
    tot AS (SELECT CAST(sum(n_rows) AS BIGINT) AS _N FROM counts),
    base AS (
      SELECT source, n_rows,
             CAST({_P17_TARGET} AS BIGINT) * n_rows // _N AS floor_q,
             CAST({_P17_TARGET} AS BIGINT) * n_rows % _N AS rem
      FROM counts, tot),
    ranked AS (
      SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS _rk,
             CAST({_P17_TARGET} AS BIGINT) - sum(floor_q) OVER () AS _left
      FROM base)
    SELECT source, n_rows,
           CAST(floor_q + CASE WHEN _rk <= _left THEN 1 ELSE 0 END AS BIGINT) AS quota,
           CAST(floor_q AS BIGINT) AS floor_quota,
           CAST(rem AS BIGINT) AS remainder
    FROM ranked
    """,
)
def p17_apportion_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact largest-remainder (Hamilton) budget apportionment
    (operators/sampling.py:apportion_budget): per-source quotas that
    sum to EXACTLY the target — the contract the rate-based Bernoulli
    mixers trade away. Pure BIGINT floors/remainders of target*n_s, so
    both engines allocate identically including the remainder
    tiebreaks; the windowing runs over the per-source aggregate
    (inherently tiny), never the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    return sampling.apportion_budget(docs, "source", _P17_TARGET)


# ------------------------------------------------- s11 streaming bloom screen

_S11_M = 1 << 18
_S11_K = 3


def _s11_pos_sql(j: int) -> str:
    return (
        f"CAST(('0x' || substr(md5('bloom{j}:' || fp), 1, 8)) AS BIGINT) % {_S11_M}"
    )


@register(
    "s11_stream_bloom_screen",
    oracle=f"""
    WITH fps AS (SELECT doc_id, md5(text) AS fp FROM documents),
    hist AS (SELECT * FROM fps WHERE doc_id % 3 != 0),
    inc AS (SELECT * FROM fps WHERE doc_id % 3 = 0),
    bits AS (
      SELECT DISTINCT bit FROM (
        {" UNION ALL ".join(f"SELECT {_s11_pos_sql(j)} AS bit FROM hist" for j in range(_S11_K))})),
    probe AS (
      {" UNION ALL ".join(f"SELECT doc_id, {_s11_pos_sql(j)} AS bit FROM inc" for j in range(_S11_K))})
    SELECT p.doc_id, count(b.bit) = {_S11_K} AS bloom_hit
    FROM probe p LEFT JOIN bits b USING (bit) GROUP BY p.doc_id
    """,
)
def s11_stream_bloom_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The d17 Bloom ingest screen in its PRODUCTION shape: the history
    bit table is a bounded STATIC frame built once, and the incoming
    documents arrive as a STREAM — each micro-batch probes the
    broadcast bit table (stateless stream-static join + per-doc count,
    no stream state at all, unlike dropDuplicates' unbounded store).
    The drained stream hash-matches the batch oracle; flags are
    deterministic because the filter's bits are md5-derived (d17).
    Scale: the stream side never joins the history — only the <= m_bits
    bit rows ship to executors once."""
    from ..streaming.windows import docs_stream

    docs = load_table(spark, sf_dir, "documents")
    history = docs.filter(F.col("doc_id") % 3 != 0)
    fp = F.md5(F.col("text"))

    def positions(fpc):
        return [
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"bloom{j}:"), fpc)), 1, 8), 16, 10
            ).cast("bigint")
            % _S11_M
            for j in range(_S11_K)
        ]

    bits = history.select(F.explode(F.array(*positions(fp))).alias("bit")).distinct()
    stream = docs_stream(spark, sf_dir).filter(F.col("doc_id") % 3 == 0)
    probe = stream.select(
        F.col("doc_id"), F.explode(F.array(*positions(fp))).alias("bit")
    )
    flagged = (
        probe.join(F.broadcast(bits.withColumn("_set", F.lit(1))), "bit", "left")
        .groupBy("doc_id")
        .agg((F.count("_set") == _S11_K).alias("bloom_hit"))
    )
    name = "s11_bloom"
    q = (
        flagged.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


# ------------------------------------------------- v17 recall-vs-nprobe curve

from .llm import _cosine_sql_raw  # noqa: E402

_V17_PROBES = (1, 2, 3)
_V17_K = 10


def _v17_ivf_sql(nprobe: int) -> str:
    """The v03 IVF oracle body at a given nprobe (same pivots/scoring)."""
    return f"""
    SELECT q_id, vec_id FROM (
      SELECT q_id, vec_id, sim,
             CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS INT) AS rank
      FROM (
        SELECT pr.q_id, e.vec_id, {_cosine_sql('pr.q_vec', 'e.embedding')} AS sim
        FROM embeddings e JOIN (
          SELECT q_id, q_vec, cell FROM (
            SELECT q.q_id, q.q_vec, p.cell,
                   row_number() OVER (PARTITION BY q.q_id
                     ORDER BY {_cosine_sql_raw('q.q_vec', 'p.pivot')} DESC, p.cell) AS prank
            FROM (SELECT vec_id AS q_id, embedding AS q_vec
                  FROM embeddings WHERE vec_id < 5) q
            CROSS JOIN (
              SELECT label AS cell, embedding AS pivot FROM (
                SELECT label, embedding, vec_id,
                       row_number() OVER (PARTITION BY label ORDER BY vec_id) AS rn
                FROM embeddings) WHERE rn = 1) p
          ) WHERE prank <= {nprobe}) pr
        ON e.label = pr.cell AND e.vec_id <> pr.q_id)
    ) WHERE rank <= {_V17_K}"""


def _v17_branch(nprobe: int) -> str:
    return f"""
    SELECT {nprobe} AS nprobe, base.q_id, n_truth,
           COALESCE(n_hit, 0) AS n_hit,
           CAST(COALESCE(n_hit, 0) AS DOUBLE) / CAST(n_truth AS DOUBLE) AS recall
    FROM (SELECT q_id, CAST(count(*) AS BIGINT) AS n_truth FROM bf GROUP BY q_id) base
    LEFT JOIN (
      SELECT bf.q_id, CAST(count(*) AS BIGINT) AS n_hit
      FROM bf JOIN ({_v17_ivf_sql(nprobe)}) iv
        ON bf.q_id = iv.q_id AND bf.vec_id = iv.vec_id
      GROUP BY bf.q_id) hits
    ON base.q_id = hits.q_id"""


@register(
    "v17_recall_nprobe_curve",
    oracle="PLACEHOLDER",  # assembled below from the v01 body + branches
)
def v17_recall_nprobe_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 vs nprobe curve for the IVF index — the measurement
    that SIZES the capacity/recall tradeoff before committing a 100 TB
    corpus to an nprobe setting (v06 pins one point; this gate pins the
    curve at nprobe 1/2/3 in one result). Each branch reuses the v03
    IVF shape and the v06 recall harness; brute-force ground truth is
    computed once and broadcast across branches."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    truth = similarity.brute_force_topk(emb, queries, k=_V17_K)
    truth = truth.localCheckpoint()  # tiny (5*k rows); computed once
    parts = []
    for p in _V17_PROBES:
        approx = similarity.ivf_topk(emb, queries, k=_V17_K, nprobe=p)
        parts.append(
            similarity.ann_recall(truth, approx, k=_V17_K).withColumn(
                "nprobe", F.lit(p)
            )
        )
    out = parts[0]
    for more in parts[1:]:
        out = out.unionByName(more)
    return out.select("nprobe", "q_id", "n_truth", "n_hit", "recall")


ORACLES["v17_recall_nprobe_curve"] = (
    "WITH bf AS (" + ORACLES["v01_cosine_topk"] + ")\n"
    + "\nUNION ALL\n".join(_v17_branch(p) for p in _V17_PROBES)
)

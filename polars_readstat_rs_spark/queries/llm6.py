"""Round-5 LLM-pipeline additions: cross-corpus ANN join (v10),
curriculum packing (p10), fixed-vocabulary tokenizer apply (t15)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import similarity
from ..tables import load_table
from .llm import _cosine_sql
from .registry import register

# ------------------------------------------------- v10 cross-corpus ANN join

_V10_DIM, _V10_NBITS, _V10_NBANDS, _V10_SEED, _V10_K = 64, 32, 4, "srp", 3


def _v10_band_sql(k: int) -> str:
    """Mirror of queries.llm._srp_band_sql for the shared 'srp' planes."""
    bits = _V10_NBITS // _V10_NBANDS
    terms = []
    for r in range(bits):
        b = k * bits + r
        h = (
            f"(('0x' || substr(md5('{_V10_SEED}:{b}:' || CAST(j - 1 AS VARCHAR)), 1, 8))::BIGINT"
            f" / 2147483648.0 - 1.0)"
        )
        dot = (
            f"list_reduce(list_transform(range(1, {_V10_DIM} + 1), "
            f"j -> CAST(embedding[j] AS DOUBLE) * {h}), (x, y) -> x + y)"
        )
        terms.append(f"(CASE WHEN {dot} >= 0 THEN {1 << r} ELSE 0 END)")
    return " + ".join(terms)


@register(
    "v10_ann_join",
    oracle=f"""
    WITH sig AS (
      SELECT vec_id, embedding,
             {", ".join(f"CAST({_v10_band_sql(k)} AS INT) AS b{k}" for k in range(_V10_NBANDS))}
      FROM embeddings),
    bands AS (
      {" UNION ALL ".join(f"SELECT vec_id, {k} AS band_idx, b{k} AS band_val FROM sig" for k in range(_V10_NBANDS))}),
    cand AS (
      SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS c_id
      FROM bands q JOIN bands c
        ON q.band_idx = c.band_idx AND q.band_val = c.band_val
      WHERE q.vec_id % 10 = 0 AND c.vec_id % 10 <> 0),
    scored AS (
      SELECT cand.q_id, cand.c_id, {_cosine_sql('a.embedding', 'b.embedding')} AS sim
      FROM cand JOIN embeddings a ON cand.q_id = a.vec_id
                JOIN embeddings b ON cand.c_id = b.vec_id)
    SELECT q_id, c_id, sim, rank FROM (
      SELECT q_id, c_id, sim,
             CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id) AS INT) AS rank
      FROM scored) WHERE rank <= {_V10_K}
    """,
)
def v10_ann_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus ANN JOIN (operators/similarity.py: srp_ann_join):
    query vectors (vec_id % 10 == 0) retrieve their top-3 corpus
    vectors among SRP band collisions with exact-cosine re-rank — the
    RAG / dedup-against-an-index retrieval shape. The oracle replays
    the identical banding on both sides, so the hash pins candidate
    generation AND ranking."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.srp_ann_join(
        emb.filter(F.col("vec_id") % 10 == 0),
        emb.filter(F.col("vec_id") % 10 != 0),
        k=_V10_K, dim=_V10_DIM, nbits=_V10_NBITS,
        nbands=_V10_NBANDS, seed=_V10_SEED,
    )


# ------------------------------------------------- p10 curriculum schedule

_P10_T1, _P10_T2 = 4.5, 5.5
_P10_BUDGET = 20_000
_P10_SEED = "s0"


@register(
    "p10_curriculum",
    oracle=f"""
    WITH d AS (
      SELECT doc_id AS id,
        CAST(len(string_split(lower(text), ' ')) AS INT) AS n_tokens,
        CAST(length(replace(lower(text), ' ', '')) AS DOUBLE)
          / CAST(len(string_split(lower(text), ' ')) AS DOUBLE) AS diff,
        ('0x' || substr(md5('{_P10_SEED}' || ':' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS h
      FROM documents),
    staged AS (
      SELECT id, n_tokens, h,
        CAST(1 + (CASE WHEN diff >= {_P10_T1} THEN 1 ELSE 0 END)
               + (CASE WHEN diff >= {_P10_T2} THEN 1 ELSE 0 END) AS INT) AS phase
      FROM d),
    sched AS (
      SELECT id, phase, n_tokens,
        CAST(row_number() OVER (PARTITION BY phase ORDER BY h, id) AS INT) AS seq,
        CAST(sum(n_tokens) OVER (PARTITION BY phase ORDER BY h, id
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
      FROM staged)
    SELECT id, phase, seq, n_tokens, cum_tokens
    FROM sched WHERE cum_tokens <= {_P10_BUDGET}
    """,
)
def p10_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum schedule (operators/sampling.py: curriculum_schedule):
    difficulty-banded phases (mean-word-length thresholds), hash-order
    within-phase shuffle, per-phase running token budget — the staged
    data-ordering pass of a curriculum training run. Pure expressions +
    per-phase windows; no global sort."""
    from ..operators import sampling

    docs = load_table(spark, sf_dir, "documents")
    return sampling.curriculum_schedule(
        docs, "doc_id", "text",
        thresholds=(_P10_T1, _P10_T2),
        phase_token_budget=_P10_BUDGET,
        seed=_P10_SEED,
    )


# ------------------------------------------------- v11 MMR diversity re-rank

_V11_NQ, _V11_C, _V11_K, _V11_LAM, _V11_MU = 6, 8, 3, 0.7, 0.3


@register(
    "v11_mmr_rerank",
    oracle=f"""
    WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings
               WHERE vec_id < {_V11_NQ}),
    scored AS (
      SELECT q.q_id, e.vec_id AS c_id, {_cosine_sql('q.q_vec', 'e.embedding')} AS sim
      FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.q_id),
    cand AS (
      SELECT q_id, c_id, sim FROM scored
      QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id) <= {_V11_C}),
    pc AS (
      SELECT x.q_id, x.c_id AS a_id, y.c_id AS b_id,
             {_cosine_sql('ea.embedding', 'eb.embedding')} AS ps
      FROM cand x JOIN cand y ON x.q_id = y.q_id AND x.c_id <> y.c_id
      JOIN embeddings ea ON x.c_id = ea.vec_id
      JOIN embeddings eb ON y.c_id = eb.vec_id),
    s1 AS (
      SELECT q_id, c_id FROM cand
      QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, c_id) = 1),
    m2 AS (
      SELECT c.q_id, c.c_id, c.sim, p.ps AS maxsim,
             round(({_V11_LAM} * c.sim - {_V11_MU} * p.ps) * 1000000) / 1000000 AS score
      FROM cand c
      JOIN s1 ON c.q_id = s1.q_id AND c.c_id <> s1.c_id
      JOIN pc p ON p.q_id = c.q_id AND p.a_id = c.c_id AND p.b_id = s1.c_id),
    s2 AS (
      SELECT q_id, c_id, score FROM m2
      QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY score DESC, c_id) = 1),
    m3 AS (
      SELECT m.q_id, m.c_id, m.sim,
             greatest(m.maxsim, p.ps) AS maxsim,
             round(({_V11_LAM} * m.sim - {_V11_MU} * greatest(m.maxsim, p.ps)) * 1000000) / 1000000 AS score
      FROM m2 m
      JOIN s2 ON m.q_id = s2.q_id AND m.c_id <> s2.c_id
      JOIN pc p ON p.q_id = m.q_id AND p.a_id = m.c_id AND p.b_id = s2.c_id),
    s3 AS (
      SELECT q_id, c_id, score FROM m3
      QUALIFY row_number() OVER (PARTITION BY q_id ORDER BY score DESC, c_id) = 1)
    SELECT q_id, c_id, 1 AS mmr_rank, CAST(NULL AS DOUBLE) AS score FROM s1
    UNION ALL SELECT q_id, c_id, 2, score FROM s2
    UNION ALL SELECT q_id, c_id, 3, score FROM s3
    """,
)
def v11_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance re-rank (operators/similarity.py:
    mmr_rerank): per query, greedily pick 3 of the top-8 cosine
    candidates maximizing lam*relevance - (1-lam)*max-similarity-to-
    selected — the retrieval-diversity pass of a RAG pipeline. The
    oracle unrolls the same greedy recursion step by step (QUALIFY
    argmax per stage), so the hash pins the full selection order and
    scores; rounding to 6 decimals before every argmax makes the greedy
    path cross-engine deterministic."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = similarity.mmr_rerank(
        emb,
        emb.filter(F.col("vec_id") < _V11_NQ),
        n_candidates=_V11_C, k=_V11_K, lam=_V11_LAM,
    )
    return out.select("q_id", "c_id", F.col("mmr_rank").cast("int").alias("mmr_rank"), "score")


# ------------------------------------------------- t15 wordpiece tokenize

_T15_TRI = ("the", "ing", "ion", "ent", "and", "her", "for", "ter", "ati", "ver")
_T15_BI = ("th", "he", "in", "er", "an", "re", "on", "at", "en", "es", "or", "ar", "te", "ed", "st")
_T15_VOCAB = list(_T15_TRI) + list(_T15_BI)


def _t15_in(items) -> str:
    return ", ".join(f"'{x}'" for x in items)


@register(
    "t15_wordpiece",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS words FROM documents),
    words AS (
      SELECT doc_id AS id, CAST(i - 1 AS INT) AS word_idx, words[i] AS word
      FROM (SELECT doc_id, words, unnest(range(1, len(words) + 1)) AS i FROM toks)),
    seg AS (
      WITH RECURSIVE r(id, word_idx, word, pos, tok_idx, token) AS (
        SELECT id, word_idx, word, 1, -1, CAST(NULL AS VARCHAR) FROM words
        UNION ALL
        SELECT id, word_idx, word,
          pos + length(CASE WHEN substr(word, pos, 3) IN ({_t15_in(_T15_TRI)})
                            THEN substr(word, pos, 3)
                            WHEN substr(word, pos, 2) IN ({_t15_in(_T15_BI)})
                            THEN substr(word, pos, 2)
                            ELSE substr(word, pos, 1) END),
          tok_idx + 1,
          CASE WHEN substr(word, pos, 3) IN ({_t15_in(_T15_TRI)})
               THEN substr(word, pos, 3)
               WHEN substr(word, pos, 2) IN ({_t15_in(_T15_BI)})
               THEN substr(word, pos, 2)
               ELSE substr(word, pos, 1) END
        FROM r WHERE pos <= length(word)
      ) SELECT id, word_idx, CAST(tok_idx AS INT) AS tok_idx, token FROM r
        WHERE token IS NOT NULL)
    SELECT id, word_idx, tok_idx, token FROM seg
    """,
)
def t15_wordpiece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy longest-match subword tokenization (operators/text.py:
    wordpiece_tokenize) against a fixed 25-entry subword vocabulary with
    character fallback — WordPiece-style inference over the corpus. The
    Spark side walks a broadcast trie in Arrow batches; the oracle
    unrolls the same greedy rule as a recursive CTE (vocab max length 3
    makes longest-match a closed-form CASE), so the hash pins every
    token boundary in every word of every document."""
    from ..operators.text import wordpiece_tokenize

    docs = load_table(spark, sf_dir, "documents")
    return wordpiece_tokenize(docs, "doc_id", "text", _T15_VOCAB)


# ------------------------------------------------- g04 star components

from .llm import _JACCARD_SELECT, _sh_ctes  # noqa: E402


@register(
    "g04_components_star",
    oracle=f"""
    WITH {_sh_ctes()},
    pairs AS (
      SELECT a_id, b_id FROM ({_JACCARD_SELECT}) WHERE jaccard >= 0.2),
    edges AS (
      SELECT a_id AS src, b_id AS dst FROM pairs
      UNION SELECT b_id, a_id FROM pairs),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    reach AS (
      WITH RECURSIVE r(node, comp) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT e.dst, r.comp FROM r JOIN edges e ON e.src = r.node
      ) SELECT node, comp FROM r)
    SELECT node, min(comp) AS comp FROM reach GROUP BY node
    """,
)
def g04_components_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components via alternating large-star/small-star
    (operators/graph.py: components_star) over the SAME near-dup pair
    graph and against the SAME recursive-SQL oracle as d06 — an
    algorithm A/B gate: min-label propagation (d06, O(diameter) rounds)
    and star contraction (O(log n) rounds — the shape that survives
    path-like 100 TB graphs) must produce identical labels."""
    from ..operators import dedup, graph

    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.2)
    edges = pairs.select(F.col("a_id").alias("s"), F.col("b_id").alias("d"))
    return graph.components_star(edges)


# --------------------------------------- d12 quality-based representatives

from ..operators import textstats as _ts  # noqa: E402

_D12_STOP = ", ".join(f"'{t}'" for t in _ts.STOPWORDS)
_D12_QUALITY = f"""
      0.5 * (CAST(len(list_distinct(string_split(lower(text), ' '))) AS DOUBLE)
             / CAST(len(string_split(lower(text), ' ')) AS DOUBLE))
      + 0.3 * (CAST(len(list_filter(string_split(lower(text), ' '),
                                    x -> x IN ({_D12_STOP}))) AS DOUBLE)
               / CAST(len(string_split(lower(text), ' ')) AS DOUBLE))
      + 0.2 * least(1.0, CAST(len(string_split(lower(text), ' ')) AS DOUBLE) / 200.0)
"""


@register(
    "d12_cluster_representatives",
    oracle=f"""
    WITH {_sh_ctes()},
    pairs AS (
      SELECT a_id, b_id FROM ({_JACCARD_SELECT}) WHERE jaccard >= 0.2),
    edges AS (
      SELECT a_id AS src, b_id AS dst FROM pairs
      UNION SELECT b_id, a_id FROM pairs),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    reach AS (
      WITH RECURSIVE r(node, comp) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT e.dst, r.comp FROM r JOIN edges e ON e.src = r.node
      ) SELECT node, comp FROM r),
    labeled AS (SELECT node, min(comp) AS comp FROM reach GROUP BY node),
    scored AS (
      SELECT l.comp, l.node, ({_D12_QUALITY}) AS q
      FROM labeled l JOIN documents d ON l.node = d.doc_id)
    SELECT comp, node AS keep_id, q AS best_quality, n_docs FROM (
      SELECT comp, node, q,
             row_number() OVER (PARTITION BY comp ORDER BY q DESC, node) AS rn,
             CAST(count(*) OVER (PARTITION BY comp) AS BIGINT) AS n_docs
      FROM scored) WHERE rn = 1
    """,
)
def d12_cluster_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-based dedup representative selection: near-dup clusters
    (d06 components) keep their HIGHEST-QUALITY member (t02's scoring
    formula — bitwise cross-engine, proven by the t02 gate) instead of
    the lowest id — the curation policy a real training pipeline wants.
    Pure composition of gated operators: pairs -> components -> quality
    argmax per cluster (window, tie on id)."""
    from ..operators import dedup

    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.2)
    comp = dedup.neardup_components(pairs)
    q = _ts.quality_score(docs).select(F.col("doc_id").alias("node"), F.col("quality").alias("q"))
    from pyspark.sql import Window

    w = Window.partitionBy("comp").orderBy(F.desc("q"), F.asc("node"))
    wn = Window.partitionBy("comp")
    return (
        comp.join(q, "node")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n_docs", F.count(F.lit(1)).over(wn).cast("bigint"))
        .filter(F.col("rn") == 1)
        .select("comp", F.col("node").alias("keep_id"), F.col("q").alias("best_quality"), "n_docs")
    )


@register(
    "v12_knn_label_vote",
    oracle=f"""
    WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 50),
    scored AS (
      SELECT q.q_id, e.vec_id, e.label, {_cosine_sql('q.q_vec', 'e.embedding')} AS sim
      FROM embeddings e JOIN q ON e.vec_id <> q.q_id),
    nn AS (
      SELECT q_id, vec_id, label, sim FROM (
        SELECT q_id, vec_id, label, sim,
               row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS rank
        FROM scored) WHERE rank <= 5),
    votes AS (
      SELECT q_id, label, count(*) AS votes, max(sim) AS best_sim
      FROM nn GROUP BY q_id, label)
    SELECT q_id, label, votes, round(best_sim, 6) AS best_sim FROM (
      SELECT q_id, label, votes, best_sim,
             row_number() OVER (PARTITION BY q_id ORDER BY votes DESC, best_sim DESC, label) AS rk
      FROM votes) WHERE rk = 1
    """,
)
def v12_knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN majority-vote labeling (operators/similarity.py:
    knn_label_vote): the weak-supervision primitive — label each query
    vector from its 5 exact cosine neighbors' labels, deterministic
    tie-breaks, hash-compared against the full SQL formulation."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 50)
    return similarity.knn_label_vote(emb, queries, k=5)

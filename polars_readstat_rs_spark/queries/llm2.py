"""Round-4 LLM-pipeline gate queries: unigram-LM quality scoring,
passage-level exact dedup, SemDeDup-style semantic dedup, and BM25
full-text search.

Determinism notes (per registry rules):
- t07 emits only BIGINT aggregates (the operator's double avg_logprob
  uses ln, which differs between Spark's Math.log and DuckDB's libm in
  the last ulp on ~1/7 of inputs — measured, so it stays out of gates);
- t08 uses the operator's ``idf='rational'`` mode (no transcendental)
  and an ordered left fold per (query, doc), so every score double is
  bitwise identical;
- d07 strings/ints pass through; dup_ratio is a single exact division;
- d08 reuses the v04 k-means CTE fragments plus the d06 recursive
  reach; cosine thresholds compare bitwise-identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup, search, similarity, textstats
from ..tables import load_table
from .llm import _DOTD, _km_chain
from .registry import register

# ------------------------------------------------- t07 unigram LM scoring


@register(
    "t07_unigram_lm",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents),
    vocab AS (SELECT tok, CAST(count(*) AS BIGINT) AS tok_count FROM toks GROUP BY tok),
    tot AS (SELECT CAST(sum(tok_count) AS BIGINT) AS corpus_tokens FROM vocab)
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(v.tok_count) AS BIGINT) AS sum_tok_count,
           min(v.tok_count) AS min_tok_count,
           any_value(tot.corpus_tokens) AS corpus_tokens
    FROM toks t JOIN vocab v USING (tok) CROSS JOIN tot
    GROUP BY t.doc_id
    """,
)
def t07_unigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-unigram LM quality scoring (operators/textstats.py
    unigram_lm): the gate emits the exact-integer skeleton (token
    counts, corpus-frequency sums, rarest-token count); avg_logprob is
    derived from exactly these integers."""
    docs = load_table(spark, sf_dir, "documents")
    return textstats.unigram_lm(docs).select(
        "doc_id", "n_tokens", "sum_tok_count", "min_tok_count", "corpus_tokens"
    )


# ------------------------------------------------- d07 passage-level dedup

_CHUNK_W = 8


@register(
    "d07_passage_dedup",
    oracle=f"""
    WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS words FROM documents),
    w2 AS (SELECT doc_id, words,
                  CAST(ceil(len(words) / {float(_CHUNK_W)!r}) AS BIGINT) AS n_chunks FROM w),
    ch AS (
      SELECT doc_id, n_chunks,
             CAST(unnest(range(0, n_chunks)) AS INT) AS chunk_idx,
             unnest(list_transform(range(0, n_chunks),
                    i -> array_to_string(words[i*{_CHUNK_W}+1 : i*{_CHUNK_W}+{_CHUNK_W}], ' '))) AS chunk
      FROM w2),
    kk AS (
      SELECT doc_id, chunk_idx, chunk,
             doc_id * {dedup.MAX_PASSAGE_IDX} + chunk_idx AS k,
             min(doc_id * {dedup.MAX_PASSAGE_IDX} + chunk_idx)
               OVER (PARTITION BY md5(chunk)) AS first_k
      FROM ch),
    kept AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
             array_to_string(list(chunk ORDER BY chunk_idx), ' ') AS clean_text
      FROM kk WHERE k = first_k GROUP BY doc_id)
    SELECT d.doc_id, d.n_chunks,
           COALESCE(kept.n_kept, 0) AS n_kept,
           COALESCE(kept.clean_text, '') AS clean_text,
           CAST(d.n_chunks - COALESCE(kept.n_kept, 0) AS DOUBLE)
             / CAST(d.n_chunks AS DOUBLE) AS dup_ratio
    FROM (SELECT doc_id, n_chunks FROM w2) d LEFT JOIN kept USING (doc_id)
    """,
)
def d07_passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-level exact dedup (operators/dedup.py passage_dedup):
    keep the globally first occurrence of every 8-word chunk and
    reassemble documents from surviving chunks."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.passage_dedup(docs, chunk_words=_CHUNK_W)


# ------------------------------------------------- d08 semantic dedup

_SEM_THRESHOLD = 0.3
_SEM_NCELLS = 8


@register(
    "d08_semantic_dedup",
    oracle=f"""
    WITH {_km_chain(_SEM_NCELLS)},
    n AS (
      SELECT vec_id, vec, cell, sqrt({_DOTD.format(a='vec', b='vec')}) AS norm FROM af),
    pairs AS (
      SELECT a.vec_id AS a_id, b.vec_id AS b_id
      FROM n a JOIN n b ON a.cell = b.cell AND a.vec_id < b.vec_id
      WHERE {_DOTD.format(a='a.vec', b='b.vec')} / (a.norm * b.norm) >= {_SEM_THRESHOLD}),
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
    comps AS (SELECT node, min(comp) AS comp FROM reach GROUP BY node)
    SELECT v.vec_id,
           COALESCE(c.comp, v.vec_id) AS rep_id,
           COALESCE(c.comp, v.vec_id) = v.vec_id AS is_rep
    FROM v LEFT JOIN comps c ON c.node = v.vec_id
    """,
)
def d08_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (operators/similarity.py semantic_dedup): k-means cells
    -> within-cell cosine pairs -> min-label components -> one
    representative per semantic cluster. Oracle unrolls the same two
    Lloyd iterations (v04 fragments) and walks the pair graph with
    recursive SQL (d06 fragment)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.semantic_dedup(
        emb, threshold=_SEM_THRESHOLD, ncells=_SEM_NCELLS, iters=2
    )


# ------------------------------------------------- t08 BM25 search

_BM_K, _BM_K1, _BM_B = 5, 1.2, 0.75


@register(
    "t08_bm25_topk",
    oracle=f"""
    WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS words FROM documents),
    toks AS (SELECT doc_id, CAST(len(words) AS INT) AS dl, unnest(words) AS tok FROM w),
    postings AS (
      SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf, any_value(dl) AS dl
      FROM toks GROUP BY 1, 2),
    dfreq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM postings GROUP BY tok),
    stats AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(len(words)) AS BIGINT) AS sum_dl
      FROM w),
    q AS (
      SELECT doc_id AS query_id, unnest(list_distinct(words[1:3])) AS tok
      FROM w WHERE doc_id % 50 = 0),
    j AS (
      SELECT q.query_id, p.doc_id, q.tok,
             ((CAST(s.n_docs - d.df AS DOUBLE) + 0.5) / (CAST(d.df AS DOUBLE) + 0.5))
             * ((CAST(p.tf AS DOUBLE) * {_BM_K1 + 1.0!r})
                / (CAST(p.tf AS DOUBLE) + {_BM_K1!r} * ({1.0 - _BM_B!r} + {_BM_B!r}
                   * (CAST(p.dl AS DOUBLE) / (CAST(s.sum_dl AS DOUBLE) / CAST(s.n_docs AS DOUBLE))))))
             AS contrib
      FROM q JOIN postings p USING (tok) JOIN dfreq d USING (tok) CROSS JOIN stats s),
    scored AS (
      SELECT query_id, doc_id,
             list_reduce(list(contrib ORDER BY tok), (x, y) -> x + y) AS score
      FROM j GROUP BY query_id, doc_id)
    SELECT query_id, doc_id, score, rank FROM (
      SELECT query_id, doc_id, score,
             CAST(row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS INT) AS rank
      FROM scored) WHERE rank <= {_BM_K}
    """,
)
def t08_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k retrieval (operators/search.py bm25_topk): inverted
    postings + Okapi scoring; gate uses the log-free rational-idf mode
    and 3-word queries synthesized from every 50th document."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.lower(F.col("text")), " ")
    queries = docs.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("query_id"),
        F.array_join(F.slice(words, 1, 3), " ").alias("q_text"),
    )
    return search.bm25_topk(
        docs, queries, k=_BM_K, k1=_BM_K1, b=_BM_B, idf="rational"
    )


# ------------------------------------------------- v06 ANN recall eval

from .registry import ORACLES  # noqa: E402  (composes earlier oracles)

_RECALL_K = 10

# The oracle recomputes BOTH rankings by embedding the v01 (brute-force
# ground truth) and v03 (IVF) oracle bodies as nested subqueries, then
# joins them — every sim double and rank is therefore bitwise-identical
# to the gates those oracles already pass.
ORACLES["v06_ann_recall"] = f"""
    WITH bf AS ({ORACLES["v01_cosine_topk"]}),
    iv AS ({ORACLES["v03_ivf_topk"]}),
    base AS (SELECT q_id, CAST(count(*) AS BIGINT) AS n_truth FROM bf GROUP BY q_id),
    hits AS (
      SELECT bf.q_id, CAST(count(*) AS BIGINT) AS n_hit
      FROM bf JOIN iv ON bf.q_id = iv.q_id AND bf.vec_id = iv.vec_id
      GROUP BY bf.q_id)
    SELECT base.q_id, n_truth,
           COALESCE(n_hit, 0) AS n_hit,
           CAST(COALESCE(n_hit, 0) AS DOUBLE) / CAST(n_truth AS DOUBLE) AS recall
    FROM base LEFT JOIN hits ON base.q_id = hits.q_id
    """


@register("v06_ann_recall")
def v06_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the IVF index (v03 configuration) against
    brute-force ground truth (v01 configuration) — the eval harness
    (operators/similarity.py ann_recall) that sizes ncells/nprobe
    before a full-corpus ANN run."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    truth = similarity.brute_force_topk(emb, queries, k=_RECALL_K)
    approx = similarity.ivf_topk(emb, queries, k=_RECALL_K, nprobe=3)
    return similarity.ann_recall(truth, approx, k=_RECALL_K)


# ------------------------------------------------- d09 incremental dedup


def _incr_minhash_oracle() -> str:
    """Mirror of operators.dedup.incremental_minhash_pairs: shared
    df-capped shingle table over base+new, minhash bands, base x new
    band-bucket candidates, exact Jaccard verify (new batch = doc_id
    divisible by 5; base = the rest)."""
    from .llm import _SHINGLE_N, _sh_ctes

    sig_cols = ", ".join(
        f"min(substring(sha256(sh), {1 + 8 * i}, 8)) AS h{i}" for i in range(dedup.NUM_HASHES)
    )
    band_selects = []
    for b in range(dedup.NUM_BANDS):
        hs = [f"h{b * dedup.ROWS_PER_BAND + r}" for r in range(dedup.ROWS_PER_BAND)]
        key = " || '|' || ".join(hs)
        band_selects.append(f"SELECT doc, {b} AS band_idx, md5({key}) AS band_key FROM sig")
    bands = " UNION ALL ".join(band_selects)
    # _sh_ctes supplies toks/sh_all/rare/sh/sizes (+ an a<b `inter` CTE
    # the incremental query ignores — base/new orientation replaces it)
    return f"""
    WITH {_sh_ctes(_SHINGLE_N)},
    sig AS (SELECT doc, {sig_cols} FROM (SELECT doc, sh FROM sh) GROUP BY doc),
    bands AS ({bands}),
    cand AS (
      SELECT DISTINCT x.doc AS base_id, y.doc AS new_id
      FROM bands x JOIN bands y
        ON x.band_idx = y.band_idx AND x.band_key = y.band_key
       AND x.doc % 5 <> 0 AND y.doc % 5 = 0),
    inter2 AS (
      SELECT a.doc AS base_id, b.doc AS new_id, count(*) AS inter
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc % 5 <> 0 AND b.doc % 5 = 0
      GROUP BY 1, 2)
    SELECT c.base_id, c.new_id, i.inter, (sa.sz + sb.sz - i.inter) AS un,
           CAST(i.inter AS DOUBLE) / CAST(sa.sz + sb.sz - i.inter AS DOUBLE) AS jaccard
    FROM inter2 i
    JOIN cand c ON i.base_id = c.base_id AND i.new_id = c.new_id
    JOIN sizes sa ON i.base_id = sa.doc JOIN sizes sb ON i.new_id = sb.doc
    """


@register("d09_incremental_dedup", oracle=_incr_minhash_oracle())
def d09_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup (operators/dedup.py
    incremental_minhash_pairs): every 5th document plays the NEW batch,
    deduplicated against the remaining corpus as BASE — the
    index-reuse shape of a continuously-ingesting 100 TB pipeline."""
    from .llm import _SHINGLE_N

    docs = load_table(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % 5 == 0)
    base = docs.filter(F.col("doc_id") % 5 != 0)
    return dedup.incremental_minhash_pairs(base, new, "doc_id", "text", n=_SHINGLE_N)

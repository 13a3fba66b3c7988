"""Fifth LLM-pipeline batch: substring-level span dedup (d11) and
TF-IDF keyword extraction (t14)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup, textstats
from ..tables import load_table
from .registry import register

_SPAN_K = 5


@register(
    "d11_span_dedup",
    oracle=f"""
    WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS words FROM documents),
    wins AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               range(1, greatest(len(words) - {_SPAN_K - 2}, 1)),
               i -> md5(array_to_string(words[i:i+{_SPAN_K - 1}], ' '))))) AS wh
      FROM w),
    dfreq AS (SELECT wh, count(*) AS wdf FROM wins GROUP BY wh)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_windows,
           CAST(sum(CASE WHEN wdf >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
           CAST(sum(CASE WHEN wdf >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS dup_ratio
    FROM wins JOIN dfreq USING (wh)
    GROUP BY doc_id
    """,
)
def d11_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping k-token window duplication stats (operators/dedup.py:
    duplicated_spans — the Lee et al. substring-dedup signal). Pure
    explode + two shuffles, no pair join: boilerplate floods only grow
    a counter, so the operator has no quadratic mode at all."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.duplicated_spans(docs, "doc_id", "text", k=_SPAN_K).withColumnRenamed(
        "doc", "doc_id"
    )


@register(
    "t14_tfidf_terms",
    oracle="""
    WITH toks AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok FROM documents),
    tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2),
    dfq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok),
    nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
    SELECT doc_id, rank, tok, tf, df, n_docs, weight FROM (
      SELECT t.doc_id, t.tok, t.tf, d.df, nd.n_docs,
             round(CAST(t.tf AS DOUBLE) * ln(CAST(nd.n_docs AS DOUBLE) / CAST(d.df AS DOUBLE)), 6) AS weight,
             CAST(row_number() OVER (
               PARTITION BY t.doc_id
               ORDER BY round(CAST(t.tf AS DOUBLE) * ln(CAST(nd.n_docs AS DOUBLE) / CAST(d.df AS DOUBLE)), 6) DESC,
                        t.tok) AS INT) AS rank
      FROM tf t JOIN dfq d USING (tok) CROSS JOIN nd)
    WHERE rank <= 3
    """,
)
def t14_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (operators/textstats.py:
    tfidf_top_terms). The weight is one ln + one multiply over exact
    integers rounded to 6 decimals (1-ulp ln noise), so the ranking is
    cross-engine deterministic;
    ties break on the token."""
    docs = load_table(spark, sf_dir, "documents")
    return textstats.tfidf_top_terms(docs, top_k=3)


# ------------------------------------------------- v09 filtered ANN

from ..operators import sampling, similarity  # noqa: E402
from .llm import _cosine_sql  # noqa: E402


@register(
    "v09_filtered_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec, label AS f
               FROM embeddings WHERE vec_id < 8),
    scored AS (
      SELECT q.q_id, e.vec_id, {_cosine_sql('q.q_vec', 'e.embedding')} AS sim
      FROM embeddings e JOIN q ON e.label = q.f AND e.vec_id <> q.q_id)
    SELECT q_id, vec_id, sim, rank FROM (
      SELECT q_id, vec_id, sim,
             CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS INT) AS rank
      FROM scored) WHERE rank <= 10
    """,
)
def v09_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-filtered vector search (operators/similarity.py:
    filtered_topk): each query's top-10 restricted to corpus vectors
    with the query's own label — pre-filter semantics, constraint as
    the join key."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.filtered_topk(emb, emb.filter(F.col("vec_id") < 8), k=10)


# ------------------------------------------------- p09 temperature mix

_P09_TARGET = 1000
_P09_SEED = "s0"


@register(
    "p09_temperature_mix",
    oracle=f"""
    WITH counts AS (SELECT source, count(*) AS _n FROM documents GROUP BY source),
    w AS (SELECT source, _n,
                 CAST(round(sqrt(CAST(_n AS DOUBLE)), 6) AS DECIMAL(18,6)) AS _w
          FROM counts),
    tot AS (SELECT sum(_w) AS _wsum FROM w),
    rates AS (
      SELECT source,
             least(CAST(1.0 AS DOUBLE),
                   {float(_P09_TARGET)!r} * (CAST(_w AS DOUBLE) / CAST(_wsum AS DOUBLE))
                     / CAST(_n AS DOUBLE)) AS _rate
      FROM w, tot)
    SELECT d.doc_id, d.source
    FROM documents d JOIN rates r USING (source)
    WHERE ('0x' || substr(md5('{_P09_SEED}' || ':' || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
          < CAST(floor(r._rate * {float(sampling.BUCKETS)!r}) AS BIGINT)
    """,
)
def p09_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sqrt-temperature source rebalancing (operators/sampling.py:
    temperature_mix, the multilingual alpha=0.5 exponent): rates from
    exact-DECIMAL sqrt weights, filter is the stable hash Bernoulli."""
    docs = load_table(spark, sf_dir, "documents")
    return sampling.temperature_mix(docs, "doc_id", "source", _P09_TARGET, _P09_SEED).select(
        "doc_id", "source"
    )


# ------------------------------------------------- q80 Python UDTF

@register(
    "q80_python_udtf",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(lower(text), ' ') AS words FROM documents
               WHERE doc_id % 50 = 0),
    s AS (SELECT doc_id,
                 CAST(unnest(range(0, CAST(ceil(len(words) / 10.0) AS BIGINT))) AS INT) AS seg_id,
                 len(words) AS n FROM w)
    SELECT doc_id, seg_id,
           CAST(least(10, n - seg_id * 10) AS INT) AS seg_tokens
    FROM s
    """,
)
def q80_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 table-function surface, the last missing
    Python-UDF shape after scalar pandas_udf / grouped-map / mapInPandas
    / applyInPandasWithState): a LATERAL-joined table function that
    segments each document into 10-token spans. Deterministic integer
    output; the oracle reproduces the segmentation with range/ceil
    arithmetic."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="seg_id: int, seg_tokens: int")
    class Segment:
        def eval(self, n_tokens: int):
            seg = 0
            left = n_tokens
            while left > 0:
                yield seg, min(10, left)
                seg += 1
                left -= 10

    spark.udtf.register("segment_doc", Segment)
    docs = load_table(spark, sf_dir, "documents")
    docs.filter(F.col("doc_id") % 50 == 0).selectExpr(
        "doc_id", "size(split(lower(text), ' ')) AS n_tokens"
    ).createOrReplaceTempView("_q80_docs")
    return spark.sql(
        """
        SELECT d.doc_id, s.seg_id, s.seg_tokens
        FROM _q80_docs d, LATERAL segment_doc(d.n_tokens) s
        """
    )


# ------------------------------------------------- m05 real video demux

from ..operators import multimodal  # noqa: E402


@register(
    "m05_video_frames",
    oracle="""
    WITH f AS (
      SELECT doc_id, unnest(range(0, 2 + doc_id % 4, 2)) AS frame_idx FROM documents),
    px AS (SELECT doc_id, frame_idx, unnest(range(0, 144)) AS p FROM f),
    v AS (
      SELECT doc_id, frame_idx,
             (doc_id + 7 * frame_idx + 3 * ((p // 3) % 8) + 5 * ((p // 3) // 8)
              + 11 * (p % 3)) % 256 AS val
      FROM px)
    SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
           CAST(8 AS INT) AS width, CAST(6 AS INT) AS height,
           CAST(sum(val) AS BIGINT) AS sum_vals
    FROM v GROUP BY doc_id, frame_idx
    """,
)
def m05_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video-frame sampling (operators/multimodal.py:
    sample_video_frames): per-doc multi-frame BMP containers are
    synthesized executor-side from closed-form pixels, then DEMUXED by
    walking the genuine BITMAPFILEHEADER sizes and decoding every 2nd
    frame — the oracle recomputes each sampled frame's pixel sum from
    the closed form, so a hash match proves the container walk, the
    per-frame decode, and the 1:N fan-out."""
    docs = load_table(spark, sf_dir, "documents")
    return multimodal.sample_video_frames(
        multimodal.synth_video_payloads(docs), stride=2
    )

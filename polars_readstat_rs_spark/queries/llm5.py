"""Fifth LLM-pipeline batch: substring-level span dedup (d11) and
TF-IDF keyword extraction (t14)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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

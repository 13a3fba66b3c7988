"""BM25 full-text relevance search over a document corpus.

The text-side counterpart of operators/similarity.py: build a
distributed inverted index (postings = (token, doc, tf) + document
frequencies), score queries with Okapi BM25, return the top-k documents
per query. Everything is DataFrame-native: the postings build shuffles
once on (doc, token), document frequencies aggregate the postings on the
token (uniform after partial aggregation), and query scoring is a join
on the token — query-term lists are tiny, so the per-(query, doc)
reduction is a bounded array fold, not another wide shuffle.

Determinism: per-(query, doc) score contributions are summed by an
explicit left-to-right fold ordered by token, so a SQL oracle running
`list(contrib ORDER BY tok)` + `list_reduce` reproduces every double
bitwise. The idf factor is ``log((N - df + 0.5) / (df + 0.5))`` by
default; ``idf="rational"`` drops the log (a monotone-before-log variant
usable where engines' ln implementations differ in the last ulp —
Spark's Math.log and DuckDB's libm disagree on ~1/7 of inputs, measured).

Scale: at 100 TB the postings table is the big object; it shuffles on
uniform keys and never materializes driver-side. Stop-token skew in the
scoring join is bounded by ``df_cap`` (drop terms appearing in more than
df_cap docs — they carry ~zero idf anyway), the same guard the dedup
family uses for stop-shingles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .text import words_expr

DEFAULT_K1 = 1.2
DEFAULT_B = 0.75


def build_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Inverted-index postings: (tok, doc, tf, dl). One shuffle."""
    words = words_expr(text_col)
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(words).alias("dl"),
        F.explode(words).alias("tok"),
    )
    return toks.groupBy("doc_id", "tok").agg(
        F.count("*").alias("tf"), F.first("dl").alias("dl")
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
    id_col: str = "doc_id",
    text_col: str = "text",
    qid_col: str = "query_id",
    qtext_col: str = "q_text",
    idf: str = "log",
    df_cap: int | None = None,
) -> DataFrame:
    """Top-k BM25 documents per query: (query_id, doc_id, score, rank).

    ``idf='log'`` is classic Okapi; ``idf='rational'`` uses the
    pre-log odds ratio (same Robertson-Sparck-Jones numerator /
    denominator, no transcendental — see module docstring). ``df_cap``
    drops query terms whose document frequency exceeds the cap (the
    stop-word skew guard; such terms contribute negative-to-negligible
    idf).
    """
    if idf not in ("log", "rational"):
        raise ValueError(f"idf must be 'log' or 'rational', got {idf!r}")
    postings = build_postings(docs, id_col, text_col)
    dfreq = postings.groupBy("tok").agg(F.count("*").alias("df"))
    if df_cap is not None:
        dfreq = dfreq.filter(F.col("df") <= df_cap)
    words = words_expr(text_col)
    stats = docs.agg(
        F.count("*").alias("n_docs"), F.sum(F.size(words)).alias("sum_dl")
    )
    qt = queries.select(
        F.col(qid_col).alias("query_id"),
        F.explode(F.array_distinct(words_expr(qtext_col))).alias("tok"),
    )
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")
    idf_rational = ((F.col("n_docs") - F.col("df")).cast("double") + F.lit(0.5)) / (
        F.col("df").cast("double") + F.lit(0.5)
    )
    idf_col = F.log(idf_rational) if idf == "log" else idf_rational
    tf_d = F.col("tf").cast("double")
    contrib = idf_col * (
        (tf_d * F.lit(k1 + 1.0))
        / (tf_d + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * (F.col("dl").cast("double") / avgdl)))
    )
    joined = (
        qt.join(postings, "tok")
        .join(dfreq, "tok")
        .crossJoin(F.broadcast(stats))
        .select("query_id", "doc_id", "tok", contrib.alias("contrib"))
    )
    # left-to-right fold ordered by token: bitwise-reproducible sum
    scored = (
        joined.groupBy("query_id", "doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("tok", "contrib"))).alias("cs"))
        .select(
            "query_id",
            "doc_id",
            F.aggregate(
                F.transform("cs", lambda s: s["contrib"]),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("score"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return scored.withColumn("rank", F.row_number().over(w).cast("int")).filter(
        F.col("rank") <= k
    )

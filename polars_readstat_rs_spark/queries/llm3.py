"""Round-3 additions: Gopher-rule quality filtering, bigram-LM scoring,
and the salted skew-join gate.

Determinism notes (per registry rules):
- t09's doubles are each a single exact division of exact integers
  (same rule as d07's dup_ratio), so the rule booleans and the
  conjunction compare bitwise;
- t10 follows t07's convention: the gate emits the exact-BIGINT
  skeleton (bigram counts, corpus-frequency sums) and leaves the
  ln-based avg_logprob out (Spark Math.log vs DuckDB libm differ in
  the last ulp on ~1/7 of inputs — measured in round 4);
- q42's result is by construction independent of the salt column (the
  salt is dropped and the replicated small side carries every salt
  value), so the oracle is the plain equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import merge, skew, textstats
from ..tables import load_table
from .registry import register

# ------------------------------------------------- t09 Gopher quality rules


@register(
    "t09_gopher_quality",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, string_split(lower(text), ' ') AS words, length(text) AS n_chars
      FROM documents),
    m AS (
      SELECT doc_id,
             CAST(len(words) AS INT) AS n_words,
             CAST(n_chars - (len(words) - 1) AS DOUBLE) / CAST(len(words) AS DOUBLE)
               AS avg_word_len,
             CAST(len(list_filter(words, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
               / CAST(len(words) AS DOUBLE) AS alpha_frac,
             CAST(len(list_intersect(list_distinct(words),
                  {list(textstats.STOPWORDS)!r})) AS INT) AS stop_hits
      FROM w)
    SELECT doc_id, n_words, avg_word_len, alpha_frac, stop_hits,
           (n_words >= {textstats.GOPHER_MIN_WORDS}
            AND n_words <= {textstats.GOPHER_MAX_WORDS}) AS rule_word_count,
           (avg_word_len >= {textstats.GOPHER_MIN_AVG_LEN!r}
            AND avg_word_len <= {textstats.GOPHER_MAX_AVG_LEN!r}) AS rule_avg_len,
           (alpha_frac >= {textstats.GOPHER_MIN_ALPHA_FRAC!r}) AS rule_alpha,
           (stop_hits >= {textstats.GOPHER_MIN_STOP_HITS}) AS rule_stopwords,
           ((n_words >= {textstats.GOPHER_MIN_WORDS}
             AND n_words <= {textstats.GOPHER_MAX_WORDS})
            AND (avg_word_len >= {textstats.GOPHER_MIN_AVG_LEN!r}
                 AND avg_word_len <= {textstats.GOPHER_MAX_AVG_LEN!r})
            AND (alpha_frac >= {textstats.GOPHER_MIN_ALPHA_FRAC!r})
            AND (stop_hits >= {textstats.GOPHER_MIN_STOP_HITS})) AS keep
    FROM m
    """,
)
def t09_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule quality filter (operators/textstats.py gopher_quality):
    word-count / word-shape / stopword rules as one shuffle-free pass,
    per-rule booleans plus the keep conjunction.

    Reference analogue: the reference has no text-quality surface; this
    extends the pipeline family SURVEY.md §2.6 marks as Spark-native.
    """
    docs = load_table(spark, sf_dir, "documents")
    return textstats.gopher_quality(docs)


# ------------------------------------------------- t10 bigram LM scoring


@register(
    "t10_bigram_lm",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split(lower(text), ' ') AS words FROM documents),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(words)),
                    i -> array_to_string(words[i:i+1], ' '))) AS bg
      FROM w WHERE len(words) >= 2),
    bgc AS (SELECT bg, CAST(count(*) AS BIGINT) AS bg_count FROM bg GROUP BY bg),
    scored AS (
      SELECT b.doc_id,
             CAST(count(*) AS BIGINT) AS n_bigrams,
             CAST(sum(c.bg_count) AS BIGINT) AS sum_bg_count,
             min(c.bg_count) AS min_bg_count
      FROM bg b JOIN bgc c USING (bg) GROUP BY b.doc_id)
    SELECT d.doc_id, s.n_bigrams, s.sum_bg_count, s.min_bg_count
    FROM documents d LEFT JOIN scored s USING (doc_id)
    """,
)
def t10_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-bigram LM scoring (operators/textstats.py bigram_lm): the
    gate emits the exact-integer skeleton; avg_logprob derives from
    exactly these integers (ln excluded per the t07 convention)."""
    docs = load_table(spark, sf_dir, "documents")
    return textstats.bigram_lm(docs).select(
        "doc_id", "n_bigrams", "sum_bg_count", "min_bg_count"
    )


# ------------------------------------------------- q42 salted skew join


@register(
    "q42_salted_join",
    oracle="""
    SELECT c.c_nationkey,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_nationkey
    """,
)
def q42_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key-safe equi-join (operators/skew.py salted_join): the fact
    side is salted into 16 shuffle keys per customer, the dimension side
    replicated once per salt, so a pathologically hot customer spreads
    over 16 tasks instead of one straggler. The salt never escapes:
    output is identical to the plain join, as the oracle asserts.
    """
    orders = load_table(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "custkey")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_nationkey"
    )
    joined = skew.salted_join(orders, cust, "custkey")
    return joined.groupBy("c_nationkey").agg(
        F.count("*").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
        .cast("double")
        .alias("total_price"),
    )


# ------------------------------------------------- t11 BPE pair counting


@register(
    "t11_bpe_pairs",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             unnest(regexp_extract_all(lower(text),
                    '{textstats.BPE_PRETOKEN_RE.replace("'", "''")}', 1)) AS tok
      FROM documents),
    pairs AS (
      SELECT doc_id,
             unnest(list_transform(range(1, greatest(length(tok), 1)),
                    i -> tok[i:i+1])) AS pair
      FROM toks)
    SELECT pair,
           CAST(count(*) AS BIGINT) AS n_pair,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM pairs GROUP BY pair
    """,
)
def t11_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE merge statistics (operators/textstats.py bpe_pair_counts):
    GPT-2-style regex pre-tokenization, then adjacent-character-pair
    corpus counts — the argmax of n_pair is the first BPE merge."""
    docs = load_table(spark, sf_dir, "documents")
    return textstats.bpe_pair_counts(docs)


# ------------------------------------------------- q43 upsert / MERGE INTO


@register(
    "q43_upsert",
    oracle="""
    WITH updates AS (
      SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
             CAST(CAST(o_totalprice AS DECIMAL(12,2)) * CAST(2 AS DECIMAL(12,2)) AS DOUBLE)
               AS o_totalprice,
             o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 10 = 0
      UNION ALL
      SELECT -o_orderkey, o_custkey, 'I', o_totalprice, o_orderdate, o_orderpriority
      FROM orders WHERE o_orderkey % 97 = 0),
    merged AS (
      SELECT * FROM updates
      UNION ALL
      SELECT * FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.o_orderkey = o.o_orderkey))
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM merged GROUP BY o_orderstatus
    """,
)
def q43_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet-pipeline MERGE INTO (operators/merge.py upsert): a CDC
    batch (10% updated rows, ~1% inserts with fresh keys) merged into
    the orders table with one key shuffle, then summarized by status so
    the gate sees updated/inserted/untouched populations separately."""
    orders = load_table(spark, sf_dir, "orders")
    updates = (
        orders.filter(F.col("o_orderkey") % 10 == 0)
        .withColumn("o_orderstatus", F.lit("U"))
        .withColumn(
            "o_totalprice",
            (F.col("o_totalprice").cast("decimal(12,2)") * F.lit(2).cast("decimal(12,2)"))
            .cast("double"),
        )
    ).unionByName(
        orders.filter(F.col("o_orderkey") % 97 == 0)
        .withColumn("o_orderkey", -F.col("o_orderkey"))
        .withColumn("o_orderstatus", F.lit("I"))
    )
    merged = merge.upsert(orders, updates.select(orders.columns), ["o_orderkey"])
    return merged.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(12,2)")).cast("double").alias("total"),
    )

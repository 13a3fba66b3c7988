"""Round-13 gates: deterministic three-way split and token-drift.

p20 gates ``operators/sampling.py:train_val_test_split`` — the exact-id
holdout assignment (p11 covers the leakage-aware cluster variant). The
report aggregates per (lang, split) with exact-integer evidence
(count + id sum), so a single document landing on the wrong side of a
bucket threshold hash-mismatches.

t28 gates ``operators/textstats.py:token_drift``. The oracle mirrors
the exact integer cross-multiplication ranking — DuckDB's BIGINT sums
widen to HUGEINT in the products (and ``sum(BIGINT)`` itself returns
HUGEINT), so per the registry portability rule (registry.py:17 — the
r3 p04 / r13 p20+t28 failure mode) every HUGEINT-producing column is
CAST back to BIGINT; the values are exact integers far below 2^63 at
gate SFs, so the cast is lossless and the driver's type-sensitive
value hash matches Spark's long. ``cnt`` is referenced twice ->
AS MATERIALIZED per the duckdb-1.0 CTE discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import sampling, textstats
from ..tables import load_table
from .pipeline import _bucket_sql
from .registry import register

_P20_SEED = "sp0"
_P20_TRAIN = 0.8
_P20_VAL = 0.1
_P20_T1 = int(_P20_TRAIN * sampling.BUCKETS)
_P20_T2 = int((_P20_TRAIN + _P20_VAL) * sampling.BUCKETS)


@register(
    "p20_train_val_test_split",
    oracle=f"""
    SELECT lang, split,
           count(*) AS n_docs,
           CAST(sum(doc_id) AS BIGINT) AS id_sum
    FROM (
      SELECT lang, doc_id,
             CASE WHEN {_bucket_sql(_P20_SEED, "doc_id")} < {_P20_T1} THEN 'train'
                  WHEN {_bucket_sql(_P20_SEED, "doc_id")} < {_P20_T2} THEN 'val'
                  ELSE 'test' END AS split
      FROM documents)
    GROUP BY lang, split
    """,
)
def p20_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, split) report of the deterministic 80/10/10 holdout
    assignment. Exact-integer columns only: a document crossing a
    bucket threshold changes id_sum, not just a float rate."""
    docs = load_table(spark, sf_dir, "documents")
    out = sampling.train_val_test_split(
        docs, "doc_id", train=_P20_TRAIN, val=_P20_VAL, seed=_P20_SEED
    )
    return out.groupBy("lang", "split").agg(
        F.count("*").alias("n_docs"),
        F.sum("doc_id").alias("id_sum"),
    )


@register(
    "t28_token_drift",
    oracle="""
    WITH cnt AS MATERIALIZED (
      SELECT tok,
             CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a,
             CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cnt_b
      FROM (SELECT doc_id % 2 AS half,
                   unnest(string_split(lower(text), ' ')) AS tok
            FROM documents)
      GROUP BY tok),
    tot AS (SELECT sum(cnt_a) AS ta, sum(cnt_b) AS tb FROM cnt)
    SELECT tok, cnt_a, cnt_b,
           CAST(abs(cnt_a * tb - cnt_b * ta) AS BIGINT) AS diff_num
    FROM cnt, tot
    ORDER BY diff_num DESC, tok
    LIMIT 50
    """,
)
def t28_token_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 drifted tokens between even- and odd-id documents, ranked
    by the exact integer cross-multiplication (see operator docstring —
    the cut is bit-deterministic, no float boundary)."""
    return textstats.token_drift(load_table(spark, sf_dir, "documents"))

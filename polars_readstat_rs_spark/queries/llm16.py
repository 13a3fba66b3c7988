"""Round-14 gates: per-doc token entropy and the binary-payload dedup
manifest.

t29 gates ``operators/textstats.py:token_entropy`` — the
information-density quality screen. n_tokens/n_distinct are exact
longs; entropy_bits is float, computed with the SAME stable formula
``(ln(n) - sum(c*ln(c))/n) / ln(2)`` in both engines and rounded to
6 dp (the repo's cross-engine float rule: round(x*1e6)/1e6-class
rounding absorbs 1-ulp libm divergence).

m16 gates ``operators/multimodal.py:payload_dedup_manifest`` — the
decode-free container-dedup plan over binary payloads (keep lowest
doc_id per checksum, per-source byte accounting). All oracle sums are
CAST to BIGINT per the registry HUGEINT rule (registry.py:17); ``p``
is referenced twice -> AS MATERIALIZED per the duckdb-1.0 CTE
discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import multimodal, textstats
from ..tables import load_table
from .registry import register


@register(
    "t29_token_entropy",
    oracle="""
    WITH t AS MATERIALIZED (
      SELECT doc_id, lang, unnest(string_split(lower(text), ' ')) AS tok
      FROM documents),
    c AS MATERIALIZED (
      SELECT doc_id, lang, tok, count(*) AS c FROM t GROUP BY doc_id, lang, tok)
    SELECT doc_id, lang,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           count(*) AS n_distinct,
           round((ln(CAST(sum(c) AS DOUBLE))
                  - sum(c * ln(CAST(c AS DOUBLE))) / CAST(sum(c) AS DOUBLE))
                 / ln(2), 6) AS entropy_bits
    FROM c GROUP BY doc_id, lang
    """,
)
def t29_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc token Shannon entropy in bits (see operator docstring
    for the exactness discipline and single-pass scale shape)."""
    return textstats.token_entropy(load_table(spark, sf_dir, "documents"))


@register(
    "m16_payload_dedup_manifest",
    oracle="""
    WITH p AS MATERIALIZED (
      SELECT doc_id, source, md5(text) AS checksum,
             octet_length(encode(text)) AS n_bytes
      FROM documents),
    k AS (SELECT checksum, min(doc_id) AS keep_id FROM p GROUP BY checksum)
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN doc_id = keep_id THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN doc_id = keep_id THEN 0 ELSE n_bytes END) AS BIGINT) AS bytes_dropped,
           CAST(sum(CASE WHEN doc_id = keep_id THEN doc_id ELSE 0 END) AS BIGINT) AS kept_id_sum
    FROM p JOIN k USING (checksum)
    GROUP BY source
    """,
)
def m16_payload_dedup_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact container-level dedup plan over the synthesized binary
    payload column (m01's attach_payload shape), per-source byte
    accounting; single-shuffle window-min keep assignment."""
    docs = load_table(spark, sf_dir, "documents")
    return multimodal.payload_dedup_manifest(
        multimodal.attach_payload(docs, keep_cols=["source"])
    )


@register(
    "d22_quality_keep_dedup",
    oracle="""
    SELECT doc_id, lang, n_chars
    FROM (
      SELECT doc_id, lang, n_chars,
             row_number() OVER (
               PARTITION BY md5(text)
               ORDER BY n_chars DESC, doc_id) AS rn
      FROM documents)
    WHERE rn = 1
    """,
)
def d22_quality_keep_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware exact dedup (keep the best copy per duplicate
    cluster, not the first) — see operator docstring for the
    map-side-fingerprint single-exchange shape."""
    from ..operators import dedup

    docs = load_table(spark, sf_dir, "documents")
    return dedup.quality_keep_dedup(docs, keep_cols=["lang"]).select(
        "doc_id", "lang", "n_chars"
    )

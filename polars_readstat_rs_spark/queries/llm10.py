"""Round-10 additions.

d19 quantifies the simhash band-width trade (r9 verdict item 6): fixed
16-bit bands give the Hamming<=3 pigeonhole guarantee but their 65,536
buckets per band saturate on large corpora (the r9 sf10 census measured
283M candidate pairs, max bucket 3,097 docs), so candidate volume grows
superlinearly in corpus size. ``band_bits=32`` subdivides the key space
2^16x further — the corpus-scale shape — at the cost of probabilistic
recall above Hamming 1. This gate emits the measured recall curve so a
100 TB run can size the trade before committing.

Determinism: every column is either an exact BIGINT pair count or one
correctly-rounded IEEE division of two BIGINTs — bit-identical
cross-engine (the p14/t24 discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup
from ..tables import load_table
from .llm import _simhash_ctes
from .registry import register


def _band_pairs_sql(bands_cte: str, tag: str) -> str:
    """DuckDB candidate-pair count for one banding scheme: band-equality
    candidates, Hamming<=3 verify over the full 64-bit fingerprint —
    the d05 oracle shape with the band table swapped."""
    return f"""
    cand{tag} AS (
      SELECT DISTINCT x.doc AS a_id, y.doc AS b_id
      FROM {bands_cte} x JOIN {bands_cte} y
        ON x.band_idx = y.band_idx AND x.band_val = y.band_val AND x.doc < y.doc),
    n{tag} AS (
      SELECT CAST(count(*) AS BIGINT) AS c FROM (
        SELECT c.a_id FROM cand{tag} c
        JOIN fp fa ON c.a_id = fa.doc JOIN fp fb ON c.b_id = fb.doc
        WHERE bit_count(xor(fa.b0, fb.b0)) + bit_count(xor(fa.b1, fb.b1))
            + bit_count(xor(fa.b2, fb.b2)) + bit_count(xor(fa.b3, fb.b3)) <= 3))
    """


@register(
    "d19_band_width_recall",
    oracle=f"""
    WITH {_simhash_ctes()},
    bands16 AS (
      SELECT doc, 0 AS band_idx, CAST(b0 AS BIGINT) AS band_val FROM fp
      UNION ALL SELECT doc, 1, CAST(b1 AS BIGINT) FROM fp
      UNION ALL SELECT doc, 2, CAST(b2 AS BIGINT) FROM fp
      UNION ALL SELECT doc, 3, CAST(b3 AS BIGINT) FROM fp),
    bands32 AS (
      SELECT doc, 0 AS band_idx,
             CAST(b0 AS BIGINT) + CAST(b1 AS BIGINT) * 65536 AS band_val FROM fp
      UNION ALL SELECT doc, 1,
             CAST(b2 AS BIGINT) + CAST(b3 AS BIGINT) * 65536 FROM fp),
    {_band_pairs_sql('bands16', '16')},
    {_band_pairs_sql('bands32', '32')}
    SELECT 16 AS band_bits, 4 AS n_bands, n16.c AS n_pairs, n16.c AS n_truth,
           CAST(n16.c AS DOUBLE) / CAST(n16.c AS DOUBLE) AS recall FROM n16
    UNION ALL
    SELECT 32, 2, n32.c, n16.c,
           CAST(n32.c AS DOUBLE) / CAST(n16.c AS DOUBLE) FROM n32, n16
    """,
)
def d19_band_width_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall of wider simhash LSH bands against the 16-bit-band ground
    truth (operators/dedup.py:simhash_pairs band_bits option). 16-bit
    bands are complete for Hamming<=3 by pigeonhole (4 bands), so their
    uncapped pair set IS the truth; 32-bit bands (2^32 buckets each —
    the corpus-scale key space) catch a Hamming 2-3 pair only when all
    differing bits fall in one band. Both sides run uncapped so the
    oracle can enumerate identically; recall is one exact division of
    two BIGINT counts."""
    docs = load_table(spark, sf_dir, "documents")
    truth = dedup.simhash_pairs(
        docs, "doc_id", "text", max_hamming=3, max_bucket=None, band_bits=16
    )
    wide = dedup.simhash_pairs(
        docs, "doc_id", "text", max_hamming=3, max_bucket=None, band_bits=32
    )
    # 1-row bounded aggs, eagerly cut so the union's two references
    # don't re-run the band joins (the v17/g05 lineage discipline)
    t = truth.agg(F.count(F.lit(1)).cast("bigint").alias("n_truth")).localCheckpoint()
    w = wide.agg(F.count(F.lit(1)).cast("bigint").alias("n_wide")).localCheckpoint()
    row16 = t.select(
        F.lit(16).alias("band_bits"),
        F.lit(4).alias("n_bands"),
        F.col("n_truth").alias("n_pairs"),
        F.col("n_truth"),
        (F.col("n_truth").cast("double") / F.col("n_truth").cast("double")).alias("recall"),
    )
    row32 = w.crossJoin(t).select(
        F.lit(32).alias("band_bits"),
        F.lit(2).alias("n_bands"),
        F.col("n_wide").alias("n_pairs"),
        F.col("n_truth"),
        (F.col("n_wide").cast("double") / F.col("n_truth").cast("double")).alias("recall"),
    )
    return row16.unionByName(row32)

"""Round-11 third wave: table-maintenance and index-maintenance gates.

p18 gates the small-file COMPACTION PLANNER
(operators/maintenance.py:compaction_plan) — the OPTIMIZE-shaped pass
a 100 TB partitioned table needs periodically.  The manifest is
synthesized deterministically from the part table (a Knuth-hash pseudo
size per file), so both engines plan over identical inputs; the plan
itself — eligibility, size-descending boundary (next-fit) bin packing,
zero-benefit-job suppression, per-job byte totals and manifests — is
the value under test.  A wrong pack order, boundary, eligibility, or
benefit rule changes the output and hash-mismatches immediately.

v23 gates the IVF INDEX-HEALTH report
(operators/similarity.py:ivf_cell_stats) over the PRODUCTION k-means
assignment (the same deterministic two-Lloyd-iteration clustering v04
gates, so the oracle shares v04's _km_chain CTE prelude): per-cell
population/share, the global imbalance factor (the probe tail-latency
multiplier), and split/merge triggers.  v08 gates appending to an IVF
index; this gates knowing WHEN the index needs rebuilding — together
they close the index-maintenance loop.

d21 and t26 gate the sketch SIZING curves — Bloom measured vs
closed-form false-positive rate per filter width
(operators/dedup.py:bloom_fp_curve, sizing d17's ingest screen) and
count-min measured overcount vs the N/m bound per counter width
(operators/textstats.py:cms_width_curve, sizing t23's sketch and s12's
bounded stream state) — completing the sizing family next to the LSH
band curves (d19/d20) and the ANN index knobs (v17/v18/v21).

Determinism: counts and byte sums are exact integers; shares and
imbalance are single correctly-rounded IEEE divisions with identical
operand shapes on both engines; trigger comparisons use the same
double mean both engines derive from the same integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup, maintenance, similarity, textstats
from ..tables import load_table
from .registry import register

# ---------------------------------------------------------------- p18

_P18_MULT = 2654435761  # Knuth multiplicative hash — spreads sizes uniformly
_P18_MOD = 67108864  # 64 MiB size range
_P18_SMALL = 16777216  # 16 MiB small-file threshold
_P18_TARGET = 33554432  # 32 MiB compaction target


@register(
    "p18_compaction_plan",
    oracle=f"""
    WITH files AS (
      SELECT p_brand AS part, CAST(p_partkey AS BIGINT) AS file_id,
             CAST((p_partkey * {_P18_MULT}) % {_P18_MOD} + 1024 AS BIGINT) AS size_bytes
      FROM part),
    small AS (SELECT * FROM files WHERE size_bytes < {_P18_SMALL}),
    eligible AS (SELECT part FROM small GROUP BY part HAVING count(*) >= 2),
    cand AS (SELECT s.* FROM small s JOIN eligible e USING (part)),
    packed AS (
      SELECT part, file_id, size_bytes,
             sum(size_bytes) OVER (PARTITION BY part
               ORDER BY size_bytes DESC, file_id
               ROWS UNBOUNDED PRECEDING) AS _cum
      FROM cand),
    jobs AS (
      SELECT part, file_id, size_bytes,
             CAST((_cum - size_bytes) // {_P18_TARGET} AS INT) AS job_idx
      FROM packed)
    SELECT part, job_idx,
           CAST(count(*) AS INT) AS n_files,
           CAST(sum(size_bytes) AS BIGINT) AS input_bytes,
           CAST(greatest(1, ceil(sum(size_bytes) / CAST({_P18_TARGET} AS DOUBLE))) AS INT)
             AS est_output_files,
           CAST(count(*) - greatest(1, ceil(sum(size_bytes) / CAST({_P18_TARGET} AS DOUBLE))) AS INT)
             AS files_removed,
           string_agg(CAST(file_id AS VARCHAR), ',' ORDER BY size_bytes DESC, file_id)
             AS file_manifest
    FROM jobs GROUP BY part, job_idx
    HAVING count(*) - greatest(1, ceil(sum(size_bytes) / CAST({_P18_TARGET} AS DOUBLE))) >= 1
    """,
)
def p18_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planning over a synthesized-but-shared
    file manifest: partitions with >= 2 sub-16 MiB files get their small
    files packed (size DESC, cumulative-sum boundary bins) into 32 MiB
    jobs, and jobs that would not shrink the file count are suppressed;
    one row per job with exact byte totals, the expected output-file
    count, the net file reduction, and the ordered input manifest. One
    exchange on the partition key serves eligibility count, packing
    window, and job aggregate."""
    part = load_table(spark, sf_dir, "part")
    files = part.select(
        F.col("p_brand").alias("part"),
        F.col("p_partkey").cast("long").alias("file_id"),
        (
            (F.col("p_partkey").cast("long") * F.lit(_P18_MULT)) % F.lit(_P18_MOD)
            + F.lit(1024)
        ).alias("size_bytes"),
    )
    return maintenance.compaction_plan(
        files,
        part_col="part",
        file_col="file_id",
        size_col="size_bytes",
        target_bytes=_P18_TARGET,
        small_threshold=_P18_SMALL,
    )


# ---------------------------------------------------------------- v23


def _v23_oracle() -> str:
    from .llm import _km_chain

    return f"""
    WITH {_km_chain(8)},
    cells AS (
      SELECT cell, CAST(count(*) AS BIGINT) AS n_vecs FROM af GROUP BY cell),
    g AS (
      SELECT CAST(sum(n_vecs) AS BIGINT) AS total,
             CAST(count(*) AS BIGINT) AS ncells,
             CAST(max(n_vecs) AS BIGINT) AS max_n
      FROM cells)
    SELECT c.cell, c.n_vecs,
           round(CAST(c.n_vecs AS DOUBLE) / CAST(g.total AS DOUBLE), 6) AS share,
           round(CAST(g.max_n AS DOUBLE)
                 / (CAST(g.total AS DOUBLE) / CAST(g.ncells AS DOUBLE)), 6) AS imbalance,
           CAST(c.n_vecs AS DOUBLE)
             > 1.5 * (CAST(g.total AS DOUBLE) / CAST(g.ncells AS DOUBLE)) AS needs_split,
           CAST(c.n_vecs AS DOUBLE)
             < 0.5 * (CAST(g.total AS DOUBLE) / CAST(g.ncells AS DOUBLE)) AS needs_merge
    FROM cells c CROSS JOIN g
    """


@register("v23_ivf_balance", oracle=_v23_oracle())
def v23_ivf_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index-health report over the deterministic k-means
    assignment v04 gates (same init, same two Lloyd iterations, same
    fold order — the oracle nests v04's CTE chain): per-cell population
    and corpus share, the global max/mean imbalance factor, and
    split/merge triggers at 1.5x / 0.5x the mean cell population. The
    roll-up is O(ncells) state broadcast back over the per-cell counts,
    so the report costs one corpus scan at any corpus size."""
    emb = load_table(spark, sf_dir, "embeddings")
    assigned, _cents = similarity.kmeans_cells(emb, ncells=8, iters=2)
    return similarity.ivf_cell_stats(
        assigned, cell_col="cell", split_factor=1.5, merge_factor=0.5
    )


# ---------------------------------------------------------------- d21

_D21_MS = (1024, 4096, 16384)
_D21_K = 3


def _d21_pos_sql(j: int, m: int) -> str:
    return f"CAST(('0x' || substr(md5('bloom{j}:' || fp), 1, 8)) AS BIGINT) % {m}"


def _d21_m_sql(m: int) -> str:
    """One curve row: bit-table size + measured/theoretical FP at width m."""
    bits_union = " UNION ALL ".join(
        f"SELECT {_d21_pos_sql(j, m)} AS bit FROM hist" for j in range(_D21_K)
    )
    probe_union = " UNION ALL ".join(
        f"SELECT doc_id, {_d21_pos_sql(j, m)} AS bit FROM inc" for j in range(_D21_K)
    )
    fill = f"(CAST(b.bits_set AS DOUBLE) / {m})"
    # left-to-right multiply chain generated from _D21_K, mirroring the
    # Spark loop in dedup.bloom_fp_curve — retuning k cannot desync it
    theo = fill
    for _ in range(_D21_K - 1):
        theo = f"({theo} * {fill})"
    return f"""
    SELECT CAST({m} AS INT) AS m_bits,
           CAST(b.bits_set AS BIGINT) AS bits_set,
           round({fill}, 6) AS fill,
           round({theo}, 6) AS theo_fp,
           s.n_incoming, s.n_exact_dup, s.n_bloom_hit, s.n_false_pos,
           round(CASE WHEN s.n_incoming - s.n_exact_dup > 0
                 THEN CAST(s.n_false_pos AS DOUBLE)
                      / (s.n_incoming - s.n_exact_dup) END, 6) AS fp_rate
    FROM
      (SELECT count(*) AS bits_set
       FROM (SELECT DISTINCT bit FROM ({bits_union}))) b
    CROSS JOIN
      (SELECT CAST(count(*) AS BIGINT) AS n_incoming,
              CAST(sum(CASE WHEN exact_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_dup,
              CAST(sum(CASE WHEN bloom_hit THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_hit,
              CAST(sum(CASE WHEN false_positive THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos
       FROM (
         SELECT h.bloom_hit,
                coalesce(e.exact_dup, FALSE) AS exact_dup,
                (h.bloom_hit AND NOT coalesce(e.exact_dup, FALSE)) AS false_positive
         FROM (
           SELECT p.doc_id, count(bt.bit) = {_D21_K} AS bloom_hit
           FROM ({probe_union}) p
           LEFT JOIN (SELECT DISTINCT bit FROM ({bits_union})) bt USING (bit)
           GROUP BY p.doc_id) h
         LEFT JOIN exactset e USING (doc_id))) s
    """


@register(
    "d21_bloom_fp_curve",
    oracle=f"""
    WITH fps AS MATERIALIZED (SELECT doc_id, md5(text) AS fp FROM documents),
    hist AS MATERIALIZED (SELECT * FROM fps WHERE doc_id % 3 != 0),
    inc AS MATERIALIZED (SELECT * FROM fps WHERE doc_id % 3 = 0),
    exactset AS MATERIALIZED (
      SELECT DISTINCT i.doc_id, TRUE AS exact_dup
      FROM inc i JOIN hist h ON i.fp = h.fp)
    {" UNION ALL ".join(_d21_m_sql(m) for m in _D21_MS)}
    """,
)
def d21_bloom_fp_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter SIZING curve (operators/dedup.py:bloom_fp_curve):
    measured vs closed-form false-positive rate per filter width m —
    the memory-vs-pollution table that sizes d17's ingest screen, the
    sketch sibling of the LSH band curves (d19/d20) and the ANN index
    knobs (v17/v18/v21). Same history/incoming split as d17; bits_set,
    fill, theo_fp = fill^k (exact IEEE multiplies, never libm pow),
    and the NULL-guarded measured rate are all value-pinned per width."""
    docs = load_table(spark, sf_dir, "documents")
    history = docs.filter(F.col("doc_id") % 3 != 0)
    incoming = docs.filter(F.col("doc_id") % 3 == 0)
    return dedup.bloom_fp_curve(
        history, incoming, "doc_id", "text", m_list=_D21_MS, k=_D21_K
    )


# ---------------------------------------------------------------- t26

_T26_WS = (256, 1024, 4096)
_T26_K = 3
_T26_TOP = 20


def _t26_bucket_sql(j: int, m: int) -> str:
    return f"CAST(('0x' || substr(md5('cms{j}:' || tok), 1, 8)) AS BIGINT) % {m}"


def _t26_w_sql(m: int) -> str:
    """One curve row: measured vs N/m-bound overcount at width m."""
    cells_union = " UNION ALL ".join(
        f"SELECT {j} AS row, {_t26_bucket_sql(j, m)} AS bucket FROM toks"
        for j in range(_T26_K)
    )
    probe_union = " UNION ALL ".join(
        f"SELECT tok, exact_n, {j} AS row, {_t26_bucket_sql(j, m)} AS bucket FROM exact"
        for j in range(_T26_K)
    )
    return f"""
    SELECT CAST({m} AS INT) AS m_buckets,
           t.total_tokens,
           CAST(count(*) AS INT) AS n_probed,
           CAST(sum(p.exact_n) AS BIGINT) AS sum_exact,
           CAST(sum(p.est) AS BIGINT) AS sum_est,
           CAST(max(p.est - p.exact_n) AS BIGINT) AS max_overcount,
           round(CAST(sum(p.est - p.exact_n) AS DOUBLE) / count(*), 6) AS mean_overcount,
           round(CAST(t.total_tokens AS DOUBLE) / {m}, 6) AS bound_n_over_m,
           round(CAST(sum(CASE WHEN (p.est - p.exact_n) * {m} <= 2 * t.total_tokens
                          THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6)
             AS within_2bound_frac
    FROM (
      SELECT pr.tok, pr.exact_n, CAST(min(c.n) AS BIGINT) AS est
      FROM ({probe_union}) pr
      JOIN (SELECT row, bucket, CAST(count(*) AS BIGINT) AS n
            FROM ({cells_union}) GROUP BY row, bucket) c
      USING (row, bucket)
      GROUP BY pr.tok, pr.exact_n) p
    CROSS JOIN tot t
    GROUP BY t.total_tokens
    """


@register(
    "t26_cms_width_curve",
    oracle=f"""
    WITH toks AS MATERIALIZED (
      SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents),
    exact AS MATERIALIZED (
      SELECT tok, CAST(count(*) AS BIGINT) AS exact_n FROM toks GROUP BY tok
      ORDER BY exact_n DESC, tok LIMIT {_T26_TOP}),
    tot AS MATERIALIZED (
      SELECT CAST(count(*) AS BIGINT) AS total_tokens FROM toks)
    {" UNION ALL ".join(_t26_w_sql(m) for m in _T26_WS)}
    """,
)
def t26_cms_width_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch SIZING curve (operators/textstats.py:
    cms_width_curve): measured heavy-hitter overcount (sum/max/mean)
    per counter width next to the classic N/m bound, with the
    within-2N/m fraction compared in EXACT integers — the
    memory-vs-error table that sizes t23's sketch and s12's bounded
    stream state, completing the sketch-sizing family (Bloom d21, LSH
    d19/d20, ANN v17/v18/v21)."""
    docs = load_table(spark, sf_dir, "documents")
    return textstats.cms_width_curve(
        docs, "text", widths=_T26_WS, k_rows=_T26_K, top_n=_T26_TOP
    )


# ---------------------------------------------------------------- t27

_T27_KS = (16, 64, 256, 1024)


def _t27_k_sql(k: int) -> str:
    """One curve row: the KMV estimate and relative error at sketch size k."""
    est = f"{float(k - 1)!r} * 4294967296.0 / CAST(kth.h_k AS DOUBLE)"
    val = f"CASE WHEN kth._n < {k} THEN CAST(exact_ndv AS DOUBLE) ELSE {est} END"
    return f"""
    SELECT CAST({k} AS INT) AS k, exact_ndv,
           {val} AS kmv_est,
           abs({val} - CAST(exact_ndv AS DOUBLE)) / CAST(exact_ndv AS DOUBLE)
             AS rel_err
    FROM exact, (
      SELECT max(h) AS h_k, CAST(count(*) AS BIGINT) AS _n
      FROM (SELECT h FROM hashes ORDER BY h LIMIT {k})) kth
    """


@register(
    "t27_kmv_k_curve",
    oracle=f"""
    WITH toks AS MATERIALIZED (
      SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents),
    hashes AS MATERIALIZED (
      SELECT DISTINCT CAST(('0x' || substr(md5('kmv:' || tok), 1, 8)) AS BIGINT) AS h
      FROM toks),
    exact AS MATERIALIZED (
      SELECT CAST(count(DISTINCT tok) AS BIGINT) AS exact_ndv FROM toks)
    {" UNION ALL ".join(_t27_k_sql(k) for k in _T27_KS)}
    """,
)
def t27_kmv_k_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sizing curve (operators/textstats.py:kmv_k_curve): the NDV
    estimate and relative error per sketch size k, value-pinning the
    1/sqrt(k) accuracy trade the sketch theory promises — including the
    saturation row where k >= true NDV degenerates to the exact set.
    One distinct-hash pass serves every k; with d21 (Bloom), t26 (CMS),
    d19/d20 (LSH), and v17/v18/v21 (ANN), every sketch and index in the
    engine now ships with a measured sizing curve."""
    docs = load_table(spark, sf_dir, "documents")
    return textstats.kmv_k_curve(docs, "text", ks=_T27_KS)

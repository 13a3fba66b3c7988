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
from .registry import ORACLES, register


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
           CASE WHEN n16.c = 0 THEN NULL
                ELSE CAST(n16.c AS DOUBLE) / CAST(n16.c AS DOUBLE) END AS recall
    FROM n16
    UNION ALL
    SELECT 32, 2, n32.c, n16.c,
           CASE WHEN n16.c = 0 THEN NULL
                ELSE CAST(n32.c AS DOUBLE) / CAST(n16.c AS DOUBLE) END
    FROM n32, n16
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
    # one fingerprint pass feeds both band shapes (the corpus-wide
    # simhash computation dominates the gate; both calls share it)
    fps = dedup.simhash(docs, "doc_id", "text").persist()
    truth = dedup.simhash_pairs(
        docs, "doc_id", "text", max_hamming=3, max_bucket=None, band_bits=16, _fps=fps
    )
    wide = dedup.simhash_pairs(
        docs, "doc_id", "text", max_hamming=3, max_bucket=None, band_bits=32, _fps=fps
    )
    # 1-row bounded aggs, eagerly cut so the union's two references
    # don't re-run the band joins (the v17/g05 lineage discipline)
    t = truth.agg(F.count(F.lit(1)).cast("bigint").alias("n_truth")).localCheckpoint()
    w = wide.agg(F.count(F.lit(1)).cast("bigint").alias("n_wide")).localCheckpoint()
    # zero-truth guard: NULL (both engines) instead of Spark-NULL-vs-
    # DuckDB-NaN on x/0 — degenerate fixtures fail informatively
    row16 = t.select(
        F.lit(16).alias("band_bits"),
        F.lit(4).alias("n_bands"),
        F.col("n_truth").alias("n_pairs"),
        F.col("n_truth"),
        F.when(
            F.col("n_truth") > 0,
            F.col("n_truth").cast("double") / F.col("n_truth").cast("double"),
        ).alias("recall"),
    )
    row32 = w.crossJoin(t).select(
        F.lit(32).alias("band_bits"),
        F.lit(2).alias("n_bands"),
        F.col("n_wide").alias("n_pairs"),
        F.col("n_truth"),
        F.when(
            F.col("n_truth") > 0,
            F.col("n_wide").cast("double") / F.col("n_truth").cast("double"),
        ).alias("recall"),
    )
    return row16.unionByName(row32)


# ------------------------------------------------- q91 SQL pipe syntax


@register(
    "q91_sql_pipe",
    oracle="""
    WITH c AS (
      SELECT l_returnflag, l_linestatus,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
             CAST(round(l_discount * 100) AS BIGINT) AS dc
      FROM lineitem WHERE l_quantity < 25)
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           CAST(sum(pc * (100 - dc)) AS BIGINT) AS rev_c4,
           min(pc) AS min_pc, max(pc) AS max_pc
    FROM c GROUP BY l_returnflag, l_linestatus
    """,
)
def q91_sql_pipe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL pipe syntax (FROM ... |> WHERE |> EXTEND
    |> AGGREGATE ... GROUP BY): the pipeline form parses into the SAME
    logical plan as the nested-CTE formulation — no new execution nodes
    — so the gate pins that the pipe surface resolves, composes with
    the integer-cents discipline (all BIGINT arithmetic, q89's
    pattern), and aggregates bit-identically to the plain-SQL oracle."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("q91_lineitem")
    return spark.sql(
        """
        FROM q91_lineitem
        |> WHERE l_quantity < 25
        |> EXTEND CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
                  CAST(round(l_discount * 100) AS BIGINT) AS dc
        |> AGGREGATE count(*) AS n,
                     sum(pc * (100 - dc)) AS rev_c4,
                     min(pc) AS min_pc, max(pc) AS max_pc
           GROUP BY l_returnflag, l_linestatus
        """
    )


# ------------------------------------------------- s12 streaming count-min

_S12_TOP = 20


@register("s12_stream_cms", oracle=None)
def s12_stream_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The t23 count-min sketch in STREAMING form: documents arrive as
    a file stream, each micro-batch explodes to (row, bucket) cell
    increments, and a streaming aggregation maintains the k x m counter
    table — the sketch's shard-mergeability IS Spark's partial-agg
    merge, so stream state is bounded at k*m cells no matter how many
    documents flow through (the production incremental-ingest shape;
    contrast dropDuplicates' per-key unbounded store). After the drain,
    the exact top-N heavy hitters probe the drained cell table and the
    output hash-matches t23's batch oracle exactly (same md5-derived
    buckets)."""
    from ..streaming.windows import docs_stream

    k_rows, m_buckets = 3, 4096
    stream = docs_stream(spark, sf_dir)
    tok = F.explode(F.split(F.lower(F.col("text")), " ")).alias("tok")
    toks = stream.select(tok)
    cells = None
    rows = []
    for j in range(k_rows):
        rows.append(
            toks.select(
                F.lit(j).alias("row"),
                (
                    F.conv(
                        F.substring(F.md5(F.concat(F.lit(f"cms{j}:"), F.col("tok"))), 1, 8),
                        16,
                        10,
                    ).cast("bigint")
                    % m_buckets
                ).alias("bucket"),
            )
        )
    cells = rows[0]
    for r in rows[1:]:
        cells = cells.unionByName(r)
    agg = cells.groupBy("row", "bucket").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    name = "s12_cells"
    q = agg.writeStream.outputMode("complete").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    drained = spark.table(name)

    # batch-side audit: exact heavy hitters probe the DRAINED cells
    docs = load_table(spark, sf_dir, "documents")
    btoks = docs.select(F.explode(F.split(F.lower(F.col("text")), " ")).alias("tok"))
    exact = (
        btoks.groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_n"))
        .orderBy(F.desc("exact_n"), F.asc("tok"))
        .limit(_S12_TOP)
    )
    probes = None
    for j in range(k_rows):
        p = exact.select(
            "tok",
            "exact_n",
            F.lit(j).alias("row"),
            (
                F.conv(
                    F.substring(F.md5(F.concat(F.lit(f"cms{j}:"), F.col("tok"))), 1, 8),
                    16,
                    10,
                ).cast("bigint")
                % m_buckets
            ).alias("bucket"),
        )
        probes = p if probes is None else probes.unionByName(p)
    return (
        probes.join(drained, ["row", "bucket"])
        .groupBy("tok", "exact_n")
        .agg(
            F.min("n").cast("bigint").alias("cms_est"),
            (F.min("n") >= F.col("exact_n")).alias("overestimate_ok"),
        )
    )


# s12 drains the identical k x m md5-derived cell table t23 builds in
# batch, so its oracle IS t23's (registered after both exist to avoid
# import-order coupling).
ORACLES["s12_stream_cms"] = ORACLES["t23_cms_token_freq"]


# ------------------------------------------------- d20 LSH (b, r) curve

_D20_CONFIGS = ((8, 1), (4, 2), (2, 4))
_D20_T = 0.2


def _d20_cand_count_sql(bands: int, rows: int, tag: str) -> str:
    """Per-config DuckDB candidate set + found-count over the exact
    truth pairs — the _minhash_oracle band CTE parameterized by shape."""
    band_selects = []
    for b in range(bands):
        hs = [f"h{b * rows + r}" for r in range(rows)]
        key = " || '|' || ".join(hs)
        band_selects.append(f"SELECT doc, {b} AS band_idx, md5({key}) AS band_key FROM sig")
    bands_sql = " UNION ALL ".join(band_selects)
    return f"""
    bands{tag} AS ({bands_sql}),
    cand{tag} AS (
      SELECT DISTINCT x.doc AS a_id, y.doc AS b_id
      FROM bands{tag} x JOIN bands{tag} y
        ON x.band_idx = y.band_idx AND x.band_key = y.band_key AND x.doc < y.doc),
    found{tag} AS (
      SELECT CAST(count(*) AS BIGINT) AS c
      FROM ex JOIN cand{tag} c ON ex.a_id = c.a_id AND ex.b_id = c.b_id)
    """


def _d20_oracle() -> str:
    from ..operators import dedup as _d

    sig_cols = ", ".join(
        f"min(substring(sha256(sh), {1 + 8 * i}, 8)) AS h{i}" for i in range(_d.NUM_HASHES)
    )
    cfg_ctes = ",".join(
        _d20_cand_count_sql(b, r, f"_{b}x{r}") for b, r in _D20_CONFIGS
    )
    rows_sql = " UNION ALL ".join(
        f"SELECT {b} AS bands, {r} AS rows_per_band, t.c AS n_truth, "
        f"found_{b}x{r}.c AS n_found, "
        f"CASE WHEN t.c = 0 THEN NULL "
        f"ELSE CAST(found_{b}x{r}.c AS DOUBLE) / CAST(t.c AS DOUBLE) END AS recall "
        f"FROM found_{b}x{r}, t"
        for b, r in _D20_CONFIGS
    )
    from .llm import _sh_ctes

    return f"""
    WITH {_sh_ctes()},
    ex AS (SELECT a_id, b_id FROM (
      SELECT i.a_id, i.b_id,
             CAST(i.inter AS DOUBLE) / CAST(sa.sz + sb.sz - i.inter AS DOUBLE) AS jaccard
      FROM inter i JOIN sizes sa ON i.a_id = sa.doc JOIN sizes sb ON i.b_id = sb.doc)
      WHERE jaccard >= {_D20_T}),
    t AS (SELECT CAST(count(*) AS BIGINT) AS c FROM ex),
    sig AS (SELECT doc, {sig_cols} FROM (SELECT doc, sh FROM sh) GROUP BY doc),
    {cfg_ctes}
    {rows_sql}
    """


# ------------------------------------------------- v18 PQ m-curve

_V18_MS = (2, 4, 8)
_V18_KSUB = 8
_V18_K = 10


def _v18_pq_ctes(
    m: int,
    k: int = _V18_K,
    tag: str | None = None,
    keep_rank: bool = False,
    restrict_joins: str = "",
) -> tuple[str, str]:
    """Per-m PQ ADC candidate CTEs (the llm4 v07 oracle chain with a
    tag suffix): returns (ctes_sql, scored_cte_name). ``k`` is the ADC
    rank cutoff; ``keep_rank`` keeps the coarse rank column so a caller
    (v21's re-rank depth curve) can slice the SAME candidate chain at
    several depths without rebuilding the PQ CTEs per depth;
    ``restrict_joins`` appends extra JOIN clauses to the scoring FROM
    (v22's IVF probed-cell restriction) — they may reference a0
    (corpus codes, a0.vec_id) and l0 (query LUT, l0.q_id)."""
    from .llm import _DOTD
    from .llm4 import _assign, _update

    t = tag or f"m{m}"
    sub = 64 // m
    ctes = []
    for j in range(m):
        lo, hi = j * sub + 1, (j + 1) * sub
        ctes.append(
            f"v_{t}_{j} AS MATERIALIZED (SELECT vec_id, list_transform(embedding[{lo}:{hi}], "
            f"x -> CAST(x AS DOUBLE)) AS vec FROM embeddings)"
        )
        ctes.append(
            f"c0_{t}_{j} AS MATERIALIZED (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell, "
            f"vec AS centroid FROM (SELECT * FROM v_{t}_{j} ORDER BY vec_id LIMIT {_V18_KSUB}))"
        )
        ctes.append(f"a1_{t}_{j} AS MATERIALIZED ({_assign(f'v_{t}_{j}', f'c0_{t}_{j}')})")
        ctes.append(f"c1_{t}_{j} AS MATERIALIZED ({_update(f'a1_{t}_{j}')})")
        ctes.append(f"a2_{t}_{j} AS MATERIALIZED ({_assign(f'v_{t}_{j}', f'c1_{t}_{j}')})")
        ctes.append(f"c2_{t}_{j} AS MATERIALIZED ({_update(f'a2_{t}_{j}')})")
        ctes.append(f"af_{t}_{j} AS MATERIALIZED ({_assign(f'v_{t}_{j}', f'c2_{t}_{j}')})")
        dot = _DOTD.format(a="q.vec", b="c.centroid")
        ctes.append(
            f"lut_{t}_{j} AS MATERIALIZED (SELECT q.vec_id AS q_id, c.cell, {dot} AS part "
            f"FROM (SELECT vec_id, vec FROM v_{t}_{j} WHERE vec_id < 5) q CROSS JOIN c2_{t}_{j} c)"
        )
    code_joins = " ".join(
        f"JOIN af_{t}_{j} a{j} ON a0.vec_id = a{j}.vec_id" for j in range(1, m)
    )
    lut_joins = " ".join(
        f"JOIN lut_{t}_{j} l{j} ON l{j}.q_id = l0.q_id AND l{j}.cell = a{j}.cell"
        for j in range(1, m)
    )
    parts = " + ".join(f"l{j}.part" for j in range(m))
    out_cols = "q_id, vec_id, rank" if keep_rank else "q_id, vec_id"
    ctes.append(
        f"""scored_{t} AS MATERIALIZED (
      SELECT {out_cols} FROM (
        SELECT l0.q_id, a0.vec_id,
               CAST(row_number() OVER (PARTITION BY l0.q_id
                 ORDER BY {parts} DESC, a0.vec_id) AS INT) AS rank
        FROM af_{t}_0 a0 {code_joins}
        JOIN lut_{t}_0 l0 ON l0.cell = a0.cell {lut_joins} {restrict_joins}
        WHERE a0.vec_id <> l0.q_id) WHERE rank <= {k})"""
    )
    return ",\n    ".join(ctes), f"scored_{t}"


def _v18_oracle() -> str:
    from .registry import ORACLES as _O

    blocks, rows = [], []
    for m in _V18_MS:
        ctes, scored = _v18_pq_ctes(m)
        blocks.append(ctes)
        blocks.append(
            f"found_m{m} AS (SELECT CAST(count(*) AS BIGINT) AS c "
            f"FROM bf JOIN {scored} s ON bf.q_id = s.q_id AND bf.vec_id = s.vec_id)"
        )
        rows.append(
            f"SELECT {m} AS m, t.c AS n_truth, found_m{m}.c AS n_found, "
            f"CASE WHEN t.c = 0 THEN NULL "
            f"ELSE CAST(found_m{m}.c AS DOUBLE) / CAST(t.c AS DOUBLE) END AS recall "
            f"FROM found_m{m}, t"
        )
    return (
        f"WITH bf AS MATERIALIZED (SELECT q_id, vec_id FROM ({_O['v01_cosine_topk']})),\n"
        "    t AS (SELECT CAST(count(*) AS BIGINT) AS c FROM bf),\n    "
        + ",\n    ".join(blocks)
        + "\n    "
        + " UNION ALL ".join(rows)
    )


@register("v18_pq_m_curve", oracle=_v18_oracle())
def v18_pq_m_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of product-quantization ADC search per code size m
    (2/4/8 subquantizers over the 64-dim embeddings, m bytes per
    vector) against brute-force ground truth — the compression/recall
    sizing curve that completes the family: v17 sizes IVF's nprobe,
    d19/d20 size the LSH band shapes, this sizes PQ's m before a corpus
    commits to an ADC index. Ground truth is computed ONCE and
    localCheckpointed (the v17 discipline); each m reuses it. Counts
    are exact BIGINTs; recall is one correctly-rounded division."""
    from ..operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") < 5)
    truth = (
        similarity.brute_force_topk(emb, queries_df, k=_V18_K)
        .select("q_id", "vec_id")
        .localCheckpoint()
    )
    t = truth.agg(F.count(F.lit(1)).cast("bigint").alias("n_truth")).localCheckpoint()
    out = None
    for m in _V18_MS:
        approx = similarity.pq_topk(
            emb, queries_df, k=_V18_K, m=m, ksub=_V18_KSUB
        ).select("q_id", "vec_id")
        nf = (
            truth.join(approx, ["q_id", "vec_id"], "left_semi")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_found"))
            .localCheckpoint()
        )
        row = nf.crossJoin(t).select(
            F.lit(m).alias("m"),
            F.col("n_truth"),
            F.col("n_found"),
            F.when(
                F.col("n_truth") > 0,
                F.col("n_found").cast("double") / F.col("n_truth").cast("double"),
            ).alias("recall"),
        )
        out = row if out is None else out.unionByName(row)
    return out


# ------------------------------------------------- m14 media probe


@register(
    "m14_media_probe",
    oracle="""
    SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'wav' WHEN 1 THEN 'bmp' ELSE 'png' END
             AS detected_kind,
           CASE doc_id % 3 WHEN 0 THEN CAST(64 + doc_id % 32 AS INT)
                ELSE CAST(8 AS INT) END AS dim_a,
           CASE doc_id % 3 WHEN 0 THEN CAST(8000 AS INT)
                ELSE CAST(6 AS INT) END AS dim_b
    FROM documents
    """,
)
def m14_media_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode-free media triage (operators/multimodal.py:probe_media):
    magic-byte format sniffing + header-field extraction over a MIXED
    binary column (WAV/BMP/PNG payloads interleaved by doc_id % 3) as
    pure whole-stage-codegen binary expressions — no Python worker, no
    decompression; the O(header)-bytes-per-blob pass a 100 TB ingest
    runs before deciding what to decode. The payloads are REAL encoder
    output (RIFF chunks, BMP infoheader, PNG IHDR), and the oracle pins
    every probed field against the synthesis closed form — so a wrong
    endianness, offset, or magic test hash-mismatches immediately.
    (PNG byte length is compression-defined, so n_bytes stays an
    operator column, not a pinned one.)"""
    from ..operators import multimodal

    docs = load_table(spark, sf_dir, "documents")
    parts = None
    for m, kind in ((0, "wav"), (1, "bmp"), (2, "png")):
        p = multimodal.synth_media_payloads(
            docs.filter(F.col("doc_id") % 3 == m), kind=kind
        )
        parts = p if parts is None else parts.unionByName(p)
    return multimodal.probe_media(parts).select(
        "doc_id", "detected_kind", "dim_a", "dim_b"
    )


@register("d20_lsh_band_curve", oracle=_d20_oracle())
def d20_lsh_band_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall of each MinHash-LSH band shape (b bands x r rows over the
    same 8 signature chunks) against exact n-gram-Jaccard >= 0.2 ground
    truth — the (b, r) sizing curve (candidate probability at Jaccard s
    is 1 - (1 - s^r)^b): (8,1) maximizes recall, (2,4) sharpens the
    threshold. d14 pins the S-curve of the default shape per similarity
    decile; this gate pins the shape FAMILY so a 100 TB dedup run picks
    (b, r) from measured recall, not the formula alone. Counts are
    exact BIGINTs; recall is one correctly-rounded division."""
    from .llm import _SHINGLE_N

    docs = load_table(spark, sf_dir, "documents")
    truth = (
        dedup.ngram_jaccard_pairs(docs, "doc_id", "text", n=_SHINGLE_N, threshold=_D20_T)
        .select("a_id", "b_id")
        .localCheckpoint()  # bounded (exact >= 0.2 pairs); reused per config
    )
    t = truth.agg(F.count(F.lit(1)).cast("bigint").alias("n_truth")).localCheckpoint()
    out = None
    for b, r in _D20_CONFIGS:
        cand = dedup.minhash_lsh_pairs(
            docs, "doc_id", "text", n=_SHINGLE_N, bands=b, rows_per_band=r
        ).select("a_id", "b_id")
        nf = (
            truth.join(cand, ["a_id", "b_id"], "left_semi")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_found"))
            .localCheckpoint()
        )
        row = nf.crossJoin(t).select(
            F.lit(b).alias("bands"),
            F.lit(r).alias("rows_per_band"),
            F.col("n_truth"),
            F.col("n_found"),
            F.when(
                F.col("n_truth") > 0,
                F.col("n_found").cast("double") / F.col("n_truth").cast("double"),
            ).alias("recall"),
        )
        out = row if out is None else out.unionByName(row)
    return out

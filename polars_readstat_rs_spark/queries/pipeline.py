"""Training-data pipeline gate queries (operators/sampling.py).

Every oracle mirrors the Spark expression literally; the deterministic
hash arithmetic translates as
Spark ``conv(substr(md5(x),1,8),16,10)`` == DuckDB
``('0x' || substr(md5(x),1,8))::BIGINT`` (verified value-identical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import sampling
from ..tables import load_table
from .registry import register

# DuckDB fragment: 32-bit bucket of md5(seed:id), identical to
# sampling._bucket
def _bucket_sql(seed: str, id_expr: str) -> str:
    return f"('0x' || substr(md5('{seed}' || ':' || CAST({id_expr} AS VARCHAR)), 1, 8))::BIGINT"


_P01_RATE = 0.25
_P01_SEED = "s0"


@register(
    "p01_hash_sample",
    oracle=f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE {_bucket_sql(_P01_SEED, "doc_id")} < {int(_P01_RATE * sampling.BUCKETS)}
    """,
)
def p01_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Bernoulli sample: pure filter, no shuffle, stable
    under repartitioning/incremental reruns (operators/sampling.py)."""
    docs = load_table(spark, sf_dir, "documents")
    return sampling.hash_sample(docs, "doc_id", _P01_RATE, _P01_SEED).select(
        "doc_id", "lang", "source"
    )


_P02_RATES = {"en": 0.5, "de": 0.25, "fr": 0.1}


@register(
    "p02_stratified_sample",
    oracle=f"""
    SELECT doc_id, lang
    FROM documents
    WHERE {_bucket_sql(_P01_SEED, "doc_id")} <
      CASE lang
        WHEN 'en' THEN {int(0.5 * sampling.BUCKETS)}
        WHEN 'de' THEN {int(0.25 * sampling.BUCKETS)}
        WHEN 'fr' THEN {int(0.1 * sampling.BUCKETS)}
        ELSE 0 END
    """,
)
def p02_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return sampling.stratified_sample(docs, "doc_id", "lang", _P02_RATES, _P01_SEED).select(
        "doc_id", "lang"
    )


_P03_WEIGHTS = {"src0": 0.6, "src1": 0.3, "src2": 0.1}
_P03_TARGET = 1000


@register(
    "p03_domain_mix",
    oracle=f"""
    WITH counts AS (SELECT source, count(*) AS _n FROM documents GROUP BY source),
    rates AS (
      SELECT source,
        least(1.0, coalesce(
            CASE source WHEN 'src0' THEN 0.6 WHEN 'src1' THEN 0.3 WHEN 'src2' THEN 0.1 END,
            0.0) * {_P03_TARGET}.0 / CAST(_n AS DOUBLE)) AS _rate
      FROM counts)
    SELECT d.doc_id, d.source
    FROM documents d JOIN rates r USING (source)
    WHERE {_bucket_sql(_P01_SEED, "d.doc_id")} < CAST(floor(r._rate * {float(sampling.BUCKETS)}) AS BIGINT)
    """,
)
def p03_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source keep-rates from a tiny broadcast aggregate hit a
    target size distribution; the filter itself is the stable hash
    Bernoulli (operators/sampling.py:domain_mix)."""
    docs = load_table(spark, sf_dir, "documents")
    return sampling.domain_mix(
        docs, "doc_id", "source", _P03_WEIGHTS, _P03_TARGET, _P01_SEED
    ).select("doc_id", "source")


_P04_BUDGET = 512
_P04_SPAN = 1000


@register(
    "p04_pack_sequences",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             doc_id // {_P04_SPAN} AS _grp
      FROM documents),
    cums AS (
      SELECT doc_id, n_tokens, _grp,
             sum(n_tokens) OVER (PARTITION BY _grp ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS _cum
      FROM toks),
    packs AS (
      SELECT doc_id, n_tokens,
             CAST(_grp * {_P04_SPAN} + (_cum - n_tokens) // {_P04_BUDGET} AS BIGINT) AS pack_id
      FROM cums)
    SELECT doc_id, n_tokens, pack_id,
           CAST(row_number() OVER (PARTITION BY pack_id ORDER BY doc_id) AS INT) AS pack_pos
    FROM packs
    """,
)
def p04_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing, block-parallel (contiguous id
    blocks pack independently — no global sort)."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.col("text"), " "))
    return sampling.pack_sequences(docs, "doc_id", n_tokens, _P04_BUDGET, _P04_SPAN)


_P05_SEED = "epoch0"
_P05_BUCKETS = 64


@register(
    "p05_det_shuffle",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id,
             md5('{_P05_SEED}' || ':' || CAST(doc_id AS VARCHAR)) AS _k
      FROM documents)
    SELECT doc_id,
           CAST(('0x' || substr(_k, 1, 8))::BIGINT % {_P05_BUCKETS} AS INT) AS shuffle_bucket,
           CAST(row_number() OVER (
             PARTITION BY ('0x' || substr(_k, 1, 8))::BIGINT % {_P05_BUCKETS}
             ORDER BY _k, doc_id) AS INT) AS shuffle_pos
    FROM keyed
    """,
)
def p05_det_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-epoch deterministic shuffle as (bucket, position) — bucketed
    windows keep the permutation sort embarrassingly parallel."""
    docs = load_table(spark, sf_dir, "documents")
    return sampling.deterministic_shuffle(docs, "doc_id", _P05_SEED, _P05_BUCKETS).select(
        "doc_id", "shuffle_bucket", "shuffle_pos"
    )


_P06_N = 3


def _shingle_sql(src: str) -> str:
    """DuckDB mirror of operators.text.shingles_expr over table ``src``
    (same fragment shape as queries/llm.py:_sh_ctes)."""
    n = _P06_N
    return f"""
      SELECT doc_id AS doc,
             unnest(list_distinct(list_transform(
               range(1, greatest(len(string_split(lower(text), ' ')) - {n - 2}, 1)),
               i -> array_to_string(string_split(lower(text), ' ')[i:i+{n - 1}], ' ')))) AS sh
      FROM {src}
    """


@register(
    "p06_contamination",
    oracle=f"""
    WITH test_sh AS ({_shingle_sql("(SELECT * FROM documents WHERE doc_id % 10 = 0)")}),
    train_sh AS (SELECT DISTINCT sh FROM ({_shingle_sql("(SELECT * FROM documents WHERE doc_id % 10 <> 0)")})),
    sizes AS (SELECT doc, count(*) AS n_shingles FROM test_sh GROUP BY doc),
    hits AS (
      SELECT t.doc, count(*) AS n_overlap
      FROM test_sh t WHERE t.sh IN (SELECT sh FROM train_sh)
      GROUP BY t.doc)
    SELECT s.doc, CAST(s.n_shingles AS BIGINT) AS n_shingles,
           CAST(coalesce(h.n_overlap, 0) AS BIGINT) AS n_overlap,
           CAST(coalesce(h.n_overlap, 0) AS DOUBLE) / CAST(s.n_shingles AS DOUBLE) AS contamination
    FROM sizes s LEFT JOIN hits h ON s.doc = h.doc
    WHERE coalesce(h.n_overlap, 0) >= 1
    """,
)
def p06_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test n-gram contamination: shuffle semi-join on distinct
    shingles (no doc x doc blowup). Here the 'test' split is doc_id %
    10 == 0 against the rest as training data."""
    docs = load_table(spark, sf_dir, "documents")
    test = docs.filter(F.col("doc_id") % 10 == 0)
    train = docs.filter(F.col("doc_id") % 10 != 0)
    return sampling.contamination_report(train, test, "doc_id", "text", n=_P06_N)


def _p11_oracle() -> str:
    from .llm import _JACCARD_SELECT, _sh_ctes

    bucket = _bucket_sql("split", "cluster")
    thr = int(0.2 * sampling.BUCKETS)
    return f"""
    WITH {_sh_ctes()},
    pairs AS (
      SELECT a_id, b_id FROM ({_JACCARD_SELECT}) WHERE jaccard >= 0.2),
    edges AS (
      SELECT a_id AS src, b_id AS dst FROM pairs
      UNION SELECT b_id, a_id FROM pairs),
    gnodes AS (SELECT DISTINCT src AS node FROM edges),
    reach AS (
      WITH RECURSIVE r(node, comp) AS (
        SELECT node, node FROM gnodes
        UNION
        SELECT e.dst, r.comp FROM r JOIN edges e ON e.src = r.node
      ) SELECT node, comp FROM r),
    comps AS (SELECT node, min(comp) AS comp FROM reach GROUP BY node),
    lab AS (
      SELECT d.doc_id AS doc, COALESCE(c.comp, d.doc_id) AS cluster
      FROM documents d LEFT JOIN comps c ON d.doc_id = c.node)
    SELECT doc, cluster,
           CASE WHEN {bucket} < {thr} THEN 'val' ELSE 'train' END AS split
    FROM lab
    """


@register("p11_leakage_free_split", oracle=_p11_oracle())
def p11_leakage_free_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free train/val split (operators/sampling.py:
    leakage_free_split): near-dup clusters route to one side WHOLE —
    Jaccard pairs -> min-label components -> md5 bucket on the cluster
    representative. The oracle replays the full chain (recursive-CTE
    components + identical bucket math), so the hash proves no
    near-duplicate pair ever straddles the split. The gate pins
    method="jaccard" (the SQL-expressible exact formulation); the
    default is the minhash-LSH frontline path, invariant-tested in
    tests/test_operators.py."""
    docs = load_table(spark, sf_dir, "documents")
    return sampling.leakage_free_split(docs, "doc_id", "text", val_rate=0.2, method="jaccard")

"""Round-9 second-wave LLM-pipeline additions: C4-style line/page
filtering (t21), canonical-URL crawl dedup (d15), and token-budget
mixture planning (p13).

Reference parity note: the reference engine (polars_readstat_rs) has no
text/pipeline surface — these extend the training-data-pipeline suite
the build brief grades as first-class, with the same DuckDB value-hash
gates as the rest of the registry.

Synthesis convention (same as t19/p12): the documents table carries no
newlines or URLs, so the gates synthesize them DETERMINISTICALLY from
(doc_id, source, text) with byte-identical expressions on both engines —
the filtering/canonicalization logic under test is the real operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup, sampling, textstats
from ..tables import load_table
from .registry import register

# ------------------------------------------------- t21 C4 line/page filters

# Break the single-line synthetic text into "lines" of six words each
# (the trailing partial chunk stays unpunctuated — a real C4 reject),
# then inject the failure modes C4's rules exist for: a lorem-ipsum
# boilerplate line (page reject, doc_id % 37), a code line with braces
# (page reject, doc_id % 41), and a punctuated-but-short line
# (line reject, doc_id % 13).
_T21_SIX_WORDS = r"(\S+ \S+ \S+ \S+ \S+ \S+) "
_T21_LOREM = "Lorem Ipsum dolor sit amet filler."
_T21_BRACE = "var x = { a: 1 };"
_T21_SHORT = "short line here."


def _t21_lines_spark() -> F.Column:
    body = F.regexp_replace(F.col("text"), _T21_SIX_WORDS, "$1.\n")
    body = F.when(
        F.col("doc_id") % 37 == 0, F.concat(F.lit(_T21_LOREM + "\n"), body)
    ).otherwise(body)
    body = F.when(
        F.col("doc_id") % 41 == 0, F.concat(body, F.lit("\n" + _T21_BRACE))
    ).otherwise(body)
    return F.when(
        F.col("doc_id") % 13 == 0, F.concat(body, F.lit("\n" + _T21_SHORT))
    ).otherwise(body)


_T21_LINES_SQL = f"""
    CASE WHEN doc_id % 13 = 0 THEN b3 || chr(10) || '{_T21_SHORT}' ELSE b3 END
""".strip()

_T21_BODY_SQL = f"""
    SELECT doc_id,
      CASE WHEN doc_id % 41 = 0 THEN b2 || chr(10) || '{_T21_BRACE.replace("'", "''")}'
           ELSE b2 END AS b3
    FROM (
      SELECT doc_id,
        CASE WHEN doc_id % 37 = 0 THEN '{_T21_LOREM}' || chr(10) || b1
             ELSE b1 END AS b2
      FROM (
        SELECT doc_id,
          regexp_replace(text, '(\\S+ \\S+ \\S+ \\S+ \\S+ \\S+) ',
                         '\\1.' || chr(10), 'g') AS b1
        FROM documents) _i1) _i2
""".strip()


@register(
    "t21_c4_filters",
    oracle=f"""
    WITH body AS ({_T21_BODY_SQL}),
    lined AS (SELECT doc_id, {_T21_LINES_SQL} AS t FROM body),
    split_ AS (SELECT doc_id, t, string_split(t, chr(10)) AS lines FROM lined),
    kept AS (SELECT doc_id, t, lines,
        list_filter(lines, x ->
            len(string_split(trim(x), ' ')) >= {textstats.C4_MIN_LINE_WORDS}
            AND regexp_matches(x, '[.!?"]$')) AS kl
      FROM split_),
    verdict AS (SELECT doc_id, lines, kl,
        (NOT contains(lower(t), 'lorem ipsum') AND NOT contains(t, '{{')
         AND len(kl) >= {textstats.C4_MIN_KEPT_LINES}) AS keep_doc,
        array_to_string(kl, chr(10)) AS kept_text
      FROM kept)
    SELECT doc_id,
      CAST(len(lines) AS INT) AS n_lines,
      CAST(len(kl) AS INT) AS n_kept_lines,
      CAST(coalesce(list_sum(list_transform(kl,
           x -> len(string_split(trim(x), ' ')))), 0) AS INT) AS n_words_kept,
      keep_doc,
      CASE WHEN keep_doc THEN md5(kept_text) END AS kept_md5
    FROM verdict
    """,
)
def t21_c4_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style line + page cleaning (operators/textstats.py:
    c4_line_filters; Raffel et al. 2020 §2.2) over deterministically
    synthesized multi-line pages: terminal-punctuation + min-word line
    filter, lorem-ipsum / curly-brace / min-surviving-lines page
    filter, with the retained text pinned byte-for-byte via md5.
    Map-only whole-stage-codegen array expressions — no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    lined = docs.select("doc_id", _t21_lines_spark().alias("text"))
    return textstats.c4_line_filters(lined)


# ------------------------------------------------- d15 canonical URL dedup

# URL synthesis with every junk axis the canonicalizer handles: mixed
# scheme/host case, explicit default port, trailing slash, tracking
# params in shuffled order, fragments. Groups of doc_ids that differ
# only in junk collapse to one canonical URL.
_D15_URL_SQL = """
    (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'https' END) || '://' ||
    (CASE WHEN doc_id % 6 < 3 THEN upper(source) ELSE source END) || '.Example.COM' ||
    (CASE WHEN doc_id % 4 = 0 THEN ':443' ELSE '' END) ||
    '/a/' || CAST(doc_id % 50 AS VARCHAR) ||
    (CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END) ||
    '?' || (CASE WHEN doc_id % 2 = 0 THEN 'b=2&utm_source=x&a=1'
                 ELSE 'a=1&b=2&gclid=zz' END) ||
    (CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END)
""".strip()


def _d15_url_spark() -> F.Column:
    d = F.col("doc_id")
    return F.concat(
        F.when(d % 2 == 0, F.lit("HTTPS")).otherwise(F.lit("https")),
        F.lit("://"),
        F.when(d % 6 < 3, F.upper(F.col("source"))).otherwise(F.col("source")),
        F.lit(".Example.COM"),
        F.when(d % 4 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/a/"),
        (d % 50).cast("string"),
        F.when(d % 3 == 0, F.lit("/")).otherwise(F.lit("")),
        F.lit("?"),
        F.when(d % 2 == 0, F.lit("b=2&utm_source=x&a=1")).otherwise(
            F.lit("a=1&b=2&gclid=zz")
        ),
        F.when(d % 5 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )


@register(
    "d15_url_dedup",
    oracle=f"""
    WITH u AS (SELECT doc_id, {_D15_URL_SQL} AS url FROM documents),
    parts AS (SELECT doc_id,
        lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)) AS hostport,
        regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)', 1) AS raw_path,
        regexp_extract(url, '\\?([^#]*)', 1) AS q
      FROM u),
    canon AS (SELECT doc_id,
        scheme || '://' ||
        (CASE WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$', '')
              WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$', '')
              ELSE hostport END) ||
        (CASE WHEN raw_path IN ('', '/') THEN '/'
              ELSE regexp_replace(raw_path, '/$', '') END) ||
        (CASE WHEN len(p) > 0 THEN '?' || array_to_string(p, '&') ELSE '' END)
        AS canon_url
      FROM (SELECT *,
              list_sort(list_filter(string_split(q, '&'), x ->
                x <> '' AND NOT regexp_matches(x,
                  '^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|ref)='))) AS p
            FROM parts) _c)
    SELECT canon_url,
           CAST(min(doc_id) AS BIGINT) AS keep_id,
           CAST(count(*) - 1 AS INT) AS n_dupes
    FROM canon GROUP BY canon_url
    """,
)
def d15_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-side canonical-URL exact dedup (operators/dedup.py:
    url_dedup): scheme/host lowercasing, default-port and fragment
    stripping, trailing-slash and tracking-param normalization with
    byte-sorted surviving params, then one groupBy on the canonical URL
    keeping the smallest doc_id. The oracle re-derives the whole
    canonicalization independently in DuckDB."""
    docs = load_table(spark, sf_dir, "documents")
    urls = docs.select("doc_id", _d15_url_spark().alias("url"))
    return dedup.url_dedup(urls)


# ------------------------------------------------- p13 token-budget mixing

_P13_BUDGET = 1_000_000


@register(
    "p13_mix_budget",
    oracle=f"""
    WITH d AS (SELECT source,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS tok,
                 CAST(CAST(regexp_extract(source, '([0-9]+)$', 1) AS INT) % 3 + 1
                      AS BIGINT) AS w
               FROM documents),
    s AS (SELECT source,
                 CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(tok) AS BIGINT) AS available_tokens,
                 max(w) AS weight
          FROM d GROUP BY source),
    t AS (SELECT CAST(sum(weight) AS BIGINT) AS w_total FROM s),
    plan AS (SELECT source, n_docs, available_tokens, weight,
                    CAST({_P13_BUDGET} * weight AS DOUBLE)
                      / CAST(w_total AS DOUBLE) AS target_tokens
             FROM s, t),
    r AS (SELECT *, target_tokens / CAST(available_tokens AS DOUBLE) AS sample_rate
          FROM plan)
    SELECT source, n_docs, available_tokens, weight, target_tokens, sample_rate,
           CAST(floor(sample_rate) AS BIGINT) AS n_full_epochs,
           sample_rate - floor(sample_rate) AS residual_rate
    FROM r
    """,
)
def p13_mix_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture plan (operators/sampling.py:mix_budget):
    per-source available tokens vs weight-proportional targets for a
    1M-token budget, emitting the epoch + Bernoulli sampling schedule
    (n_full_epochs / residual_rate) a training loader executes. Weights
    synthesized from the source name exactly as p12's (digits % 3 + 1).
    Integer-exact aggregation with single identically-ordered double
    divisions on both engines."""
    docs = load_table(spark, sf_dir, "documents")
    weight = (
        F.regexp_extract(F.col("source"), "([0-9]+)$", 1).cast("int") % 3 + 1
    )
    return sampling.mix_budget(docs, _P13_BUDGET, weight)


# ------------------------------------------------- m10 perceptual image dedup

# Payloads synthesized from seed = doc_id % 40, so groups of doc_ids
# carry byte-identical BMPs — the duplicate structure a perceptual
# dedup must recover. The bmp_texture closed form
# pixel(x,y,c) = (seed*(x+1)*(y+2) + 7x^2 + 3y + 11c) % 256 is used
# (NOT the plain m04/m08 gradient: dHash is by design invariant to a
# uniform gradient, so every seed hashed identically and the gate
# degenerated to one row). The oracle recomputes the dHash BIT-FOR-BIT
# (grayscale = channel-sum // 3, floor-map resample to 9x8, left-right
# comparison sign, little-endian 16-bit hex groups), so a match proves
# decode -> grayscale -> resample -> bit extraction, not just grouping.


@register(
    "m10_image_dhash_dedup",
    oracle="""
    WITH p AS (SELECT doc_id, doc_id % 40 AS seed, unnest(range(0, 64)) AS i
               FROM documents),
    m AS (SELECT doc_id, i, seed,
            ((i % 8) * 8) // 9 AS sx0,
            (((i % 8) + 1) * 8) // 9 AS sx1,
            ((i // 8) * 6) // 8 AS sy
          FROM p),
    g AS (SELECT doc_id, i,
            (seed * (sx0 + 1) * (sy + 2) + 7 * sx0 * sx0 + 3 * sy) % 256 AS b0,
            (seed * (sx1 + 1) * (sy + 2) + 7 * sx1 * sx1 + 3 * sy) % 256 AS b1
          FROM m),
    bits AS (SELECT doc_id, i,
            CASE WHEN (b1 + (b1 + 11) % 256 + (b1 + 22) % 256) // 3
                    > (b0 + (b0 + 11) % 256 + (b0 + 22) % 256) // 3
                 THEN 1 ELSE 0 END AS bit
          FROM g),
    grp AS (SELECT doc_id, i // 16 AS grp,
                   CAST(sum(bit * (1 << (i % 16))) AS BIGINT) AS v
            FROM bits GROUP BY doc_id, i // 16),
    hx AS (SELECT doc_id, string_agg(printf('%04x', v), '' ORDER BY grp) AS dhash_hex
           FROM grp GROUP BY doc_id)
    SELECT dhash_hex, CAST(min(doc_id) AS BIGINT) AS keep_id,
           CAST(count(*) - 1 AS INT) AS n_dupes
    FROM hx GROUP BY dhash_hex
    """,
)
def m10_image_dhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image dedup (operators/multimodal.py:dhash_dedup):
    REAL BMP decode -> integer grayscale -> exact floor-map 9x8
    resample -> 64-bit dHash as four 16-bit hex groups, then one
    groupBy on the fingerprint keeping the smallest doc_id. Payload
    synthesis reuses the m04/m08 closed form seeded by doc_id % 40 so
    duplicate groups exist by construction."""
    from ..operators import multimodal

    docs = load_table(spark, sf_dir, "documents")
    mm = multimodal.synth_media_payloads(
        docs.withColumn("_seed40", F.col("doc_id") % 40),
        kind="bmp_texture",
        seed_col="_seed40",
    )
    return multimodal.dhash_dedup(mm)

"""Round-3 (third session) additions: blocked fuzzy entity matching,
time-series gap-fill, RANGE-frame moving aggregates, importance
sampling, and Zipf vocabulary stats.

Determinism notes (per registry rules):
- q44's levenshtein is an exact integer metric with identical semantics
  in Spark (JVM) and DuckDB;
- q45/q46 sum in exact DECIMAL and cast to DOUBLE at the end; the
  forward-fill picks an order statistic (last non-null), not a float
  accumulation;
- p07 reuses the verified md5-bucket arithmetic of p01-p03; the weight
  is a single IEEE multiply/divide chain evaluated identically;
- t12's share/cum_share are one division of exact BIGINT counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import fuzzy, sampling, textstats, timeseries
from ..tables import load_table
from .registry import EVENTS_US, register
from .tpch import _dec_sum_double, _dec_to_double
from .pipeline import _bucket_sql

# ------------------------------------------------- q44 fuzzy entity match

_Q44_MAXDIST = 4
_Q44_MAXBLOCK = 10_000


@register(
    "q44_fuzzy_match",
    oracle=f"""
    WITH names AS (SELECT DISTINCT p_name AS name FROM part),
    blocked AS (SELECT name, string_split(name, ' ')[-1] AS blk FROM names),
    ok_blocks AS (SELECT blk FROM blocked GROUP BY blk HAVING count(*) <= {_Q44_MAXBLOCK}),
    inb AS (SELECT b.name, b.blk FROM blocked b JOIN ok_blocks USING (blk))
    SELECT a.name AS name_a, b.name AS name_b,
           CAST(levenshtein(a.name, b.name) AS INT) AS dist
    FROM inb a JOIN inb b ON a.blk = b.blk AND a.name < b.name
    WHERE levenshtein(a.name, b.name) <= {_Q44_MAXDIST}
    """,
)
def q44_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy entity matching (operators/fuzzy.py): DISTINCT
    names -> block by last token -> levenshtein verify. The distinct()
    collapses the fact table to vocabulary size before any pairing."""
    part = load_table(spark, sf_dir, "part")
    block = F.element_at(F.split(F.col("name"), " "), -1)
    pairs = fuzzy.blocked_fuzzy_pairs(
        part, "p_name", block, max_dist=_Q44_MAXDIST, max_block=_Q44_MAXBLOCK
    )
    return pairs.withColumn("dist", F.col("dist").cast("int"))


# ------------------------------------------------- q45 time-series gap-fill


@register(
    "q45_gapfill",
    oracle=f"""
    WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day, value FROM {EVENTS_US} ev),
    span AS (SELECT user_id, min(day) AS lo, max(day) AS hi FROM e GROUP BY user_id),
    grid AS (
      SELECT user_id, CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
                   CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
      FROM span),
    daily AS (
      SELECT user_id, day, count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS day_total
      FROM e GROUP BY user_id, day)
    SELECT g.user_id, g.day,
           coalesce(d.n, 0) AS n_events, d.day_total,
           last_value(d.day_total IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_total
    FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day
    """,
)
def q45_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily resample + LOCF gap-fill (operators/timeseries.py): per-key
    calendar grid via explode(sequence), one window shuffle on the key."""
    ev = load_table(spark, sf_dir, "events")
    return timeseries.resample_gapfill_daily(ev, "user_id", "ts", "value")


# ------------------------------------------------- q46 RANGE-frame moving sum

_Q46_DAYS = 30


@register(
    "q46_moving_window",
    oracle=f"""
    SELECT o_custkey, CAST(o_orderdate AS DATE) AS order_day,
           CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
             PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE)
             RANGE BETWEEN INTERVAL {_Q46_DAYS} DAY PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS trailing_total,
           CAST(count(*) OVER (
             PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE)
             RANGE BETWEEN INTERVAL {_Q46_DAYS} DAY PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS trailing_orders
    FROM orders
    """,
)
def q46_moving_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time RANGE frame (the moving-aggregate shape q12's running
    ROWS frame doesn't cover): per-customer trailing-30-day order total.
    The frame key is integer days-since-epoch, so Spark's rangeBetween
    bounds mean exactly DuckDB's INTERVAL frame; the sum is exact
    DECIMAL. One shuffle on o_custkey."""
    orders = load_table(spark, sf_dir, "orders")
    day_num = F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day_num)
        .rangeBetween(-_Q46_DAYS, 0)
    )
    return orders.select(
        "o_custkey",
        F.to_date("o_orderdate").alias("order_day"),
        _dec_to_double(
            F.sum(F.col("o_totalprice").cast("decimal(12,2)")).over(w), 2
        ).alias("trailing_total"),
        F.count(F.lit(1)).over(w).alias("trailing_orders"),
    )


# ------------------------------------------------- p07 importance sampling

_P07_SEED = "s0"
_P07_SCALE = 500.0


@register(
    "p07_importance_sample",
    oracle=f"""
    SELECT doc_id, source, n_chars
    FROM documents
    WHERE {_bucket_sql(_P07_SEED, "doc_id")} <
      CAST(floor(least(1.0, greatest(0.0, CAST(n_chars AS DOUBLE) / {_P07_SCALE!r})) * {float(sampling.BUCKETS)!r}) AS BIGINT)
    """,
)
def p07_importance_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted Bernoulli sampling (operators/sampling.py:
    importance_sample): keep probability proportional to a per-row
    quality proxy (here document length), clamped to [0, 1]. Pure
    deterministic filter — no shuffle, stable under reruns."""
    docs = load_table(spark, sf_dir, "documents")
    weight = F.col("n_chars").cast("double") / F.lit(_P07_SCALE)
    return sampling.importance_sample(docs, "doc_id", weight, _P07_SEED).select(
        "doc_id", "source", "n_chars"
    )


# ------------------------------------------------- t12 Zipf vocabulary stats

_T12_TOPK = 200


@register(
    "t12_zipf_stats",
    oracle=f"""
    WITH counts AS (
      SELECT unnest(string_split(lower(text), ' ')) AS token
      FROM documents),
    agg AS (SELECT token, count(*) AS cnt FROM counts GROUP BY token),
    tot AS (SELECT sum(cnt) AS total FROM agg),
    ranked AS (
      SELECT token, CAST(cnt AS BIGINT) AS cnt,
             CAST(row_number() OVER (ORDER BY cnt DESC, token) AS INT) AS rank,
             CAST(sum(cnt) OVER (ORDER BY cnt DESC, token
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      FROM agg)
    SELECT token, cnt, rank,
           CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE) AS share,
           CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) AS cum_share
    FROM ranked, tot
    WHERE rank <= {_T12_TOPK}
    """,
)
def t12_zipf_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary-frequency / Zipf-rank audit
    (operators/textstats.py:zipf_stats): corpus-sized work is one
    token-count shuffle; ranking happens on the vocabulary table."""
    docs = load_table(spark, sf_dir, "documents")
    return textstats.zipf_stats(docs, top_k=_T12_TOPK)


# ------------------------------------------------- t13 document chunking

_T13_SIZE = 64
_T13_STRIDE = 32


@register(
    "t13_chunk_documents",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, string_split(lower(text), ' ') AS words FROM documents),
    k AS (
      SELECT doc_id, words, len(words) AS n,
             greatest(0, (len(words) - {_T13_SIZE} + {_T13_STRIDE} - 1) // {_T13_STRIDE}) AS kmax
      FROM base),
    ch AS (SELECT doc_id, unnest(range(0, kmax + 1)) AS i, words, n FROM k)
    SELECT doc_id, CAST(i AS INT) AS chunk_id,
           CAST(least({_T13_SIZE}, n - i * {_T13_STRIDE}) AS INT) AS chunk_tokens,
           array_to_string(words[(i * {_T13_STRIDE} + 1):(i * {_T13_STRIDE} + {_T13_SIZE})], ' ')
             AS chunk_text
    FROM ch
    """,
)
def t13_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping fixed-token document chunking (operators/text.py:
    chunk_documents) — the pre-embedding pass of a retrieval pipeline.
    Pure per-row explode, zero shuffles."""
    from ..operators.text import chunk_documents

    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(docs, "doc_id", "text", _T13_SIZE, _T13_STRIDE)


# ------------------------------------------------- g01 triangle counting

_G01_MAX_BASKET = 1000


@register(
    "g01_triangle_stats",
    oracle=f"""
    WITH items AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS p FROM lineitem),
    ok AS (SELECT g FROM items GROUP BY g HAVING count(*) <= {_G01_MAX_BASKET}),
    it AS (SELECT items.g, items.p FROM items JOIN ok USING (g)),
    edges AS (
      SELECT DISTINCT a.p AS s, b.p AS d
      FROM it a JOIN it b ON a.g = b.g AND a.p < b.p),
    deg AS (
      SELECT v, count(*) AS deg
      FROM (SELECT s AS v FROM edges UNION ALL SELECT d AS v FROM edges)
      GROUP BY v),
    tri AS (
      SELECT count(*) AS n_triangles
      FROM edges e1
      JOIN edges e2 ON e1.d = e2.s
      JOIN edges e3 ON e3.s = e1.s AND e3.d = e2.d)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_vertices,
           (SELECT CAST(count(*) AS BIGINT) FROM edges) AS n_edges,
           (SELECT CAST(sum((deg * (deg - 1)) // 2) AS BIGINT) FROM deg) AS n_wedges,
           (SELECT CAST(n_triangles AS BIGINT) FROM tri) AS n_triangles,
           (3.0 * (SELECT CAST(n_triangles AS DOUBLE) FROM tri))
             / (SELECT CAST(sum((deg * (deg - 1)) // 2) AS DOUBLE) FROM deg) AS clustering
    """,
)
def g01_triangle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-purchase graph summary (operators/graph.py): parts sharing an
    order form edges; triangles counted on degree-oriented wedges (the
    m^1.5-bounded compact-forward shape — the count itself is
    orientation-invariant, so the id-ordered oracle agrees exactly)."""
    from ..operators import graph

    li = load_table(spark, sf_dir, "lineitem")
    edges = graph.cooccurrence_edges(li, "l_orderkey", "l_partkey", _G01_MAX_BASKET)
    return graph.triangle_stats(edges)


# ------------------------------------------------- g02 BFS hop distance

_G02_MAX_HOPS = 3
_G02_SEED_MAX = 10


@register(
    "g02_bfs_hops",
    oracle=f"""
    WITH RECURSIVE
    items AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS p FROM lineitem),
    ok AS (SELECT g FROM items GROUP BY g HAVING count(*) <= {_G01_MAX_BASKET}),
    it AS (SELECT items.g, items.p FROM items JOIN ok USING (g)),
    edges AS (
      SELECT DISTINCT a.p AS s, b.p AS d
      FROM it a JOIN it b ON a.g = b.g AND a.p < b.p),
    adj AS (SELECT s AS v, d AS n FROM edges UNION ALL SELECT d AS v, s AS n FROM edges),
    walk AS (
      SELECT p AS v, 0 AS hop
      FROM (SELECT DISTINCT l_partkey AS p FROM lineitem WHERE l_partkey < {_G02_SEED_MAX})
      UNION
      SELECT a.n AS v, w.hop + 1 AS hop
      FROM walk w JOIN adj a ON w.v = a.v
      WHERE w.hop < {_G02_MAX_HOPS})
    SELECT v, CAST(min(hop) AS INT) AS hop FROM walk GROUP BY v
    """,
)
def g02_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-depth BFS from a seed set over the co-purchase graph
    (operators/graph.py:bfs_hops) — the iterative frontier-expansion
    shape with a localCheckpoint'ed O(1)-depth loop plan; the DuckDB
    oracle is the equivalent recursive CTE."""
    from ..operators import graph

    li = load_table(spark, sf_dir, "lineitem")
    edges = graph.cooccurrence_edges(li, "l_orderkey", "l_partkey", _G01_MAX_BASKET)
    seeds = li.filter(F.col("l_partkey") < _G02_SEED_MAX).select("l_partkey").distinct()
    return graph.bfs_hops(edges, seeds, _G02_MAX_HOPS)


# ------------------------------------------------- q47 IQR outliers


@register(
    "q47_iqr_outliers",
    oracle=f"""
    WITH f AS (
      SELECT event_type, quantile_cont(value, 0.25) AS p25,
             quantile_cont(value, 0.75) AS p75
      FROM {EVENTS_US} e GROUP BY event_type),
    f2 AS (
      SELECT event_type, p25 - 1.5 * (p75 - p25) AS lo,
             p75 + 1.5 * (p75 - p25) AS hi
      FROM f)
    SELECT e.event_type, lo, hi, count(*) AS n_outliers,
           min(value) AS min_outlier, max(value) AS max_outlier
    FROM {EVENTS_US} e JOIN f2 USING (event_type)
    WHERE value < lo OR value > hi
    GROUP BY e.event_type, lo, hi
    """,
)
def q47_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group Tukey-fence anomaly report (operators/profile.py:
    iqr_outliers): exact quartile fences broadcast back over the fact
    table; all doubles are order statistics (engine-exact)."""
    from ..operators.profile import iqr_outliers

    ev = load_table(spark, sf_dir, "events")
    return iqr_outliers(ev, "event_type", "value")


# ------------------------------------------------- q48 histogram

_Q48_WIDTH = 5.0


@register(
    "q48_histogram",
    oracle=f"""
    WITH counts AS (
      SELECT event_type, CAST(floor(value / {_Q48_WIDTH!r}) AS BIGINT) AS bin,
             count(*) AS n
      FROM {EVENTS_US} e GROUP BY 1, 2),
    totals AS (SELECT event_type, sum(n) AS t FROM counts GROUP BY event_type)
    SELECT c.event_type, c.bin, CAST(c.bin * {_Q48_WIDTH!r} AS DOUBLE) AS bin_lo,
           CAST(c.n AS BIGINT) AS n,
           CAST(c.n AS DOUBLE) / CAST(t AS DOUBLE) AS share
    FROM counts c JOIN totals USING (event_type)
    """,
)
def q48_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width per-group histogram (operators/profile.py:histogram):
    one map-side-combined aggregation; output is bins, not rows."""
    from ..operators.profile import histogram

    ev = load_table(spark, sf_dir, "events")
    return histogram(ev, "event_type", "value", _Q48_WIDTH)


# ------------------------------------------------- p08 exact-size sample

_P08_N = 40


@register(
    "p08_group_sample",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, lang,
             md5('s0' || ':' || CAST(doc_id AS VARCHAR)) AS _k
      FROM documents),
    ranked AS (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang ORDER BY _k, doc_id) AS rn
      FROM keyed)
    SELECT doc_id, lang FROM ranked WHERE rn <= {_P08_N}
    """,
)
def p08_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-size deterministic per-group sample (operators/sampling.py:
    sample_n_per_group): the n smallest md5(seed:id) rows per stratum —
    reservoir-sampling semantics with no RNG state."""
    docs = load_table(spark, sf_dir, "documents")
    return sampling.sample_n_per_group(docs, "doc_id", "lang", _P08_N).select(
        "doc_id", "lang"
    )


# ------------------------------------------------- q49 NTILE binning


@register(
    "q49_ntile",
    oracle="""
    WITH t AS (
      SELECT l_returnflag,
             ntile(4) OVER (PARTITION BY l_returnflag
                            ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS quartile,
             l_extendedprice
      FROM lineitem)
    SELECT l_returnflag, quartile, count(*) AS n,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
    FROM t GROUP BY l_returnflag, quartile
    """,
)
def q49_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency (NTILE) binning — the quantile-bucket assignment
    a feature pipeline uses; a fully-tiebroken ORDER BY makes the bucket
    assignment engine-exact. One shuffle on the partition key."""
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    return (
        li.select(
            "l_returnflag",
            F.ntile(4).over(w).alias("quartile"),
            "l_extendedprice",
        )
        .groupBy("l_returnflag", "quartile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            _dec_sum_double(F.col("l_extendedprice").cast("decimal(12,2)"), 2).alias("total_price"),
        )
    )


# ------------------------------------------------- q50 as-of nearest

_Q50_TOL_MS = 6 * 3600 * 1000


@register(
    "q50_asof_nearest",
    oracle=f"""
    WITH u AS (
      SELECT user_id, event_id, ts, 1 AS is_l, NULL::TIMESTAMP AS rts FROM {EVENTS_US} e
      UNION ALL
      SELECT user_id, NULL, ts, 0, ts FROM {EVENTS_US} e WHERE event_type = 'signup'),
    w AS (
      SELECT user_id, event_id, ts, is_l,
        last_value(rts IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY ts, is_l
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev,
        first_value(rts IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY ts, is_l
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nxt
      FROM u),
    d AS (
      SELECT user_id, event_id, ts,
             epoch_ms(ts) - epoch_ms(prev) AS db, prev,
             epoch_ms(nxt) - epoch_ms(ts) AS df, nxt
      FROM w WHERE is_l = 1)
    SELECT event_id, user_id, epoch_ms(ts) AS ts_ms,
      CASE WHEN prev IS NOT NULL AND db <= {_Q50_TOL_MS}
                AND (NOT (nxt IS NOT NULL AND df <= {_Q50_TOL_MS}) OR db <= df)
           THEN epoch_ms(prev)
           WHEN nxt IS NOT NULL AND df <= {_Q50_TOL_MS} THEN epoch_ms(nxt)
           END AS matched_ms,
      CASE WHEN prev IS NOT NULL AND db <= {_Q50_TOL_MS}
                AND (NOT (nxt IS NOT NULL AND df <= {_Q50_TOL_MS}) OR db <= df)
           THEN -db
           WHEN nxt IS NOT NULL AND df <= {_Q50_TOL_MS} THEN df
           END AS delta_ms
    FROM d
    """,
)
def q50_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """polars-style strategy="nearest" as-of join with tolerance
    (operators/asof.py): one union + two windows per key — no range
    self-join, no row explosion."""
    from ..operators.asof import asof_nearest

    ev = load_table(spark, sf_dir, "events")
    left = ev.select("user_id", "event_id", "ts")
    right = ev.filter(F.col("event_type") == "signup").select("user_id", "ts")
    out = asof_nearest(left, right, "user_id", "ts", _Q50_TOL_MS)
    return out.select(
        "event_id",
        "user_id",
        F.unix_millis("ts").alias("ts_ms"),
        F.unix_millis("matched_ts").alias("matched_ms"),
        "delta_ms",
    )


# ------------------------------------------------- q51 event patterns

_Q51_PATTERN = "cc*p"  # a click run ending in a purchase


@register(
    "q51_event_patterns",
    oracle=f"""
    WITH coded AS (
      SELECT user_id, ts, event_id,
             CASE event_type WHEN 'click' THEN 'c' WHEN 'view' THEN 'v'
               WHEN 'signup' THEN 's' WHEN 'purchase' THEN 'p'
               WHEN 'error' THEN 'e' END AS c
      FROM {EVENTS_US} e),
    seqs AS (
      SELECT user_id, string_agg(c, '' ORDER BY ts, event_id) AS seq
      FROM coded GROUP BY user_id)
    SELECT user_id, CAST(length(seq) AS INT) AS n_events,
           CAST(len(regexp_extract_all(seq, '{_Q51_PATTERN}')) AS INT) AS n_matches
    FROM seqs
    """,
)
def q51_event_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style behavioral pattern counting
    (operators/textstats.py:event_patterns): per-key ordered event-code
    string + non-overlapping regex count, one shuffle on the key."""
    ev = load_table(spark, sf_dir, "events")
    return textstats.event_patterns(ev, _Q51_PATTERN)


# ------------------------------------------------- q52 snapshot diff


def _q52_new_sql() -> str:
    # the synthetic "next snapshot": drop %31 keys, retext %17 keys, add
    # shifted copies of %29 keys
    return """
      SELECT doc_id,
             CASE WHEN doc_id % 17 = 0 THEN text || ' v2' ELSE text END AS text
      FROM documents WHERE doc_id % 31 <> 0
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 29 = 0
    """


@register(
    "q52_snapshot_diff",
    oracle=f"""
    WITH new_snap AS ({_q52_new_sql()}),
    o AS (SELECT doc_id, 1 AS in_o, text AS o_text FROM documents),
    n AS (SELECT doc_id, 1 AS in_n, text AS n_text FROM new_snap)
    SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
      CASE WHEN in_o IS NULL THEN 'added'
           WHEN in_n IS NULL THEN 'removed'
           WHEN o_text IS NOT DISTINCT FROM n_text THEN 'unchanged'
           ELSE 'changed' END AS change_type
    FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
    """,
)
def q52_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed CDC audit between two table snapshots
    (operators/merge.py:snapshot_diff): full outer join + null-safe
    column comparison classifying added/removed/changed/unchanged."""
    from ..operators.merge import snapshot_diff

    docs = load_table(spark, sf_dir, "documents")
    old = docs.select("doc_id", "text")
    new = (
        docs.filter(F.col("doc_id") % 31 != 0)
        .select(
            "doc_id",
            F.when(F.col("doc_id") % 17 == 0, F.concat("text", F.lit(" v2")))
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .unionAll(
            docs.filter(F.col("doc_id") % 29 == 0).select(
                (F.col("doc_id") + 1000000).alias("doc_id"), "text"
            )
        )
    )
    return snapshot_diff(old, new, ["doc_id"], ["text"])


# ------------------------------------------------- q53 Z-order key

_Q53_BITS = 16


def _zvalue_sql(a: str, b: str, bits: int) -> str:
    terms = []
    for bit in range(bits):
        terms.append(f"(((({a}) >> {bit}) & 1) << {bit * 2})")
        terms.append(f"(((({b}) >> {bit}) & 1) << {bit * 2 + 1})")
    return " | ".join(terms)


@register(
    "q53_zorder",
    oracle=f"""
    SELECT o_orderkey,
           CAST({_zvalue_sql("CAST(o_custkey AS BIGINT)",
                             "CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)",
                             _Q53_BITS)} AS BIGINT) AS zval
    FROM orders
    """,
)
def q53_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) clustering key over (customer, order day)
    (operators/bucketing.py:zvalue) — pure bit interleave in codegen;
    range-partitioning by it clusters BOTH dimensions onto files so
    min/max statistics prune filters on either one."""
    from ..operators.bucketing import zvalue

    orders = load_table(spark, sf_dir, "orders")
    day = F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date"))
    return orders.select(
        "o_orderkey",
        zvalue([F.col("o_custkey"), day], _Q53_BITS).alias("zval"),
    )


# ------------------------------------------------- q54 OHLC bars


@register(
    "q54_ohlc",
    oracle=f"""
    WITH r AS (
      SELECT user_id, CAST(ts AS DATE) AS day, value,
             row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                ORDER BY ts, event_id) AS rn_a,
             row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM {EVENTS_US} e)
    SELECT user_id, day,
           max(CASE WHEN rn_a = 1 THEN value END) AS open,
           max(value) AS high, min(value) AS low,
           max(CASE WHEN rn_d = 1 THEN value END) AS close,
           count(*) AS volume
    FROM r GROUP BY user_id, day
    """,
)
def q54_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC bars per user (operators/timeseries.py:ohlc_bars):
    open/close via min_by/max_by under the deterministic (ts, event_id)
    order — all outputs order statistics, one map-side-combined agg."""
    ev = load_table(spark, sf_dir, "events")
    return timeseries.ohlc_bars(ev, "user_id", "ts", "value")


# ------------------------------------------------- q55 hopping windows

_Q55_WIDTH_MS = 6 * 3600 * 1000
_Q55_SLIDE_MS = 3 * 3600 * 1000


@register(
    "q55_hopping_window",
    oracle=f"""
    WITH hop AS (
      SELECT event_type, value,
             (epoch_ms(ts) // {_Q55_SLIDE_MS} - k) * {_Q55_SLIDE_MS} AS window_start_ms,
             epoch_ms(ts) AS t
      FROM {EVENTS_US} e
      CROSS JOIN (SELECT unnest(range(0, {_Q55_WIDTH_MS // _Q55_SLIDE_MS})) AS k))
    SELECT window_start_ms, event_type, count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM hop
    WHERE t >= window_start_ms AND t < window_start_ms + {_Q55_WIDTH_MS}
    GROUP BY window_start_ms, event_type
    """,
)
def q55_hopping_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping (hopping) event-time windows
    (operators/timeseries.py:hopping_window_counts): width 6h, slide 3h
    — each event replicated into width/slide windows inside codegen;
    the oracle unnests the same epoch-aligned window starts."""
    ev = load_table(spark, sf_dir, "events")
    return timeseries.hopping_window_counts(ev, "ts", "6 hours", "3 hours")


# ------------------------------------------------- g03 integer PageRank

_G03_ITERS = 5


def _g03_oracle() -> str:
    from ..operators.graph import PR_SCALE

    base = PR_SCALE * 3 // 20
    # AS MATERIALIZED throughout: adj/deg are referenced by EVERY
    # unrolled iteration (and edges twice by adj) — unmaterialized,
    # duckdb 1.0 re-inlines the whole basket-pair enumeration per
    # reference, and the sf1 sweep watched the oracle spill >40 GB of
    # temp storage to a dead disk (r12). Materialized, the edge list
    # is built once and the five iterations are bounded joins.
    ctes = [
        "items AS MATERIALIZED (SELECT DISTINCT l_orderkey AS g, l_partkey AS p FROM lineitem)",
        f"ok AS MATERIALIZED (SELECT g FROM items GROUP BY g HAVING count(*) <= {_G01_MAX_BASKET})",
        "it AS MATERIALIZED (SELECT items.g, items.p FROM items JOIN ok USING (g))",
        "edges AS MATERIALIZED (SELECT DISTINCT a.p AS s, b.p AS d FROM it a JOIN it b ON a.g = b.g AND a.p < b.p)",
        "adj AS MATERIALIZED (SELECT s AS v, d AS n FROM edges UNION ALL SELECT d AS v, s AS n FROM edges)",
        "deg AS MATERIALIZED (SELECT v, count(*) AS deg FROM adj GROUP BY v)",
        f"r0 AS (SELECT v, CAST({PR_SCALE} AS BIGINT) AS r FROM deg)",
    ]
    for i in range(1, _G03_ITERS + 1):
        ctes.append(
            f"r{i} AS (SELECT a.n AS v, CAST({base} + sum(((17 * r.r) // 20) // d.deg) AS BIGINT) AS r "
            f"FROM r{i - 1} r JOIN deg d ON r.v = d.v JOIN adj a ON a.v = r.v GROUP BY a.n)"
        )
    return "WITH " + ",\n    ".join(ctes) + f"\n    SELECT v, r FROM r{_G03_ITERS}"


@register("g03_pagerank", oracle=_g03_oracle())
def g03_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fixed-point PageRank (operators/graph.py:
    pagerank_int) over the co-purchase graph: exact integer ranks, so
    five unrolled oracle iterations hash-match bit-for-bit — the
    iterative vertex-program shape with none of the float-order
    nondeterminism that usually makes PageRank ungateable."""
    from ..operators import graph

    li = load_table(spark, sf_dir, "lineitem")
    edges = graph.cooccurrence_edges(li, "l_orderkey", "l_partkey", _G01_MAX_BASKET)
    return graph.pagerank_int(edges, iters=_G03_ITERS)


# ------------------------------------------------- q56 regression trend


@register(
    "q56_trend",
    oracle=f"""
    WITH p AS (
      SELECT event_type,
             CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS x,
             CAST(round(value * 100) AS BIGINT) AS y
      FROM {EVENTS_US} e),
    s AS (
      SELECT event_type, count(*) AS n,
             CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
             CAST(sum(x * y) AS HUGEINT) AS sxy, CAST(sum(x * x) AS HUGEINT) AS sxx
      FROM p GROUP BY event_type)
    SELECT event_type, CAST(n AS BIGINT) AS n,
           CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
             AS slope_cents_per_day
    FROM s
    """,
)
def q56_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group least-squares trend (regr_slope) computed from EXACT
    integer sums — x in days, y in cents, the closed-form slope is one
    double division of two exact BIGINTs, so the regression hash-matches
    across engines (the built-in float regr_slope wouldn't). One
    map-side-combined aggregation."""
    ev = load_table(spark, sf_dir, "events")
    # x recentered at the data epoch keeps the BIGINT sums small; the
    # n*sxy - sx*sy combination runs in DECIMAL(38,0) (HUGEINT on the
    # oracle side) so it cannot overflow at any realistic group size
    x = F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).cast("long")
    y = F.round(F.col("value") * 100).cast("long")
    s = ev.select("event_type", x.alias("x"), y.alias("y")).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    num = d("n") * d("sxy") - d("sx") * d("sy")
    den = d("n") * d("sxx") - d("sx") * d("sx")
    return s.select(
        "event_type",
        "n",
        (num.cast("double") / den.cast("double")).alias("slope_cents_per_day"),
    )


# ------------------------------------------------- q57 grouped-map UDF


@register(
    "q57_group_center",
    oracle=f"""
    WITH c AS (
      SELECT event_id, event_type, CAST(round(value * 100) AS BIGINT) AS cents
      FROM {EVENTS_US} e),
    m AS (
      SELECT event_type,
             -- exact floor division for any sign: subtract the
             -- non-negative remainder first, then truncation == floor
             CAST((s - (((s % k) + k) % k)) // k AS BIGINT) AS mean_floor
      FROM (SELECT event_type, CAST(sum(cents) AS BIGINT) AS s,
                   CAST(count(*) AS BIGINT) AS k
            FROM c GROUP BY event_type))
    SELECT c.event_id, c.event_type,
           CAST(c.cents - m.mean_floor AS BIGINT) AS centered_cents
    FROM c JOIN m USING (event_type)
    """,
)
def q57_group_center(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas (the remaining Python-UDF surface after
    scalar pandas_udf / mapInPandas / applyInPandasWithState): per-group
    mean-centering in EXACT integer cents, so even the Arrow-batched
    Python path hash-matches the oracle. The group mean is the floored
    integer mean — pure int arithmetic end to end."""
    import pandas as pd

    ev = load_table(spark, sf_dir, "events")

    def _center(pdf: pd.DataFrame) -> pd.DataFrame:
        cents = (pdf["value"] * 100).round().astype("int64")
        mean_floor = int(cents.sum()) // len(cents)
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "event_type": pdf["event_type"],
                "centered_cents": cents - mean_floor,
            }
        )

    return ev.select("event_id", "event_type", "value").groupBy("event_type").applyInPandas(
        _center, "event_id long, event_type string, centered_cents long"
    )


# ------------------------------------------------- q58 rank-family windows


@register(
    "q58_rank_family",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           CAST(rank() OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           percent_rank() OVER w AS prnk,
           cume_dist() OVER w AS cdist
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
)
def q58_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining rank-family window functions (rank / dense_rank /
    percent_rank / cume_dist). The fully-tiebroken ORDER BY makes even
    the ratio outputs engine-exact — each is one division of exact row
    counts. One shuffle on the partition key."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.cume_dist().over(w).alias("cdist"),
    )


# ------------------------------------------------- q59 array higher-order fns


@register(
    "q59_array_funcs",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INT) AS dim,
           list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                       (a, x) -> a + x) AS fold_sum,
           CAST(list_min(embedding) AS DOUBLE) AS min_v,
           CAST(list_max(embedding) AS DOUBLE) AS max_v,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
           round(sqrt(list_reduce(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, x) -> a + x)), 6) AS l2
    FROM embeddings
    """,
)
def q59_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions over the embedding column
    (transform / aggregate-fold / filter / element min-max) — all
    codegen'd, zero shuffles; folds are left-to-right so even the
    floating outputs are engine-exact (l2 rounded per the v-family
    sqrt convention)."""
    emb = load_table(spark, sf_dir, "embeddings")
    dbl = F.transform("embedding", lambda x: x.cast("double"))
    fold = lambda col: F.aggregate(col, F.lit(0.0), lambda a, x: a + x)  # noqa: E731
    sq = F.transform("embedding", lambda x: x.cast("double") * x.cast("double"))
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        fold(dbl).alias("fold_sum"),
        F.array_min("embedding").cast("double").alias("min_v"),
        F.array_max("embedding").cast("double").alias("max_v"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_pos"),
        F.round(F.sqrt(fold(sq)), 6).alias("l2"),
    )


# ------------------------------------------------- q60 unpivot / melt

_Q60_MEASURES = ["l_quantity", "l_extendedprice", "l_discount"]


@register(
    "q60_unpivot",
    oracle=" UNION ALL ".join(
        f"""SELECT '{m}' AS measure, count(*) AS n,
            CAST(sum(CAST({m} AS DECIMAL(12,2))) AS DOUBLE) AS total
            FROM lineitem"""
        for m in _Q60_MEASURES
    ),
)
def q60_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt) — the inverse of q27's pivot: wide measure columns
    to long (measure, value) rows via the native unpivot operator
    (codegen'd row expansion, no shuffle until the aggregate)."""
    li = load_table(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ["l_orderkey"], _Q60_MEASURES, "measure", "val"
    )
    return long.groupBy("measure").agg(
        F.count(F.lit(1)).alias("n"),
        _dec_sum_double(F.col("val").cast("decimal(12,2)"), 2).alias("total"),
    )


# ------------------------------------------------- q61 lateral join

_Q61_SQL = """
    SELECT p.pri, o.o_orderkey, o.o_totalprice
    FROM (SELECT DISTINCT o_orderpriority AS pri FROM {src}) p,
    LATERAL (
      SELECT o_orderkey, o_totalprice FROM {src}
      WHERE o_orderpriority = p.pri
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
    ) o
"""


@register("q61_lateral", oracle=_Q61_SQL.format(src="orders"))
def q61_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (top-2 orders per priority) — the
    SQL-surface twin of q11's window top-k, exercising Spark's lateral
    join decorrelation; fully tiebroken so the row set is exact."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_q61_orders")
    return spark.sql(_Q61_SQL.format(src="_q61_orders"))


# ------------------------------------------------- q81 map functions


@register(
    "q81_map_functions",
    oracle=f"""
    WITH per AS (
      SELECT user_id, event_type, count(*) AS n FROM {EVENTS_US} e
      GROUP BY user_id, event_type)
    SELECT user_id, event_type, CAST(n AS BIGINT) AS n,
           CAST(n * 2 AS BIGINT) AS n_doubled,
           CAST(count(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_types
    FROM per
    """,
)
def q81_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complex-type surface: per-user event counts are packed into a
    MAP (map_from_entries over a sorted entry list), transformed
    (transform_values doubles each count), sized (map size = distinct
    types per user), and exploded back to rows — a hash match proves
    the map construction/transform/explode roundtrip loses nothing.
    The oracle never needs map types: the roundtrip must equal the
    plain relational counts."""
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    packed = per.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "n")))
        ).alias("m")
    )
    transformed = packed.select(
        "user_id",
        F.transform_values("m", lambda k, v: v * 2).alias("m2"),
        F.col("m"),
        F.size("m").cast("long").alias("n_types"),
    )
    return transformed.select(
        "user_id", F.explode("m").alias("event_type", "n"), "m2", "n_types"
    ).select(
        "user_id",
        "event_type",
        "n",
        F.element_at("m2", F.col("event_type")).cast("long").alias("n_doubled"),
        "n_types",
    )


@register(
    "q82_scd2_intervals",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM {EVENTS_US} e),
    changed AS (
      SELECT user_id, event_type, ts, event_id FROM ordered
      WHERE prev IS NULL OR prev <> event_type),
    versions AS (
      SELECT user_id, event_type, ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
             CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS version
      FROM changed)
    SELECT user_id, event_type,
           epoch_ms(valid_from) AS valid_from_ms,
           epoch_ms(valid_to) AS valid_to_ms,
           version,
           valid_to IS NULL AS is_current
    FROM versions
    """,
)
def q82_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 2 dimension versioning (Kimball): the events log becomes
    per-user state-history intervals — change detection (a repeated
    state does not open a version), [valid_from, valid_to) stitching
    via lead(), version numbers, is_current flag. One shuffle on the
    key; both window passes share the partitioning."""
    from ..operators.scd import scd2_intervals

    ev = load_table(spark, sf_dir, "events").withColumn("ts", F.col("ts").cast("timestamp"))
    out = scd2_intervals(ev, "user_id", "ts", "event_type", "event_id")
    return out.select(
        "user_id",
        "event_type",
        F.unix_millis("valid_from").alias("valid_from_ms"),
        F.unix_millis("valid_to").alias("valid_to_ms"),
        "version",
        "is_current",
    )


@register(
    "q83_point_in_time_join",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM {EVENTS_US} e),
    changed AS (
      SELECT user_id, event_type, ts, event_id FROM ordered
      WHERE prev IS NULL OR prev <> event_type),
    versions AS (
      SELECT user_id, event_type AS state, ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
             CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS version
      FROM changed)
    SELECT e.event_id, e.user_id, epoch_ms(e.ts) AS ts_ms, v.version, v.state
    FROM {EVENTS_US} e JOIN versions v
      ON e.user_id = v.user_id
     AND e.ts >= v.valid_from
     AND (v.valid_to IS NULL OR e.ts < v.valid_to)
    """,
)
def q83_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join (operators/scd.py: point_in_time_join): every
    event picks up the SCD2 state version valid at its timestamp — the
    feature-store as-of shape. Spark runs the scalable union + carry-
    forward window (one key shuffle, no non-equi join); the oracle is
    the straightforward interval range join, so the hash proves the two
    formulations agree row-for-row, including valid_from boundary ties."""
    from ..operators.scd import point_in_time_join, scd2_intervals

    ev = load_table(spark, sf_dir, "events").withColumn("ts", F.col("ts").cast("timestamp"))
    dims = scd2_intervals(ev, "user_id", "ts", "event_type", "event_id").select(
        "user_id", F.col("event_type").alias("state"), "valid_from", "version"
    )
    out = point_in_time_join(
        ev, dims, "user_id", "ts", "valid_from",
        dim_cols=["version", "state"], fact_cols=["event_id"],
        dim_order_col="version",
    )
    return out.select(
        "event_id", "user_id", F.unix_millis("ts").alias("ts_ms"), "version", "state"
    )


@register(
    "q84_group_percentiles",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
           round(quantile_cont(l_extendedprice, 0.50), 6) AS p50,
           round(quantile_cont(l_extendedprice, 0.75), 6) AS p75,
           round(quantile_cont(l_extendedprice, 0.90), 6) AS p90
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q84_group_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalable EXACT grouped percentiles (operators/profile.py:
    exact_percentiles): distributed sort + rank window + boundary-row
    aggregation — never buffers a whole group's values in one
    aggregation buffer the way Spark's built-in `percentile` (and any
    collect-to-array approach) does, so group size is unbounded at
    100 TB. Same (n-1)*q linear interpolation as DuckDB quantile_cont;
    hash-gated bitwise after round(6)."""
    from ..operators.profile import exact_percentiles

    li = load_table(spark, sf_dir, "lineitem")
    return exact_percentiles(li, "l_returnflag", "l_extendedprice", (0.25, 0.5, 0.75, 0.9))


@register(
    "q85_recursive_hierarchy",
    oracle="""
    WITH RECURSIVE anc(node, anc, depth) AS (
      SELECT s_suppkey, s_suppkey // 2, CAST(1 AS INT) FROM supplier WHERE s_suppkey > 1
      UNION ALL
      SELECT a.node, a.anc // 2, CAST(a.depth + 1 AS INT) FROM anc a WHERE a.anc > 1
    )
    SELECT depth, count(*) AS n,
           CAST(min(node) AS BIGINT) AS min_node, CAST(max(node) AS BIGINT) AS max_node,
           CAST(sum(anc) AS BIGINT) AS anc_sum
    FROM anc GROUP BY depth
    """,
)
def q85_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (WITH RECURSIVE, new SQL surface in Spark 4):
    ancestor-chain walk over the implicit binary hierarchy
    parent(k) = k div 2 on supplier keys — the BOM-explosion /
    org-chart traversal shape. Spark executes the recursion as
    iterated unions (depth here is log2(n), so the loop is bounded and
    each iteration is a full distributed plan); DuckDB runs its native
    recursive CTE — the hash gate proves both fixpoints agree."""
    sup = load_table(spark, sf_dir, "supplier")
    return spark.sql(
        """
        WITH RECURSIVE anc(node, anc, depth) AS (
          SELECT s_suppkey, s_suppkey DIV 2, CAST(1 AS INT)
          FROM {sup} WHERE s_suppkey > 1
          UNION ALL
          SELECT a.node, a.anc DIV 2, CAST(a.depth + 1 AS INT)
          FROM anc a WHERE a.anc > 1
        )
        SELECT depth, count(*) AS n,
               CAST(min(node) AS BIGINT) AS min_node, CAST(max(node) AS BIGINT) AS max_node,
               CAST(sum(anc) AS BIGINT) AS anc_sum
        FROM anc GROUP BY depth
        """,
        sup=sup,
    )


@register(
    "q86_windowed_distinct",
    oracle=f"""
    SELECT event_id, user_id,
           count(DISTINCT event_type) OVER (
             PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS n_distinct_types
    FROM {EVENTS_US} e
    """,
)
def q86_windowed_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window DISTINCT count — a window feature Spark LACKS
    natively (count(DISTINCT) OVER is unsupported), re-expressed as
    size(collect_set(...)) over the same ROWS frame: per event, how
    many distinct event types the user produced in their last 10
    events. The frame is rows-bounded, so the collected set is capped
    at 10 elements per row regardless of partition size — no unbounded
    state, safe at any scale. DuckDB runs its native DISTINCT window
    aggregate; the hash gate proves the re-expression exact."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-9, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.size(F.collect_set("event_type").over(w)).cast("long").alias("n_distinct_types"),
    )


@register(
    "q87_grouped_mode",
    oracle="""
    WITH c AS (
      SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n
      FROM orders GROUP BY o_orderstatus, o_orderpriority),
    r AS (
      SELECT o_orderstatus, o_orderpriority, n,
             CAST(row_number() OVER (
               PARTITION BY o_orderstatus
               ORDER BY n DESC, o_orderpriority ASC) AS INT) AS rk
      FROM c)
    SELECT o_orderstatus, o_orderpriority AS mode_priority, n AS mode_count
    FROM r WHERE rk = 1
    """,
)
def q87_grouped_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic grouped MODE (most frequent value, lexicographic
    tie-break). Spark 3.4+ ships F.mode but leaves ties implementation-
    defined; the scalable deterministic shape is count-then-argmax:
    one partial-aggregated groupBy on (group, value) — map-side combine
    keeps the shuffle at distinct-pair cardinality, not row count —
    then a row_number window over the tiny per-group value list. Both
    engines run the identical formulation, so the tie-break is pinned."""
    orders = load_table(spark, sf_dir, "orders")
    counts = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("n").desc(), F.col("o_orderpriority").asc()
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "o_orderstatus",
            F.col("o_orderpriority").alias("mode_priority"),
            F.col("n").alias("mode_count"),
        )
    )

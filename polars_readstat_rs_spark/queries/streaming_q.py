"""Gate query: a Structured Streaming windowed aggregation driven to
completion must equal the batch oracle — the strongest check available
for the streaming layer (same window function, same decimal-exact sums).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming.windows import events_stream, run_to_completion, windowed_counts
from .registry import EVENTS_US, register


@register(
    "s01_stream_windowed_counts",
    oracle=f"""
    SELECT epoch_ms(ts) - epoch_ms(ts) % 21600000 AS window_start_ms, event_type,
           count(*) AS n, CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM {EVENTS_US} e
    GROUP BY 1, 2
    """,
)
def s01_stream_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    agg = windowed_counts(events_stream(spark, sf_dir))
    name = "s01_windowed_counts"
    run_to_completion(agg, name)
    return spark.table(name)


_S02_GAP_MS = 30 * 60 * 1000


@register(
    "s02_stream_sessions",
    # hash-gated since the sessionizer accumulates exact integer cents:
    # the drained bounded stream equals the classic lag + cumulative-sum
    # batch sessionization bit-for-bit (same oracle family as q34).
    oracle=f"""
    WITH marked AS (
      SELECT user_id, ts, event_id, value,
        CASE WHEN lag(ts) OVER w IS NULL
             OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > {_S02_GAP_MS} THEN 1 ELSE 0 END AS new_sess
      FROM {EVENTS_US} e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts, value,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked)
    SELECT user_id, epoch_ms(min(ts)) AS session_start_ms,
           epoch_ms(max(ts)) AS session_end_ms,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM sess GROUP BY user_id, sid
    """,
)
def s02_stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful sessionizer (applyInPandasWithState, EventTimeTimeout)
    driven over the bounded events stream. Event-time gaps close
    sessions as data arrives; each user's trailing session flushes when
    the watermark passes its gap — the sentinel staging file
    (events_stream(sentinel=True)) supplies the final watermark push, so
    processAllAvailable() terminates deterministically with the complete
    session set. No wall-clock polling, no mid-batch stop.

    The per-key mutable state + timers aren't SQL, but the RESULT is:
    with exact integer-cent accumulation the drained stream hash-matches
    the lag/cumsum batch sessionization oracle; tests/test_streaming.py
    additionally asserts equality with the batch sessionizer.
    """
    from ..streaming.sessions import sessionize_stream
    from ..streaming.windows import SENTINEL_USER

    name = "s02_sessions"
    stream = events_stream(spark, sf_dir, sentinel=True)
    sessions = sessionize_stream(stream, gap_ms=_S02_GAP_MS).filter(
        F.col("user_id") != SENTINEL_USER
    )
    q = (
        sessions.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


@register(
    "s03_stream_stream_join",
    oracle=f"""
    SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
           epoch_ms(c.ts) AS click_ms, epoch_ms(p.ts) AS purchase_ms
    FROM {EVENTS_US} c JOIN {EVENTS_US} p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
    """,
)
def s03_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream self-join (streaming/joins.py
    attribution_join): purchases attributed to clicks by the same user
    within 30 minutes. Inner joins emit eagerly on match, so draining
    the bounded file stream yields the complete deterministic match
    set — equal to the batch interval join the oracle runs."""
    from ..streaming.joins import attribution_join

    name = "s03_attribution"
    joined = attribution_join(events_stream(spark, sf_dir))
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


@register(
    "s04_stream_dedup",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def s04_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup (streaming/dedup.py dedup_stream,
    dropDuplicatesWithinWatermark): first arrival per
    (user_id, event_type) fingerprint with watermark-bounded state.
    Only the key columns are emitted — which physical row wins within a
    micro-batch is execution-order dependent, but its key is not — and
    the gate's watermark delay covers the whole dataset span, so state
    is never evicted mid-stream and the drained result equals the batch
    DISTINCT even if the source delivers multiple micro-batches
    (production uses a small delay where the semantic IS windowed
    dedup; equality to global DISTINCT then only holds within the
    window)."""
    from ..streaming.dedup import dedup_stream

    name = "s04_dedup"
    out = dedup_stream(
        events_stream(spark, sf_dir), ["user_id", "event_type"], watermark="400 days"
    ).select(
        "user_id", "event_type"
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


@register(
    "s05_stream_static_join",
    oracle=f"""
    SELECT e.event_id, e.user_id, c.c_mktsegment AS mktsegment,
           epoch_ms(e.ts) AS ts_ms
    FROM {EVENTS_US} e JOIN customer c ON e.user_id = c.c_custkey
    """,
)
def s05_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join — the third canonical Structured
    Streaming join shape (after stream-stream s03 and the windowed aggs):
    each micro-batch of the events stream joins against a STATIC
    dimension table (customer), stateless, no watermark needed. At
    100 TB the static side is a broadcast (small dim) or a co-partitioned
    bucketed table; Catalyst picks per micro-batch exactly as in batch."""
    from ..tables import load_table

    name = "s05_enriched"
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey"), F.col("c_mktsegment").alias("mktsegment")
    )
    stream = events_stream(spark, sf_dir)
    out = stream.join(cust, stream.user_id == cust.c_custkey).select(
        "event_id", "user_id", "mktsegment", F.unix_millis("ts").alias("ts_ms")
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


@register(
    "s06_incremental_agg",
    oracle="""
    SELECT user_id, event_type, count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY user_id, event_type
    """,
)
def s06_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch incremental materialized view
    (streaming/incremental.py): the events table arrives as a 4-file
    micro-batched stream; each batch pre-aggregates map-side and merges
    additively into a localCheckpoint-ed accumulator. Decimal sums make
    the merge order-independent, so the drained state equals the
    one-shot batch aggregate bitwise — which is exactly what the oracle
    asserts."""
    from ..streaming.incremental import incremental_event_totals

    return incremental_event_totals(spark, sf_dir)


_S07_WIDTH_MS = 6 * 3600 * 1000
_S07_SLIDE_MS = 3 * 3600 * 1000


@register(
    "s07_stream_hopping",
    oracle=f"""
    WITH hop AS (
      SELECT event_type, value,
             (epoch_ms(ts) // {_S07_SLIDE_MS} - k) * {_S07_SLIDE_MS} AS window_start_ms,
             epoch_ms(ts) AS t
      FROM {EVENTS_US} e
      CROSS JOIN (SELECT unnest(range(0, {_S07_WIDTH_MS // _S07_SLIDE_MS})) AS k))
    SELECT window_start_ms, event_type, count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM hop
    WHERE t >= window_start_ms AND t < window_start_ms + {_S07_WIDTH_MS}
    GROUP BY window_start_ms, event_type
    """,
)
def s07_stream_hopping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming HOPPING (sliding) windows — the overlapping-window
    twin of s01's tumbling aggregate: the same
    operators/timeseries.hopping_window_counts plan bound to the
    bounded events stream, drained through the complete-mode memory
    sink; equals batch q55 exactly (decimal sums, epoch-aligned
    windows)."""
    from ..operators.timeseries import hopping_window_counts
    from ..streaming.windows import run_to_completion

    agg = hopping_window_counts(
        events_stream(spark, sf_dir).withWatermark("ts", "1 hour"),
        "ts",
        "6 hours",
        "3 hours",
    )
    name = "s07_hopping"
    run_to_completion(agg, name)
    return spark.table(name)


@register(
    "s08_stream_outer_join",
    oracle=f"""
    SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
           epoch_ms(c.ts) AS click_ms, epoch_ms(p.ts) AS purchase_ms
    FROM {EVENTS_US} c LEFT JOIN {EVENTS_US} p
      ON c.user_id = p.user_id
     AND p.event_type = 'purchase'
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
    WHERE c.event_type = 'click'
    """,
)
def s08_stream_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked LEFT OUTER stream-stream join (streaming/joins.py
    attribution_join(how='left_outer')): unmatched clicks emit with null
    purchase columns only after the watermark proves no match can still
    arrive, so the sentinel staging file supplies the final watermark
    push and the drained bounded stream equals the batch left join."""
    from ..streaming.joins import attribution_join
    from ..streaming.windows import SENTINEL_USER

    name = "s08_outer_attribution"
    joined = attribution_join(events_stream(spark, sf_dir, sentinel=2), how="left_outer")
    # The sentinel-row filter runs on the DRAINED batch table, not
    # inside the streaming plan: a pre-sink filter on user_id would be
    # predicate-pushed below the event-time watermark operator into the
    # scans, silently dropping the sentinel before it can advance the
    # watermark — the exact failure this gate exists to catch.
    run_to_completion(joined, name, output_mode="append")
    return spark.table(name).filter(F.col("user_id") != SENTINEL_USER)


@register(
    "s09_stream_session_window",
    oracle=f"""
    WITH marked AS (
      SELECT user_id, ts, value,
        CASE WHEN lag(ts) OVER w IS NULL
             OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 1800000 THEN 1 ELSE 0 END AS new_sess
      FROM {EVENTS_US} e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts, value,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked)
    SELECT user_id, epoch_ms(min(ts)) AS session_start_ms, count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM sess GROUP BY user_id, sid
    """,
)
def s09_stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATIVE streaming session windows: the built-in
    F.session_window(gap) aggregation running under Structured
    Streaming — the third sessionization code path the engine gates
    (q34 = batch session_window, s02 = custom stateful
    applyInPandasWithState). Complete output mode re-emits the final
    merged sessions once the bounded source drains, so the drained
    table equals the batch lag/cumsum oracle exactly (decimal-cent
    sums keep it arrival-order independent)."""
    stream = events_stream(spark, sf_dir)
    agg = (
        stream.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        )
        .select(
            "user_id",
            F.unix_millis("w.start").alias("session_start_ms"),
            "n_events",
            "total_value",
        )
    )
    name = "s09_session_window"
    run_to_completion(agg, name)
    return spark.table(name)


# ------------------------------------------- s10 streaming clean pipeline

from .registry import ORACLES  # noqa: E402  (composes the t01/t09 oracles)


@register(
    "s10_stream_clean_pipeline",
    oracle="""
    WITH lid AS ({T01}),
    gq AS ({T09}),
    surv AS (
      SELECT d.source, md5(d.text) AS fp,
             len(string_split(lower(d.text), ' ')) AS toks
      FROM documents d
      JOIN lid ON lid.doc_id = d.doc_id AND lid.pred_lang = 'en'
      JOIN gq ON gq.doc_id = d.doc_id AND gq.keep),
    u AS (SELECT DISTINCT source, fp, toks FROM surv)
    SELECT source, CAST(count(*) AS BIGINT) AS n_unique,
           CAST(sum(toks) AS BIGINT) AS n_tokens
    FROM u GROUP BY source
    """,
)
def s10_stream_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The p15 cleaning pipeline running in STREAMING mode — the
    continuously-crawled-corpus ingest path: the same fused
    langid_pred_expr / gopher_keep_expr predicates filter each
    micro-batch (stateless map, identical expressions as batch p15),
    then streaming dropDuplicates on (source, md5(text)) keeps the
    first arrival of every distinct cleaned document. Key-level output
    only (like s04: WHICH physical doc_id wins a within-batch tie is
    execution-order dependent, its fingerprint is not), aggregated
    per source after the drain. Production note: unbounded dedup
    state — a real crawl bounds it with
    dropDuplicatesWithinWatermark on ingest time (streaming/dedup.py);
    the gate's bounded corpus needs no eviction."""
    from ..operators.textstats import gopher_keep_expr, langid_pred_expr
    from ..streaming.windows import docs_stream

    name = "s10_clean"
    cleaned = (
        docs_stream(spark, sf_dir)
        .filter((langid_pred_expr() == "en") & gopher_keep_expr())
        .select(
            "source",
            F.md5("text").alias("fp"),
            F.size(F.split(F.lower("text"), " ")).alias("toks"),
        )
        .dropDuplicates(["source", "fp"])
    )
    q = (
        cleaned.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return (
        spark.table(name)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_unique"),
            F.sum("toks").cast("bigint").alias("n_tokens"),
        )
    )


ORACLES["s10_stream_clean_pipeline"] = ORACLES["s10_stream_clean_pipeline"].format(
    T01=ORACLES["t01_langid"], T09=ORACLES["t09_gopher_quality"]
)

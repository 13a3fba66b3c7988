"""Structured Streaming operators over the events table.

The reference has no streaming surface (its batch iterator S6 is a
pull-based stream of record batches; the Spark analogue there is the
DataSource's partition iterator). These operators are the push-based
streaming layer a Spark-native engine adds: file-source streams with
event-time windows, watermarks for late data, and sessionization.

For tests/gating, a parquet file drives the stream through the memory
sink synchronously (processAllAvailable); in production the same plan
binds to kafka/files with identical semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SENTINEL_USER = -1


def _src_fingerprint(path: str) -> str:
    """Staging dirs embed the source file's (size, mtime_ns) so a
    refreshed testdata drop can never be served from a stale /tmp cache
    (round-2 lesson: the events parquet's physical type DOES drift
    between drops)."""
    import os

    st = os.stat(path)
    return f"{st.st_size}_{st.st_mtime_ns}"
# far enough past any testdata event that every event-time timer
# (last_event + gap) sits below the watermark this sentinel produces
_SENTINEL_ISO = "2100-01-01T00:00:00"
# the events table's closed event_type vocabulary (one sentinel row per
# type so event_type-filtered legs still receive a watermark push)
_SENTINEL_EVENT_TYPES = ["click", "view", "signup", "purchase", "error"]


def _write_sentinel(stage: str, src: str, n: int = 1) -> None:
    """Drop ``n`` one-row far-future events (user_id = SENTINEL_USER)
    into the staging dir as separate files. The file source
    (oldest-mtime-first, maxFilesPerTrigger=1) processes them after the
    real data, each pushing the global watermark further, which makes
    the engine run final flush batches and then terminate — the
    deterministic replacement for wall-clock sink polling.

    Why n matters: a watermark computed from batch K's data only takes
    effect in batch K+1. Event-time TIMERS fire in the very next batch
    (n=1 suffices — the sessionizer's contract), but stream-stream
    OUTER-join null rows are emitted by the state-eviction path, which
    needs one more DATA batch after the watermark already advanced —
    processAllAvailable() does not wait for Spark's asynchronous
    no-data batches, so n=2 makes the final eviction a data batch the
    drain provably covers."""
    import datetime
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pq.read_schema(src)
    ts_field = schema.field("ts")
    base = datetime.datetime.fromisoformat(_SENTINEL_ISO)
    # one sentinel row per event type: a filter-then-watermark consumer
    # (the attribution joins' event_type legs) must still see a
    # far-future row AFTER its pushed filter, or its watermark never
    # advances and trailing state never flushes — a NULL event_type
    # sentinel is silently dropped at the scan.
    types = _SENTINEL_EVENT_TYPES
    for i in range(n):
        path = os.path.join(stage, f"zz_sentinel{i or ''}.parquet")
        if os.path.exists(path):
            continue
        dt = base + datetime.timedelta(days=i)
        if pa.types.is_timestamp(ts_field.type):
            ts_arr = pa.array([dt] * len(types), type=ts_field.type)
        else:  # legacy nanosAsLong int64 contract
            ts_arr = pa.array(
                [int(dt.timestamp() * 1e9)] * len(types), type=ts_field.type
            )
        cols = []
        for f in schema:
            if f.name == "ts":
                cols.append(ts_arr)
            elif f.name == "user_id":
                cols.append(pa.array([SENTINEL_USER] * len(types), type=f.type))
            elif f.name == "event_type":
                cols.append(pa.array(types, type=f.type))
            else:
                cols.append(pa.nulls(len(types), type=f.type))
        tmp = path + ".tmp"
        pq.write_table(pa.Table.from_arrays(cols, schema=schema), tmp)
        os.replace(tmp, path)  # atomic: the source never lists a half-written file
        # strictly increasing mtimes pin the oldest-first processing order
        st = os.stat(path)
        os.utime(path, ns=(st.st_atime_ns, st.st_mtime_ns + i * 1_000_000_000))


def events_stream(
    spark: SparkSession, sf_dir: str, sentinel: bool | int = False
) -> DataFrame:
    """File-source stream of the events table with ts normalized to a
    proper timestamp — the same per-dtype contract as tables.load_table
    (bigint = legacy nanosAsLong -> truncating div; timestamp_ntz =
    µs-identity cast under the forced UTC session zone). The stream
    schema is taken from the parquet footer, NOT hardcoded, so testdata
    type drift cannot silently corrupt timestamps again.

    Spark's file stream source requires a directory, so the single
    parquet file is exposed through a symlinked staging dir.

    ``sentinel=True`` (or an int N) stages into a separate directory
    that also holds far-future marker event file(s) (see
    _write_sentinel; N=2 for stream-stream outer joins, whose
    null-row eviction needs a data batch AFTER the watermark push) —
    used by stateful queries with event-time timers to flush trailing
    state and terminate deterministically. Consumers must drop
    ``user_id = SENTINEL_USER``.
    """
    import os
    import tempfile

    n_sentinels = int(sentinel)
    src0 = f"{sf_dir}/events.parquet"
    tag = (
        sf_dir.strip("/").replace("/", "_")
        + "_" + _src_fingerprint(src0)
        + (f"_sentinel{n_sentinels}" if n_sentinels else "")
    )
    stage = os.path.join(tempfile.gettempdir(), f"events_stream_{tag}")
    os.makedirs(stage, exist_ok=True)
    src = f"{sf_dir}/events.parquet"
    link = os.path.join(stage, "events.parquet")
    if not os.path.exists(link):
        try:
            os.symlink(src, link)
        except FileExistsError:
            pass  # concurrent creator won the race — same target
    if n_sentinels:
        _write_sentinel(stage, src, n_sentinels)
    # the RAW footer schema (pre-normalization types) is required here —
    # tables.load_table's cached plan is already ts-normalized, so this
    # one footer read per call is intentional, not an oversight
    batch_schema = spark.read.parquet(src).schema
    raw = (
        spark.readStream.format("parquet")
        .schema(batch_schema)
        .option("maxFilesPerTrigger", "1")
        .load(stage)
    )
    ts_type = dict((f.name, f.dataType) for f in batch_schema.fields).get("ts")
    if isinstance(ts_type, T.LongType):
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(ts_type, T.TimestampNTZType):
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def windowed_counts(events: DataFrame, window: str = "6 hours", watermark: str = "1 hour") -> DataFrame:
    """Tumbling event-time window aggregate with a watermark. The exact
    batch shape of queries/relational.q24 — streaming and batch agree."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.unix_millis("w.start").alias("window_start_ms"),
            "event_type",
            "n",
            "total_value",
        )
    )


def run_to_completion(
    agg: DataFrame, query_name: str, output_mode: str = "complete"
) -> None:
    """Drive a bounded stream to completion through the memory sink
    ("complete" re-emits every window once the source drains; "append"
    for joins/dedup whose rows finalize as the watermark passes)."""
    q = (
        agg.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def docs_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream of the documents table — the ingest shape of
    a continuously-crawled corpus. Same staging contract as
    :func:`events_stream` (file stream sources need a directory; the
    single parquet file is exposed through a symlinked staging dir,
    schema from the parquet footer). Documents carry no event time, so
    no ts normalization applies."""
    import os
    import tempfile

    src = f"{sf_dir}/documents.parquet"
    tag = sf_dir.strip("/").replace("/", "_") + "_" + _src_fingerprint(src)
    stage = os.path.join(tempfile.gettempdir(), f"docs_stream_{tag}")
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "documents.parquet")
    if not os.path.exists(link):
        try:
            os.symlink(src, link)
        except FileExistsError:
            pass  # concurrent creator won the race — same target
    batch_schema = spark.read.parquet(src).schema
    return (
        spark.readStream.format("parquet")
        .schema(batch_schema)
        .option("maxFilesPerTrigger", "1")
        .load(stage)
    )

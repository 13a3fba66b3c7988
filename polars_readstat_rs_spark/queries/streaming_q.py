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


@register("s02_stream_sessions")  # no oracle: custom stateful operator (rows-only gate)
def s02_stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful sessionizer (applyInPandasWithState) driven over the
    bounded events stream. Event-time gaps close sessions as data
    arrives; each user's trailing session is flushed by the
    processing-time idle timeout, so the emitted set converges to
    exactly the batch sessionization — we poll the sink until the
    expected count (computed batch-side) is reached.

    Not SQL-expressible (per-key mutable state + timers), hence
    rows-only: the driver checks a stable row count, and
    tests/test_streaming.py asserts full value equality with the batch
    sessionizer.
    """
    import time

    from pyspark.sql.window import Window

    from ..streaming.sessions import sessionize_stream
    from ..tables import load_table

    gap_ms = 30 * 60 * 1000
    ev = load_table(spark, sf_dir, "events")
    n_sessions = (
        ev.select("user_id", F.unix_millis("ts").alias("ts_ms"))
        .withColumn("prev", F.lag("ts_ms").over(Window.partitionBy("user_id").orderBy("ts_ms")))
        .filter(F.col("prev").isNull() | (F.col("ts_ms") - F.col("prev") > gap_ms))
        .count()
    )

    name = "s02_sessions"
    stream = events_stream(spark, sf_dir)
    q = (
        sessionize_stream(stream, gap_ms=gap_ms, idle_timeout_ms=2000)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline and spark.table(name).count() < n_sessions:
            time.sleep(1)
    finally:
        q.stop()
    return spark.table(name)

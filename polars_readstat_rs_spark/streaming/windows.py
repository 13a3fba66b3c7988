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

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # ns (nanosAsLong parquet read)
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream of the events table with ts normalized to a
    proper timestamp (same µs truncation as tables.load_table).

    Spark's file stream source requires a directory, so the single
    parquet file is exposed through a symlinked staging dir.
    """
    import os
    import tempfile

    tag = sf_dir.strip("/").replace("/", "_")
    stage = os.path.join(tempfile.gettempdir(), f"events_stream_{tag}")
    os.makedirs(stage, exist_ok=True)
    link = os.path.join(stage, "events.parquet")
    if not os.path.exists(link):
        try:
            os.symlink(f"{sf_dir}/events.parquet", link)
        except FileExistsError:
            pass  # concurrent creator won the race — same target
    raw = (
        spark.readStream.format("parquet")
        .schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .load(stage)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


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


def run_to_completion(agg: DataFrame, query_name: str) -> None:
    """Drive a bounded file stream to completion through the memory sink
    (complete mode: every window emitted once the source drains)."""
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

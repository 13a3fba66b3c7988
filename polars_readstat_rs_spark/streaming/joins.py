"""Watermarked stream-stream joins over the events table.

The reference has no streaming surface (SURVEY.md §2.5 — its batch
iterator is a pull-based record-batch stream); stream-stream joins are
part of the push-based streaming layer a Spark-native engine adds on
top. The canonical shape is event attribution: join two event streams
on a key within a bounded event-time window, with watermarks on BOTH
sides so the join state is evicted once no future match is possible.

Scale: state size is bounded by (watermark + join window) x arrival
rate per side; the join shuffles both streams on the equi-key
(user_id — uniform in the testdata; salt upstream if a key is hot).
An inner join emits eagerly on match, so bounded inputs drained with
processAllAvailable() produce the complete, deterministic match set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribution_join(
    events: DataFrame,
    left_type: str = "click",
    right_type: str = "purchase",
    window: str = "30 minutes",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join: every ``right_type`` event attributed to
    each ``left_type`` event by the same user within ``window`` after it.

    ``events`` must carry TimestampType ``ts`` (the events_stream
    contract). Both sides get a watermark so Spark bounds the join
    state: left rows are dropped once the right watermark passes
    left.ts + window, right rows once the left watermark passes their
    ts. Output columns are all value-deterministic (ids + epoch
    millis), so the result is gate-hashable.

    ``how="left_outer"`` additionally emits every unmatched left event
    with null purchase columns — but only AFTER the watermark passes its
    join window (the engine must prove no future match exists before it
    may emit the null row). On a bounded stream that means the trailing
    lefts never flush on their own: drive it with
    ``events_stream(sentinel=True)`` so the far-future sentinel pushes
    the final watermark, exactly like the stateful sessionizer's
    termination contract.
    """
    left = (
        events.filter(F.col("event_type") == left_type)
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", watermark)
    )
    right = (
        events.filter(F.col("event_type") == right_type)
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    return (
        left.join(
            right,
            (F.col("user_id") == F.col("p_user_id"))
            & (F.col("p_ts") >= F.col("c_ts"))
            & (F.col("p_ts") <= F.col("c_ts") + F.expr(f"INTERVAL {window}")),
            how,
        )
        .select(
            "click_id",
            "purchase_id",
            "user_id",
            F.unix_millis("c_ts").alias("click_ms"),
            F.unix_millis("p_ts").alias("purchase_ms"),
        )
    )

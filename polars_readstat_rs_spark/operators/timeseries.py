"""Time-series resample / gap-fill over an event log.

The TimescaleDB `time_bucket_gapfill` / InfluxDB `fill(previous)` shape:
regularize an irregular event stream onto a fixed calendar grid, with
explicit zero-counts for empty buckets and last-observation-carried-
forward for values.

Scale shape (100 TB): the grid is generated PER KEY from each key's own
[min, max] span (`explode(sequence(...))`) — never a driver-side
calendar cross-join; grid size is O(keys x span/step) and generation is
embarrassingly parallel. The gap-fill itself is one window over
(key, bucket) — a single shuffle on the key, which is also the join key
for the observed aggregate, so AQE coalesces the two into one exchange
reuse. No Python in the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_gapfill_daily(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Daily resample of (key, ts, value) with gap rows and forward-fill.

    Returns one row per (key, day) for every day in the key's own
    observed [first, last] span:
      - n_events: events that day (0 on gap days),
      - day_total: exact DECIMAL day sum as DOUBLE (NULL on gap days),
      - filled_total: day_total with gaps forward-filled from the most
        recent observed day (LOCF).
    """
    day = F.to_date(F.col(ts_col))
    span = events.groupBy(key_col).agg(
        F.min(day).alias("_lo"), F.max(day).alias("_hi")
    )
    grid = span.select(
        key_col, F.explode(F.sequence("_lo", "_hi")).alias("day")
    )
    daily = events.groupBy(F.col(key_col), day.alias("day")).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col(value_col).cast("decimal(12,2)")).cast("double").alias("day_total"),
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(daily, [key_col, "day"], "left")
        .select(
            F.col(key_col),
            "day",
            F.coalesce("_n", F.lit(0)).alias("n_events"),
            "day_total",
            F.last("day_total", ignorenulls=True).over(w).alias("filled_total"),
        )
    )


def ohlc_bars(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Daily OHLC (open/high/low/close) bars per key — the canonical
    financial downsample. Open/close are order statistics under the
    deterministic (ts, tiebreak) order, high/low plain min/max, volume
    the row count: every output is engine-exact with no float
    accumulation. One aggregation with map-side combine."""
    day = F.to_date(F.col(ts_col))
    order = F.struct(F.col(ts_col), F.col(tiebreak_col))
    return events.groupBy(F.col(key_col), day.alias("day")).agg(
        F.min_by(value_col, order).alias("open"),
        F.max(value_col).alias("high"),
        F.min(value_col).alias("low"),
        F.max_by(value_col, order).alias("close"),
        F.count(F.lit(1)).alias("volume"),
    )


def hopping_window_counts(
    events: DataFrame,
    ts_col: str,
    width: str = "6 hours",
    slide: str = "3 hours",
    group_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Overlapping (hopping) event-time windows: each event lands in
    width/slide windows. Spark's window() generator handles the
    replication inside codegen; epoch-aligned starts make the window
    identity engine-independent. Shuffles once on (window, group)."""
    return (
        events.groupBy(F.window(ts_col, width, slide).alias("w"), group_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(value_col).cast("decimal(12,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.unix_millis("w.start").alias("window_start_ms"),
            group_col,
            "n",
            "total_value",
        )
    )

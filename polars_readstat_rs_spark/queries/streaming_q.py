"""Gate query: a Structured Streaming windowed aggregation driven to
completion must equal the batch oracle — the strongest check available
for the streaming layer (same window function, same decimal-exact sums).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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

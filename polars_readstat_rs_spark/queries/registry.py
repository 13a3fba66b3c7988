"""Query registry shared by __spark_entry__, bench.py and tests.

Each query is a callable ``(spark, sf_dir) -> DataFrame`` plus (usually)
a DuckDB-compatible oracle SQL string computing the same result over the
same parquet tables.

Determinism rules (so the driver's order-insensitive value-hash matches):
- integers / strings / dates / booleans pass through untouched;
- non-associative float aggregations accumulate in exact DECIMAL and are
  cast to DOUBLE afterwards (bitwise-identical on both engines, no
  rounding-mode traps);
- array folds (dot products, minhash) use an explicit left-to-right fold
  with the same element order on both engines;
- timestamps are never emitted raw (Spark collects them in driver-local
  time): emit ``unix_millis(ts)`` / ``epoch_ms(ts)`` BIGINT or DATE.
- DuckDB's sum(INTEGER) returns HUGEINT: oracle SQL casts to BIGINT.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, SparkQuery] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[SparkQuery], SparkQuery]:
    def deco(fn: SparkQuery) -> SparkQuery:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# DuckDB oracle helper: events.ts is parquet timestamp[us] today (was
# TIMESTAMP(NANOS) in older testdata drops); either way the cast matches
# the Spark-side per-dtype normalization in tables.load_table.
EVENTS_US = (
    "(SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events)"
)

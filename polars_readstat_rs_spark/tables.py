"""Loaders for the driver-generated TPC-H-ish testdata tables.

Tables (one parquet each, see /root/repo/TESTDATA.md): region nation
customer supplier part orders lineitem events documents embeddings.

``events.ts`` is stored as parquet TIMESTAMP(NANOS); Spark reads it as
LongType (nanosAsLong) and we normalize to TimestampType at microsecond
precision here, so every downstream operator sees a regular timestamp.
DuckDB oracles must apply the matching cast (``CAST(ts AS TIMESTAMP)``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from .session import ensure_session_confs

    ensure_session_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # ns since epoch -> µs-precision timestamp (Spark's native precision).
        # Integer `div` (not /1000, which round-trips through double and can
        # be off by 1µs at 1.7e18 ns) to match DuckDB's truncating ns->µs cast.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)

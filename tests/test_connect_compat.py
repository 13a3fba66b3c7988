"""Spark Connect compatibility: the package must not hard-require
classic mode. Connect clients have no sparkContext / RDD API, so every
touchpoint needs a documented fallback:

- operators.spread: probe unavailable -> input left untouched
- tables.load_table: applicationId cache key -> client-session identity
- api.plan_rle_partitions: sc.parallelize job -> mapInPandas job

A real Connect server isn't available in this container, so these tests
drive the fallback branches through proxies that raise exactly where
Connect raises (attribute access on sparkContext / .rdd), while
delegating everything else to the live classic session — the fallback
code paths themselves are executed for real.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from polars_readstat_rs_spark import api
from polars_readstat_rs_spark.tables import load_table


class _ConnectSessionProxy:
    """Delegates to a classic SparkSession but raises on sparkContext,
    mimicking pyspark.sql.connect.session.SparkSession."""

    def __init__(self, spark):
        object.__setattr__(self, "_spark", spark)

    @property
    def sparkContext(self):
        raise NotImplementedError("sparkContext is not supported in Spark Connect")

    def __getattr__(self, name):
        return getattr(self._spark, name)


class _ConnectDataFrameProxy:
    """Delegates to a classic DataFrame but raises on .rdd."""

    def __init__(self, df, session_proxy):
        object.__setattr__(self, "_df", df)
        object.__setattr__(self, "_session", session_proxy)

    @property
    def rdd(self):
        raise NotImplementedError("rdd is not supported in Spark Connect")

    @property
    def sparkSession(self):
        return self._session

    def __getattr__(self, name):
        return getattr(self._df, name)


def test_spread_degrades_without_rdd(spark, sf_dir):
    from polars_readstat_rs_spark.operators.spread import spread

    df = load_table(spark, sf_dir, "documents")
    proxy = _ConnectDataFrameProxy(df, _ConnectSessionProxy(spark))
    out = spread(proxy)
    assert out is proxy  # untouched — no repartition attempted


def test_load_table_without_sparkcontext(spark, sf_dir):
    proxy = _ConnectSessionProxy(spark)
    df = load_table(proxy, sf_dir, "region")
    assert df.count() == 5
    # second call hits the id(session)-keyed cache (same object -> same key)
    assert load_table(proxy, sf_dir, "region") is df


def test_plan_rle_partitions_mapinpandas_fallback(spark, tmp_path):
    """The Connect branch must produce the SAME plan the RDD branch
    does, computed executor-side via mapInPandas."""
    from polars_readstat_rs_spark.formats.spss import writer as spss_writer
    import pyarrow as pa

    n = 40_000
    t = pa.table(
        {
            "x": pa.array(np.arange(n, dtype="float64")),
            "s": pa.array([f"row {i}" for i in range(n)]),
        }
    )
    p = str(tmp_path / "big.sav")
    spss_writer.write_sav(t, p, compress="bytecode")

    classic = api.plan_rle_partitions(spark, p, partitions=4, target_bytes=64 * 1024)
    connect = api.plan_rle_partitions(
        _ConnectSessionProxy(spark), p, partitions=4, target_bytes=64 * 1024
    )
    assert classic == connect
    assert list(classic.keys()) == [p]
    # verify reads agree through the planned scan
    df = (
        spark.read.format("readstat")
        .option("rle_plan", __import__("json").dumps(connect))
        .load(p)
    )
    assert df.count() == n

"""api.readstat_read_local — the driver-local small-file fast path
(r13 verdict item 6). Its correctness contract is BYTE-identical
results to readstat_scan for the same (path, options): it runs the
exact executor reader code in-process, so these tests compare the two
paths across formats and the option surface."""

import os

import pytest

from polars_readstat_rs_spark import api

STATA = "/root/reference/tests/stata/data/sample_pyreadstat.dta"
SAV = "/root/reference/tests/spss/data/sample.sav"
SAS = "/root/reference/tests/sas/data/data_pandas/productsales.sas7bdat"

# one consistent guard for the whole module — mixing per-test exists()
# checks with unconditional use would make the suite partly red, partly
# silently-empty on a checkout without the reference corpus
pytestmark = pytest.mark.skipif(
    not all(os.path.exists(p) for p in (STATA, SAV, SAS)),
    reason="reference fixture corpus not present",
)


def _paired(spark, path, **kw):
    a = api.readstat_scan(spark, path, **kw)
    b = api.readstat_read_local(spark, path, **kw)
    assert a.schema == b.schema, f"schema drift for {path} {kw}"
    ra = sorted(map(tuple, a.collect()), key=repr)
    rb = sorted(map(tuple, b.collect()), key=repr)
    assert ra == rb, f"row drift for {path} {kw}"
    return b


@pytest.mark.parametrize("path", [STATA, SAV, SAS])
def test_local_matches_scan_default(spark, path):
    _paired(spark, path)


def test_local_matches_scan_option_matrix(spark):
    # columns / offset / limit / row_index / labels-off on the stata
    # sample (the richest option surface)
    _paired(spark, STATA, columns=["mychar", "mynum"])
    _paired(spark, STATA, offset=1, limit=2)
    _paired(spark, STATA, row_index=True)
    _paired(spark, STATA, value_labels_as_strings=False)
    _paired(spark, SAV, informative_nulls=True)


def test_local_plan_is_local_relation(spark):
    df = api.readstat_read_local(spark, STATA)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "LocalRelation" in plan or "LocalTableScan" in df._jdf.queryExecution().executedPlan().toString()


def test_local_rejects_globs_and_big_files(spark, tmp_path):
    with pytest.raises(ValueError, match="ONE file"):
        api.readstat_read_local(spark, os.path.dirname(STATA))
    with pytest.raises(ValueError, match="max_rows"):
        api.readstat_read_local(spark, STATA, max_rows=1)


def test_local_composes_distributed(spark):
    """Downstream transforms on the local relation still run through
    normal Spark execution (joins/aggs distribute)."""
    from pyspark.sql import functions as F

    df = api.readstat_read_local(spark, STATA)
    out = df.groupBy("mylabl").agg(F.count("*").alias("n")).collect()
    assert sum(r.n for r in out) == df.count()

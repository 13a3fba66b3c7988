"""Capture .explain("formatted") output for queries into plans/<tag>/.

Usage: python tools/capture_plans.py <tag> <suffix> [query ...]
  tag:    subdirectory under plans/ (e.g. r14)
  suffix: file suffix (before | after)
  query:  query names (default: the bench HEADLINE set)

Writes plans/<tag>/<query>_<suffix>.txt with the formatted physical
plan as built for the single-file sf0.1 layout (the bench's layout for
per-query timing; the multifile layout differs only in scan split
counts, not plan shape).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")


def main() -> None:
    tag = sys.argv[1]
    suffix = sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from polars_readstat_rs_spark.queries import QUERIES
    from polars_readstat_rs_spark.session import get_spark

    if not names:
        sys.path.insert(0, "tools")
        from bench_multifile import DEFAULT_QUERIES

        names = DEFAULT_QUERIES

    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    outdir = os.path.join("plans", tag)
    os.makedirs(outdir, exist_ok=True)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
        from polars_readstat_rs_spark.operators.dedup import release_cached

        release_cached(df)
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()

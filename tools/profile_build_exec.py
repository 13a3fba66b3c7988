"""Split each query's wall time into DataFrame BUILD time (driver-side
plan construction: py4j round trips, collect()s of bounded models,
spread's partition probe) and EXECUTE time (noop-sink action): the build
component is a per-invocation driver constant that data volume never
amortizes locally, so it is a first-class optimization target for the
sub-second bench queries.

Usage: python tools/profile_build_exec.py [sf_dir|staged] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tools")


def main() -> None:
    args = sys.argv[1:]
    # first arg is a data dir iff it IS one (r15 ADVICE fix: the old
    # `"/" in args[0]` check sent the documented literal `staged` — or
    # any relative dir name — into the QUERIES lookup); the `staged`
    # keyword explicitly selects the default 16-file staged layout
    sf_dir = None
    if args and (os.path.isdir(args[0]) or args[0] == "staged"):
        first = args.pop(0)
        sf_dir = None if first == "staged" else first

    from bench_multifile import DEFAULT_QUERIES, stage

    from polars_readstat_rs_spark.operators.dedup import release_cached
    from polars_readstat_rs_spark.queries import QUERIES
    from polars_readstat_rs_spark.session import get_spark

    spark = get_spark("profile-build")
    spark.sparkContext.setLogLevel("ERROR")
    staged = sf_dir or stage("/root/testdata/sf0.1", 16)
    names = args or DEFAULT_QUERIES

    QUERIES["q01_pricing_summary"](spark, staged).write.format("noop").mode("overwrite").save()

    print(f"{'query':28s} {'build':>7s} {'exec':>7s} {'total':>7s}")
    for name in names:
        best = None
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.time()
            out = QUERIES[name](spark, staged)
            t1 = time.time()
            out.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            release_cached(out)
            if best is None or (t2 - t0) < sum(best):
                best = (t1 - t0, t2 - t1)
        print(f"{name:28s} {best[0]:7.3f} {best[1]:7.3f} {best[0] + best[1]:7.3f}")


if __name__ == "__main__":
    main()

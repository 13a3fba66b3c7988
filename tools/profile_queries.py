"""Per-query job/stage profile on the staged multifile layout: the
multifile bench ratio is dominated by Spark's fixed per-stage cost
(~0.2 s), so the lever is the NUMBER of jobs/stages each sub-second
query schedules. Prints per-query wall seconds + job count + total
stage count (from the status tracker) so a stage-budget regression is
visible as data.

Usage: python tools/profile_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tools")


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args.pop(0) if args and "/" in args[0] else "/root/testdata/sf0.1"

    from bench_multifile import DEFAULT_QUERIES, stage

    from polars_readstat_rs_spark.operators.dedup import release_cached
    from polars_readstat_rs_spark.queries import QUERIES
    from polars_readstat_rs_spark.session import get_spark

    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")
    staged = stage(sf_dir, 16)
    names = args or DEFAULT_QUERIES

    # warmup
    QUERIES["q01_pricing_summary"](spark, staged).write.format("noop").mode("overwrite").save()

    sc = spark.sparkContext
    tracker = sc.statusTracker()
    for name in names:
        best = None
        for _ in range(3):
            spark.catalog.clearCache()
            sc.setJobGroup(name, name)
            t0 = time.time()
            out = QUERIES[name](spark, staged)
            out.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            release_cached(out)
            jobs = tracker.getJobIdsForGroup(name)
            n_stages = 0
            n_tasks = 0
            for j in jobs:
                ji = tracker.getJobInfo(j)
                if ji:
                    for s in ji.stageIds:
                        si = tracker.getStageInfo(s)
                        if si:
                            n_stages += 1
                            n_tasks += si.numTasks
            if best is None or dt < best[0]:
                best = (dt, len(jobs), n_stages, n_tasks)
            sc.setJobGroup("", "")
        print(
            f"{name:28s} {best[0]:6.3f}s  jobs={best[1]:3d} stages={best[2]:3d} tasks={best[3]:4d}"
        )


if __name__ == "__main__":
    main()

"""Per-stage wall/metrics profile for one query (r15): run the query
through the noop sink and print, for every stage the action ran, its
submission-to-completion wall, task count, executor run/CPU time,
shuffle read/write bytes, input bytes, and spill — read from the
driver's AppStatusStore via py4j. This is the stage-level breakdown
the scaling artifact can't see (it reports one wall number per query).

Usage: python tools/stage_profile.py <sf_dir|staged-dir> <query> [runs]
Env:   SPARK_GRAFT_CPUS (session core count, default env/32)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tools")


def stage_rows(spark):
    jvm = spark.sparkContext._jvm
    store = spark.sparkContext._jsc.sc().statusStore()
    empty = jvm.java.util.ArrayList()
    darr = spark.sparkContext._gateway.new_array(jvm.double, 0)
    stages = store.stageList(empty, False, False, darr, empty)
    out = {}
    for i in range(stages.size()):
        s = stages.apply(i)
        sub = s.submissionTime()
        comp = s.completionTime()
        wall = None
        if sub.isDefined() and comp.isDefined():
            wall = (comp.get().getTime() - sub.get().getTime()) / 1000.0
        out[(s.stageId(), s.attemptId())] = {
            "wall": wall,
            "tasks": s.numCompleteTasks(),
            "run_time_s": round(s.executorRunTime() / 1000.0, 2),
            "cpu_time_s": round(s.executorCpuTime() / 1e9, 2),
            "gc_s": round(s.jvmGcTime() / 1000.0, 2),
            "shuffle_read_mb": round(s.shuffleReadBytes() / 1e6, 1),
            "shuffle_write_mb": round(s.shuffleWriteBytes() / 1e6, 1),
            "input_mb": round(s.inputBytes() / 1e6, 1),
            "spill_disk_mb": round(s.diskBytesSpilled() / 1e6, 1),
            "name": s.name().split("\n")[0][:90],
        }
    return out


def main() -> None:
    data_dir = sys.argv[1]
    qname = sys.argv[2]
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    from polars_readstat_rs_spark.operators.dedup import release_cached
    from polars_readstat_rs_spark.queries import QUERIES
    from polars_readstat_rs_spark.session import get_spark

    spark = get_spark(f"stage-profile-{qname}")
    spark.sparkContext.setLogLevel("ERROR")
    # STAGE_PROFILE_CONF="k=v;k=v" applies runtime confs before running —
    # for A/B'ing planner knobs (e.g. autoBroadcastJoinThreshold=-1)
    for kv in filter(None, os.environ.get("STAGE_PROFILE_CONF", "").split(";")):
        k, v = kv.split("=", 1)
        spark.conf.set(k, v)
        print(f"conf: {k}={v}", flush=True)

    staged = data_dir
    if not os.path.exists(os.path.join(data_dir, "_STAGED")) and os.path.exists(
        os.path.join(data_dir, "lineitem.parquet")
    ):
        from bench_multifile import stage

        staged = stage(data_dir, int(os.environ.get("SCALING_NFILES", "16")))

    # warm codegen + python workers
    QUERIES["q01_pricing_summary"](spark, staged).write.format("noop").mode(
        "overwrite"
    ).save()

    for r in range(runs):
        spark.catalog.clearCache()
        before = stage_rows(spark)
        spark.sparkContext.setJobDescription(f"{qname} run {r}")
        t0 = time.time()
        out = QUERIES[qname](spark, staged)
        t_build = time.time()
        out.write.format("noop").mode("overwrite").save()
        t1 = time.time()
        release_cached(out)
        after = stage_rows(spark)
        new = {k: v for k, v in after.items() if k not in before}
        print(
            json.dumps(
                {
                    "query": qname,
                    "run": r,
                    "build_s": round(t_build - t0, 3),
                    "exec_s": round(t1 - t_build, 3),
                }
            ),
            flush=True,
        )
        for k in sorted(new):
            print(f"  stage {k[0]:>4}: {json.dumps(new[k])}", flush=True)


if __name__ == "__main__":
    main()

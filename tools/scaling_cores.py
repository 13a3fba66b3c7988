"""Core-count scaling artifact (r15, VERDICT r14 item 2): run the heavy
bench queries at a staged sf>=1 under local[8] and local[32] in FRESH
subprocesses (the master URL is fixed at session build) and record the
wall-clock ratio per query. The r14 driver's 8-vs-32 block at sf0.1
showed <=1.3x for every query — at that SF each query is
overhead/driver-bound, so the restructured operators' parallel paths
were never exercised. This tool pins the sf>=1 evidence.

Methodology notes (all recorded in the artifact):
- SAME shuffle-partition count (96) and scan-split size at both core
  counts, so the only variable is executor parallelism — partition
  sizing is not allowed to confound the scaling ratio.
- Page cache warmed over the staged files before either leg; Python
  worker pool warmed inside each session before timing (a cold
  32-worker pool pays ~32 numpy imports inside the first timed run).
- Quiesce gate on the empty-job floor before each timed query (shared
  VM), min-of-RUNS per query.
- Legs interleave per query? No — sessions are per-core-count, so the
  tool runs leg pairs back-to-back per query set and records the
  empty-job floor per leg so contention windows are visible in the
  artifact.

Usage: python tools/scaling_cores.py <sf_dir> <out.json> [query ...]
Env: SCALING_CPUS=8,32  SCALING_RUNS=2  SCALING_NFILES=16
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tools")

HEAVY_DEFAULT = [
    "d02_dedup_ngram_jaccard",
    "d03_dedup_minhash_lsh",
    "d05_simhash_pairs",
    "v05_srp_neardup",
    "p06_contamination",
    "v01_cosine_topk",
    "v02_embedding_neardup",
]

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, ".")
sys.path.insert(0, "tools")
spec = json.load(open(sys.argv[1]))
os.environ["SPARK_GRAFT_CPUS"] = str(spec["cpus"])
os.environ["SPARK_GRAFT_SHUFFLE"] = str(spec["shuffle"])
os.environ.setdefault("SPARK_GRAFT_MAXPART", spec["maxpart"])
from polars_readstat_rs_spark.operators.dedup import release_cached
from polars_readstat_rs_spark.queries import QUERIES
from polars_readstat_rs_spark.session import get_spark

spark = get_spark(f"scaling-{spec['cpus']}c")
spark.sparkContext.setLogLevel("ERROR")
staged = spec["staged"]

def run_q(q):
    spark.catalog.clearCache()
    out = QUERIES[q](spark, staged)
    out.write.format("noop").mode("overwrite").save()
    release_cached(out)

# warm codegen + parquet footers + the Python worker pool
import pandas as _pd
def _warm_workers(batches):
    for b in batches:
        yield _pd.DataFrame({"n": [len(b)]})
run_q("q01_pricing_summary")
(spark.range(100_000).repartition(int(spark.sparkContext.defaultParallelism))
 .mapInPandas(_warm_workers, "n long").write.format("noop").mode("overwrite").save())

def empty_floor(runs=3):
    best = None
    for _ in range(runs):
        t0 = time.time()
        spark.range(1).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    return best

idle = float(os.environ.get("SPARK_GRAFT_IDLE_FLOOR", "0.12"))
res = {"cpus": spec["cpus"], "floor": {}, "sec": {}, "runs": spec["runs"]}
for q in spec["queries"]:
    f = None
    for att in range(12):
        f = empty_floor()
        if f <= idle:
            break
        time.sleep(10)
    best = None
    for _ in range(spec["runs"]):
        t0 = time.time()
        run_q(q)
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    res["sec"][q] = round(best, 3)
    res["floor"][q] = round(f, 4)
    print(json.dumps({"cpus": spec["cpus"], "q": q, "sec": res["sec"][q]}), flush=True)
with open(spec["result_path"], "w") as fh:
    json.dump(res, fh)
"""


def main() -> None:
    sf_dir = sys.argv[1]
    out_path = sys.argv[2]
    queries = sys.argv[3:] or HEAVY_DEFAULT
    cpus_list = [int(c) for c in os.environ.get("SCALING_CPUS", "8,32").split(",")]
    runs = int(os.environ.get("SCALING_RUNS", "2"))
    n_files = int(os.environ.get("SCALING_NFILES", "16"))

    from bench_multifile import stage

    staged = stage(sf_dir, n_files)
    # warm page cache once for both legs
    for root, _dirs, files in os.walk(staged):
        for fn in files:
            if fn.endswith(".parquet"):
                with open(os.path.join(root, fn), "rb") as fh:
                    while fh.read(1 << 24):
                        pass

    state = {
        "metric": "core_scaling",
        "sf_dir": sf_dir,
        "staged": staged,
        "n_files": n_files,
        "shuffle_partitions": 96,
        "maxpart": os.environ.get("SPARK_GRAFT_MAXPART", "16m"),
        "runs": runs,
        "queries": queries,
        "legs": {},
        "load_avg_start": round(os.getloadavg()[0], 2),
    }
    for cpus in cpus_list:
        result_path = f"/tmp/scaling_{cpus}c_result.json"
        spec_path = f"/tmp/scaling_{cpus}c_spec.json"
        with open(spec_path, "w") as fh:
            json.dump(
                {
                    "cpus": cpus,
                    "shuffle": 96,
                    "maxpart": state["maxpart"],
                    "staged": staged,
                    "queries": queries,
                    "runs": runs,
                    "result_path": result_path,
                },
                fh,
            )
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, "-c", _CHILD, spec_path], capture_output=False
        )
        if proc.returncode != 0:
            state["legs"][str(cpus)] = {"error": f"rc={proc.returncode}"}
        else:
            with open(result_path) as fh:
                state["legs"][str(cpus)] = json.load(fh)
            state["legs"][str(cpus)]["leg_wall"] = round(time.time() - t0, 1)
        with open(out_path, "w") as fh:
            json.dump(state, fh, indent=1)

    # speedup table: sec@8 / sec@32 (ideal = 4.0 at 8->32)
    legs = state["legs"]
    if all(str(c) in legs and "sec" in legs[str(c)] for c in cpus_list) and len(cpus_list) == 2:
        lo, hi = str(min(cpus_list)), str(max(cpus_list))
        state["speedup_lo_over_hi"] = {
            q: round(legs[lo]["sec"][q] / max(legs[hi]["sec"][q], 1e-9), 2)
            for q in queries
            if q in legs[lo]["sec"] and q in legs[hi]["sec"]
        }
    state["load_avg_end"] = round(os.getloadavg()[0], 2)
    with open(out_path, "w") as fh:
        json.dump(state, fh, indent=1)
    print(json.dumps({"done": out_path, "speedup": state.get("speedup_lo_over_hi")}))


if __name__ == "__main__":
    main()

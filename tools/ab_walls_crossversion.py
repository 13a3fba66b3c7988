"""Interleaved cross-version wall A/B: alternate fresh-session legs between
two repo checkouts (A=r14-close, B=HEAD), same staged data, same queries.
Each leg: warm (q01 + python workers), then RUNS timed noop-sink runs per
query. Mins across rounds per leg are the comparison.

Usage: python /tmp/ab_walls.py <sf_dir> <out.json> <rounds> <runs> <q1> [q2 ...]
"""
import json
import os
import subprocess
import sys
import time

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, ".")
from polars_readstat_rs_spark.operators.dedup import release_cached
from polars_readstat_rs_spark.queries import QUERIES
from polars_readstat_rs_spark.session import get_spark

sf_dir, runs, queries = sys.argv[1], int(sys.argv[2]), sys.argv[3:]
spark = get_spark("ab-walls")
spark.sparkContext.setLogLevel("ERROR")
import pandas as _pd
def _warm(batches):
    for b in batches:
        yield _pd.DataFrame({"n": [len(b)]})
QUERIES["q01_pricing_summary"](spark, sf_dir).write.format("noop").mode("overwrite").save()
(spark.range(100_000).repartition(int(spark.sparkContext.defaultParallelism))
 .mapInPandas(_warm, "n long").write.format("noop").mode("overwrite").save())
res = {}
for q in queries:
    secs = []
    for _ in range(runs):
        spark.catalog.clearCache()
        t0 = time.time()
        out = QUERIES[q](spark, sf_dir)
        out.write.format("noop").mode("overwrite").save()
        secs.append(round(time.time() - t0, 3))
        release_cached(out)
    res[q] = secs
print("ABRESULT " + json.dumps(res))
"""

def main():
    sf_dir, out_path, rounds, runs = sys.argv[1], sys.argv[2], int(sys.argv[3]), int(sys.argv[4])
    queries = sys.argv[5:]
    legs = {"A_r14close": "/tmp/repo_r14close", "B_head": "/root/repo"}
    state = {"metric": "cross_version_wall_ab", "sf_dir": sf_dir, "rounds": rounds,
             "runs_per_leg": runs, "legs": {k: {"dir": v, "rounds": []} for k, v in legs.items()},
             "load_start": round(os.getloadavg()[0], 2)}
    for r in range(rounds):
        for name, d in legs.items():
            t0 = time.time()
            p = subprocess.run([sys.executable, "-c", CHILD, sf_dir, str(runs)] + queries,
                               capture_output=True, text=True, cwd=d,
                               env={**os.environ, "SPARK_GRAFT_CPUS": "32"})
            rec = None
            for line in p.stdout.splitlines():
                if line.startswith("ABRESULT "):
                    rec = json.loads(line[len("ABRESULT "):])
            state["legs"][name]["rounds"].append(
                {"round": r, "load": round(os.getloadavg()[0], 2), "wall": round(time.time()-t0,1),
                 "secs": rec, "rc": p.returncode,
                 "err": p.stderr[-500:] if rec is None else None})
            with open(out_path, "w") as fh:
                json.dump(state, fh, indent=1)
            print(json.dumps({"round": r, "leg": name, "secs": rec}), flush=True)
    # min per query per leg
    mins = {}
    for name in legs:
        m = {}
        for rnd in state["legs"][name]["rounds"]:
            if rnd["secs"]:
                for q, ss in rnd["secs"].items():
                    m[q] = min(m.get(q, 9e9), min(ss))
        mins[name] = m
    state["mins"] = mins
    state["load_end"] = round(os.getloadavg()[0], 2)
    with open(out_path, "w") as fh:
        json.dump(state, fh, indent=1)
    print(json.dumps({"mins": mins}))

if __name__ == "__main__":
    main()

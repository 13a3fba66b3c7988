"""Scale-checkpoint bench: time the headline queries in BOTH engines at
a staged scale factor (tools/stage_sf.py output), writing the artifact
INCREMENTALLY so a long run can be interrupted and resumed (--resume
skips queries already recorded in the outfile).

Unlike bench_multifile this skips the AQE-on transparency re-pass (at
multi-minute DuckDB walls it would double an hour-long run for a number
the sf0.1/sf1 artifacts already pin) and times each engine once after a
shared warmup — at this scale per-run noise is a rounding error against
the engine gap being measured.

DuckDB-side queries run in a KILLABLE SUBPROCESS with a per-query wall
cap (SCALE_BENCH_DUCK_TIMEOUT, default 600 s): at sf10 the heavy dedup
oracles' band self-joins grow superlinearly in DuckDB (d05 sf0.1->sf1
measured 0.9 s -> 55 s), and a recorded ">600 s" lower bound makes the
comparison point without spending hours — recorded as
duckdb_timeout[q] = cap, never silently dropped.

Usage: python tools/bench_scale_checkpoint.py <sf_dir> <out.json> [n_files] [--resume]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, ".")

from bench_multifile import ALL_TABLES, DEFAULT_QUERIES, stage  # noqa: E402

# Optional focus list: SCALE_BENCH_QUERIES=q1,q2,... benches exactly
# those registry queries instead of the headline set (used for the
# per-wave new-operator checkpoints).
_env_qs = os.environ.get("SCALE_BENCH_QUERIES")
if _env_qs:
    DEFAULT_QUERIES = [q.strip() for q in _env_qs.split(",") if q.strip()]

DUCK_TIMEOUT = float(os.environ.get("SCALE_BENCH_DUCK_TIMEOUT", "600"))

_DUCK_RUNNER = r"""
import json, os, sys, time
import duckdb
spec = json.load(open(sys.argv[1]))
con = duckdb.connect()
con.execute(f"SET threads={os.cpu_count()}")
con.execute("SET enable_progress_bar=false")  # progress bar would pollute stdout
for name, glob in spec["views"].items():
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{glob}')")
con.execute(spec["warmup"]).fetchall()
t = time.time()
con.execute(spec["sql"]).fetchall()
out = json.dumps({"sec": round(time.time() - t, 3)})
with open(spec["result_path"], "w") as fh:  # result via file: stdout is unreliable
    fh.write(out)
print(out)
"""


def run_duck_subprocess(views: dict, warmup: str, sql: str) -> dict:
    """Execute one oracle in a killable child; returns {"sec": float}
    or {"timeout": DUCK_TIMEOUT}. The child re-creates the views and
    warms the catalog before timing, so the measured window matches the
    in-process path."""
    result_path = tempfile.mktemp(suffix=".result.json")
    with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as fh:
        json.dump(
            {"views": views, "warmup": warmup, "sql": sql, "result_path": result_path},
            fh,
        )
        spec_path = fh.name
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _DUCK_RUNNER, spec_path],
            capture_output=True,
            text=True,
            timeout=DUCK_TIMEOUT,
        )
        if os.path.exists(result_path):
            with open(result_path) as fh:
                return json.load(fh)
        if proc.returncode != 0:
            return {"error": proc.stderr.strip()[-500:]}
        return {"error": "no result file"}
    except subprocess.TimeoutExpired:
        return {"timeout": DUCK_TIMEOUT}
    finally:
        os.unlink(spec_path)
        if os.path.exists(result_path):
            os.unlink(result_path)


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--resume"]
    resume = "--resume" in sys.argv
    sf_dir = args[0]
    out_path = args[1]
    n_files = int(args[2]) if len(args) > 2 else 16

    from polars_readstat_rs_spark.operators.dedup import release_cached
    from polars_readstat_rs_spark.queries import ORACLES, QUERIES
    from polars_readstat_rs_spark.session import get_spark

    spark = get_spark("bench-scale-checkpoint")
    spark.sparkContext.setLogLevel("ERROR")

    staged = stage(sf_dir, n_files)

    state: dict = {
        "metric": "scale_checkpoint",
        "sf_dir": sf_dir,
        "n_files": n_files,
        # record the profile: at sf>=10 the sf0.1-tuned local default
        # (16 shuffle partitions, AQE off) spills GBs per task — these
        # runs use the cluster profile (AQE on + high initial partition
        # count for coalescing), set via SPARK_GRAFT_AQE/SPARK_GRAFT_SHUFFLE
        "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
        "aqe": spark.conf.get("spark.sql.adaptive.enabled"),
        "spark": {},
        "duckdb": {},
        "status": "running",
    }
    if resume and os.path.exists(out_path):
        with open(out_path) as fh:
            prev = json.load(fh)
        state["spark"].update(prev.get("spark", {}))
        state["duckdb"].update(prev.get("duckdb", {}))
        state["duckdb_timeout"] = dict(prev.get("duckdb_timeout", {}))

    def save() -> None:
        sp, du = state["spark"], state["duckdb"]
        both = [q for q in sp if q in du]
        state["spark_total"] = round(sum(sp.values()), 3)
        state["duckdb_total"] = round(sum(du.values()), 3)
        if both:
            sp_b = sum(sp[q] for q in both)
            du_b = sum(du[q] for q in both)
            state["ratio_all_queries"] = round(sp_b / max(du_b, 1e-9), 3)
        with open(out_path, "w") as fh:
            json.dump(state, fh, indent=1)

    views = {}
    for name in ALL_TABLES:
        path = os.path.join(staged, f"{name}.parquet")
        views[name] = f"{path}/*.parquet" if os.path.isdir(path) else path

    def run_spark(q: str) -> None:
        spark.catalog.clearCache()
        out = QUERIES[q](spark, staged)
        out.write.format("noop").mode("overwrite").save()
        release_cached(out)

    # warmup: JVM codegen + parquet footers, AND the Python worker pool —
    # mapInPandas/pandas_udf queries otherwise pay every worker's
    # numpy/pandas import inside their single timed run (measured ~12 s
    # on a 32-worker pool for a query whose warm wall is 0.65 s); bench.py
    # never sees this because its min-of-N reuses the workers.
    run_spark("q01_pricing_summary")
    import pandas as _pd

    def _warm_workers(batches):
        for b in batches:
            yield _pd.DataFrame({"n": [len(b)]})

    (
        spark.range(100_000)
        .repartition(int(spark.sparkContext.defaultParallelism))
        .mapInPandas(_warm_workers, "n long")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    t0 = time.time()
    state["spark_empty_job_sec"] = round(
        (lambda: (spark.range(1).write.format("noop").mode("overwrite").save(), time.time() - t0)[1])(), 3
    )

    for q in DEFAULT_QUERIES:
        if q not in state["spark"]:
            t = time.time()
            run_spark(q)
            state["spark"][q] = round(time.time() - t, 3)
            print(json.dumps({"engine": "spark", "q": q, "sec": state["spark"][q]}), flush=True)
            save()
    state.setdefault("duckdb_timeout", {})
    warmup_sql = ORACLES["q01_pricing_summary"]
    for q in DEFAULT_QUERIES:
        if q in state["duckdb"] or q in state["duckdb_timeout"]:
            continue
        r = run_duck_subprocess(views, warmup_sql, ORACLES[q])
        if "sec" in r:
            state["duckdb"][q] = r["sec"]
        elif "timeout" in r:
            state["duckdb_timeout"][q] = r["timeout"]
        else:
            state.setdefault("duckdb_errors", {})[q] = r.get("error", "?")
        print(json.dumps({"engine": "duckdb", "q": q, **r}), flush=True)
        save()
    state["status"] = "complete"
    save()
    print(json.dumps({"done": out_path, "ratio_all_queries": state.get("ratio_all_queries")}))


if __name__ == "__main__":
    main()

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

# SCALE_BENCH_RUNS=N times each query N times in BOTH engines and
# records the min. Default 1 (single-shot) — right for minutes-long
# walls where per-run noise is a rounding error; set 3 for short-query
# re-records where Spark's first run carries ~1 s of codegen compile
# that any steady-state deployment amortizes (and DuckDB's first run
# carries its own buffer-pool fill).
RUNS = max(1, int(os.environ.get("SCALE_BENCH_RUNS", "1")))

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
best = None
budget = spec.get("per_run_cap", 600.0)
spent = 0.0
for _ in range(spec.get("runs", 1)):
    t = time.time()
    con.execute(spec["sql"]).fetchall()
    dt = time.time() - t
    best = dt if best is None or dt < best else best
    spent += dt
    # stop early rather than risk the parent's kill: min-of-completed
    # is recorded, and the per-run ">cap" timeout claim stays honest
    if spent + best > budget:
        break
out = json.dumps({"sec": round(best, 3)})
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
            {"views": views, "warmup": warmup, "sql": sql,
             "result_path": result_path, "runs": RUNS,
             "per_run_cap": DUCK_TIMEOUT},
            fh,
        )
        spec_path = fh.name
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _DUCK_RUNNER, spec_path],
            capture_output=True,
            text=True,
            # the child self-limits its timed runs to ~2x per_run_cap of
            # cumulative work (stops early, records min-of-completed), so
            # with a cap's allowance for warmup the parent kill at 3x only
            # fires when a single run genuinely can't fit the cap — the
            # recorded ">cap" stays a true per-run lower bound under
            # SCALE_BENCH_RUNS > 1 instead of a multi-run artifact
            timeout=DUCK_TIMEOUT * 3,
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

    # Scale profile IS the default here (r10 verdict item 2): these
    # checkpoints run at sf>=1 where the sf0.1-tuned local defaults are
    # wrong — shuffle partitions must scale with data, and SHJ's
    # sort-skip wins ~35% on the big equi-joins (q05 11.6 -> 7.3 s at
    # sf10, measured r10). It's the call a cluster's AQE would make
    # per-join from runtime sizes. Env vars still override.
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "96")
    # NOTE on splits: the r11 knob matrix (KNOB_MATRIX_SF10_r11.jsonl)
    # measured SPARK_GRAFT_MAXPART=64m ~15% faster than the 16m default
    # on the sf10 scan-bound aggregates (q01 1.747 vs 2.064 s) in a
    # controlled same-session A/B. It stays OPT-IN here: a continuation
    # attempt to re-record the weak set under 64m hit sustained host
    # load waves (min-of-3 walls swung 2-6x in BOTH engines across BOTH
    # profiles — q01 9.25 s at 16m, DuckDB q05 17.9 s), so no clean
    # artifact validates flipping the recorded default.

    from polars_readstat_rs_spark.operators.dedup import release_cached
    from polars_readstat_rs_spark.queries import ORACLES, QUERIES
    from polars_readstat_rs_spark.session import get_spark

    spark = get_spark("bench-scale-checkpoint")
    spark.sparkContext.setLogLevel("ERROR")

    # SHJ boundary (measured r10): v05's band-explosion self-join spills
    # the per-partition hash build over all free disk (~70 GB at sf10)
    # — it keeps SortMergeJoin. d03/d05 ran clean under SHJ at sf10, so
    # only the measured spiller is excluded. preferSortMergeJoin is a
    # runtime conf, so the choice is per-query.
    SMJ_QUERIES = {"v05_srp_neardup"}
    shj_default = os.environ.get("SPARK_GRAFT_SCALE_SHJ", "1") == "1"

    # Per-query scan-split pins (r14, Q01_DECOMP_r14.json +
    # KNOB_Q01_AB_r14.json): the session factory's 16m default exists
    # for SMALL single-file tables (use the cores on a 25 MB parquet);
    # at sf10 a scan-bound aggregate pays ~160 task setups on the
    # 1.3 GB lineitem instead of ~40. 64m measured 15-20% faster for
    # q01 across two shapes and two sessions (2.15->1.85, 1.61->1.35 s)
    # with no other query sharing the pinned conf — the same call a
    # cluster profile makes by keeping the 128m default. Per-query,
    # like SMJ_QUERIES, so join-heavy queries keep the measured 16m.
    MAXPART_QUERIES = {"q01_pricing_summary": "64m"}
    _maxpart_default = os.environ.get("SPARK_GRAFT_MAXPART", "16m")

    def set_join_profile(q: str) -> None:
        prefer_smj = (not shj_default) or q in SMJ_QUERIES
        spark.conf.set("spark.sql.join.preferSortMergeJoin", str(prefer_smj).lower())
        spark.conf.set(
            "spark.sql.files.maxPartitionBytes", MAXPART_QUERIES.get(q, _maxpart_default)
        )

    staged = stage(sf_dir, n_files)

    # Warm the page cache over every staged parquet before any timing
    # (SCALE_BENCH_WARM_CACHE=0 to skip). Root cause from the r11
    # continuation: a re-record attempt read the 1.8 GB sf10 lineitem
    # COLD at ~115 MB/s every run (q01 9-16 s vs the artifact's 2.1 s)
    # because the staged files had been evicted — while the small q24
    # table stayed cached and matched. Warm-cache is the recorded
    # condition of every BENCH_SF10 artifact, so make it explicit and
    # note it in the artifact instead of inheriting whatever the last
    # job left in the cache.
    warm = os.environ.get("SCALE_BENCH_WARM_CACHE", "1") == "1"
    if warm:
        for root, _dirs, files in os.walk(staged):
            for fn in files:
                if fn.endswith(".parquet"):
                    with open(os.path.join(root, fn), "rb") as fh:
                        while fh.read(1 << 24):
                            pass

    state: dict = {
        "metric": "scale_checkpoint",
        "page_cache_warmed": warm,
        "sf_dir": sf_dir,
        "n_files": n_files,
        # record the profile: at sf>=10 the sf0.1-tuned local default
        # (16 shuffle partitions, AQE off) spills GBs per task — these
        # runs use the cluster profile (AQE on + high initial partition
        # count for coalescing), set via SPARK_GRAFT_AQE/SPARK_GRAFT_SHUFFLE
        "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
        "aqe": spark.conf.get("spark.sql.adaptive.enabled"),
        "shj_default": shj_default,
        "smj_queries": sorted(SMJ_QUERIES),
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
        state["spark_floor"] = dict(prev.get("spark_floor", {}))

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
        set_join_profile(q)
        out = QUERIES[q](spark, staged)
        out.write.format("noop").mode("overwrite").save()
        release_cached(out)

    # warmup: JVM codegen + parquet footers, AND the Python worker pool —
    # mapInPandas/pandas_udf queries otherwise pay every worker's
    # numpy/pandas import inside their single timed run (measured ~12 s
    # on a 32-worker pool for a query whose warm wall is 0.65 s); bench.py
    # never sees this because its min-of-N reuses the workers.
    import pandas as _pd

    def _warm_workers(batches):
        for b in batches:
            yield _pd.DataFrame({"n": [len(b)]})

    def _warm_session() -> None:
        run_spark("q01_pricing_summary")
        (
            spark.range(100_000)
            .repartition(int(spark.sparkContext.defaultParallelism))
            .mapInPandas(_warm_workers, "n long")
            .write.format("noop")
            .mode("overwrite")
            .save()
        )

    _warm_session()

    # SCALE_BENCH_FRESH_SESSION=1: restart the JVM before each timed
    # query (then re-warm codegen + the worker pool). The r13 p04/t04
    # adjudication found the full-set artifact's walls carry whatever
    # executor-heap/GC state the previous 16 queries left behind —
    # p04 read 3.07x in the r12 full-set run but 0.88x in a fresh
    # session. Costs ~10 s/query of untimed restart; use it when
    # re-measuring weak-set suspects so session state can't masquerade
    # as a regression.
    fresh_session = os.environ.get("SCALE_BENCH_FRESH_SESSION", "0") == "1"

    def _restart_session() -> None:
        nonlocal spark
        spark.stop()
        spark = get_spark("bench-scale-checkpoint")
        spark.sparkContext.setLogLevel("ERROR")
        _warm_session()

    # Quiesce gate (r10 verdict item 3 — the sf1 artifact carried
    # internally inconsistent walls taken in a host load wave): same
    # empty-job-floor wait as bench.py, re-checked before EVERY timed
    # query because a single-shot scale run is long enough to span the
    # host's ~10-minute contention waves. Gate on the measured floor,
    # never loadavg (this VM shows phantom loadavg with zero local
    # processes).
    idle_floor = float(os.environ.get("SPARK_GRAFT_IDLE_FLOOR", "0.12"))
    # >=1: the floor is always measured (tries=1 disables only the WAIT)
    quiesce_tries = max(1, int(os.environ.get("SPARK_GRAFT_QUIESCE_TRIES", "12")))

    def _empty_job_floor(runs: int = 3) -> float:
        best = None
        for _ in range(runs):
            t0 = time.time()
            spark.range(1).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            if best is None or dt < best:
                best = dt
        return best

    def quiesce() -> tuple[float, int]:
        floor, attempts = None, 0
        for attempts in range(1, quiesce_tries + 1):
            floor = _empty_job_floor()
            if floor <= idle_floor or attempts == quiesce_tries:
                break
            print(
                f"quiesce: empty-job floor {floor:.3f}s > {idle_floor}s "
                f"(attempt {attempts}/{quiesce_tries}); machine busy, waiting",
                file=sys.stderr,
                flush=True,
            )
            time.sleep(10)
        return floor, attempts

    floor0, attempts0 = quiesce()
    state["spark_empty_job_sec"] = round(floor0, 4)
    state["quiesce_attempts"] = attempts0
    state["spark_floor"] = dict(state.get("spark_floor", {}))

    state["runs"] = RUNS
    state["fresh_session_per_query"] = fresh_session
    first_timed = True
    for q in DEFAULT_QUERIES:
        if q not in state["spark"]:
            if fresh_session and not first_timed:
                _restart_session()
            first_timed = False
            f, _ = quiesce()
            best = None
            spent = 0.0
            for _i in range(RUNS):
                t = time.time()
                run_spark(q)
                dt = time.time() - t
                best = dt if best is None or dt < best else best
                spent += dt
                # same cumulative budget rule as the DuckDB child: min
                # of completed runs, stop early rather than triple a
                # minutes-long wall (noise there is a rounding error)
                if spent + best > DUCK_TIMEOUT:
                    break
            state["spark"][q] = round(best, 3)
            state["spark_floor"][q] = round(f, 4)
            print(json.dumps({"engine": "spark", "q": q, "sec": state["spark"][q], "floor": round(f, 4)}), flush=True)
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

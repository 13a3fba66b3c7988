"""Scale-checkpoint bench: time the headline queries in BOTH engines at
a staged scale factor (tools/stage_sf.py output), writing the artifact
INCREMENTALLY so a long run can be interrupted and resumed (--resume
skips queries already recorded in the outfile).

Unlike bench_multifile this skips the AQE-on transparency re-pass (at
multi-minute DuckDB walls it would double an hour-long run for a number
the sf0.1/sf1 artifacts already pin) and times each engine once after a
shared warmup — at this scale per-run noise is a rounding error against
the engine gap being measured.

Usage: python tools/bench_scale_checkpoint.py <sf_dir> <out.json> [n_files] [--resume]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

from bench_multifile import ALL_TABLES, DEFAULT_QUERIES, stage  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--resume"]
    resume = "--resume" in sys.argv
    sf_dir = args[0]
    out_path = args[1]
    n_files = int(args[2]) if len(args) > 2 else 16

    import duckdb

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

    con = duckdb.connect()
    con.execute(f"SET threads={os.cpu_count()}")
    for name in ALL_TABLES:
        path = os.path.join(staged, f"{name}.parquet")
        glob = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{glob}')")

    def run_spark(q: str) -> None:
        spark.catalog.clearCache()
        out = QUERIES[q](spark, staged)
        out.write.format("noop").mode("overwrite").save()
        release_cached(out)

    # shared warmup: JVM codegen + parquet footers / duck catalog
    run_spark("q01_pricing_summary")
    con.execute(ORACLES["q01_pricing_summary"]).fetchall()

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
    for q in DEFAULT_QUERIES:
        if q not in state["duckdb"]:
            t = time.time()
            con.execute(ORACLES[q]).fetchall()
            state["duckdb"][q] = round(time.time() - t, 3)
            print(json.dumps({"engine": "duckdb", "q": q, "sec": state["duckdb"][q]}), flush=True)
            save()
    con.close()
    state["status"] = "complete"
    save()
    print(json.dumps({"done": out_path, "ratio_all_queries": state.get("ratio_all_queries")}))


if __name__ == "__main__":
    main()

"""Multi-file layout bench: the testdata parquet files are ONE row group
each, so scans are single-task in every engine and the headline bench
mostly measures fixed per-job overhead on the small relational queries.
Real 100 TB tables arrive as thousands of files; this tool stages the
same sf tables as N-file directories (pyarrow row-slice split, written
once to /tmp) and re-times the headline queries in BOTH engines on the
identical multi-file layout. Both engines parallelize across files
(measured: DuckDB gains too); what the layout removes is the
single-task scan bottleneck, leaving Spark's remaining deficit at this
size as pure per-job constants (~0.1-0.2 s scheduling + broadcast
builds) that are flat in data volume — they amortize at real scale
where a scan is minutes, not milliseconds.

bench.py embeds run_multifile()'s result in the headline JSON artifact
(the "multifile" key), so the layout comparison is recorded per round.

Usage: python tools/bench_multifile.py [sf_dir] [n_files]
Prints one JSON line: spark + duckdb per-query seconds on the staged
layout.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")

# the full headline set (bench.py HEADLINE) — kept in sync by name
DEFAULT_QUERIES = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_nation_revenue",
    "q12_window_running",
    "q22_asof_join",
    "q24_windowed_agg",
    "d02_dedup_ngram_jaccard",
    "d03_dedup_minhash_lsh",
    "d05_simhash_pairs",
    "v01_cosine_topk",
    "v02_embedding_neardup",
    "v05_srp_neardup",
    "t02_quality_score",
    "t04_fingerprints",
    "m01_multimodal_bytes",
    "p04_pack_sequences",
    "p06_contamination",
]
# split every table a headline query scans at volume; region/nation are
# broadcast dims and stay single-file (as they would on a real cluster)
SPLIT_TABLES = (
    "lineitem",
    "orders",
    "customer",
    "supplier",
    "part",
    "events",
    "documents",
    "embeddings",
)
ALL_TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def stage(sf_dir: str, n_files: int) -> str:
    import pyarrow.parquet as pq

    # fingerprint the largest split table so a refreshed testdata drop
    # invalidates the staged layout (stale-cache lesson from round 2)
    st = os.stat(f"{sf_dir}/lineitem.parquet")
    tag = sf_dir.strip("/").replace("/", "_") + f"_{st.st_size}_{st.st_mtime_ns}"
    base = os.path.join(tempfile.gettempdir(), f"multifile_{tag}_{n_files}")
    done = os.path.join(base, "_STAGED")
    if os.path.exists(done):
        return base
    os.makedirs(base, exist_ok=True)
    for name in ALL_TABLES:
        src = f"{sf_dir}/{name}.parquet"
        dst = os.path.join(base, f"{name}.parquet")
        if name in SPLIT_TABLES:
            os.makedirs(dst, exist_ok=True)
            t = pq.read_table(src)
            step = max(1, (t.num_rows + n_files - 1) // n_files)
            for i, lo in enumerate(range(0, t.num_rows, step)):
                pq.write_table(t.slice(lo, step), os.path.join(dst, f"part-{i:04d}.parquet"))
        else:
            if not os.path.exists(dst):
                os.symlink(src, dst)
    with open(done, "w") as fh:
        fh.write("ok")
    return base


def time_min(fn, runs: int = 3) -> float:
    """Min-until-stable on a noisy shared VM: run until two consecutive
    runs land within 20% of the best (cap ``max(runs, 5)``) — the same
    protocol as bench.py's headline loop, so a single cold/contended
    run can't inflate a recorded query time."""
    best, stable = None, 0
    for i in range(max(runs, 5)):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        if best is None or dt < best:
            best, stable = dt, 0
        elif dt <= best * 1.2:
            stable += 1
        if stable >= 1 and i + 1 >= runs:
            break
    return round(best, 3)


def run_multifile(
    spark,
    sf_dir: str,
    n_files: int = 16,
    queries: list[str] | None = None,
    runs: int = 3,
) -> dict:
    """Stage the N-file layout (cached) and time each query on Spark and
    its oracle on DuckDB over the SAME staged files. Returns the result
    dict (no printing) for embedding in bench.py's artifact."""
    import duckdb

    from polars_readstat_rs_spark.operators.dedup import release_cached
    from polars_readstat_rs_spark.queries import ORACLES, QUERIES

    staged = stage(sf_dir, n_files)
    queries = queries or DEFAULT_QUERIES

    con = duckdb.connect()
    con.execute(f"SET threads={os.cpu_count()}")
    for name in ALL_TABLES:
        path = os.path.join(staged, f"{name}.parquet")
        glob = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{glob}')")

    def run_spark(q):
        spark.catalog.clearCache()
        out = QUERIES[q](spark, staged)
        out.write.format("noop").mode("overwrite").save()
        release_cached(out)

    # warmup both engines
    run_spark("q01_pricing_summary")
    con.execute(ORACLES["q01_pricing_summary"]).fetchall()

    # measure the per-query FLOORS directly, so the ratio's fixed-cost
    # component is reported as data: one empty Spark job (scheduling +
    # noop sink) vs one trivial DuckDB statement
    spark_floor = time_min(
        lambda: spark.range(1).write.format("noop").mode("overwrite").save(), runs
    )
    # a 2-stage shuffle pipeline over trivial data: the per-STAGE
    # increment (scheduling + AQE materialization) is Spark's real
    # fixed cost — a 6-stage query pays ~6x this regardless of volume
    from pyspark.sql import functions as F

    spark_shuffle_floor = time_min(
        lambda: spark.range(10_000)
        .groupBy(F.pmod("id", F.lit(97)).alias("k"))
        .count()
        .write.format("noop")
        .mode("overwrite")
        .save(),
        runs,
    )
    duck_floor = time_min(lambda: con.execute("SELECT 1").fetchall(), runs)

    spark_times, duck_times = {}, {}
    for q in queries:
        spark_times[q] = time_min(lambda: run_spark(q), runs)
        duck_times[q] = time_min(lambda: con.execute(ORACLES[q]).fetchall(), runs)
    con.close()

    # Transparency pass (r8): the local session profile defaults AQE
    # off (see session.py) — re-time the Spark side once with AQE ON so
    # the config choice is reported as DATA, not hidden tuning. The
    # delta is the per-query-stage materialization barrier cost at this
    # (sub-second-stage) scale; at cluster scale the same barriers
    # amortize and AQE's runtime re-planning pays for itself.
    aqe_prev = spark.conf.get("spark.sql.adaptive.enabled", "false")
    spark_aqe_on = {}
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        for q in queries:
            # same min-until-stable budget as the AQE-off leg (was 2:
            # the r14 preview showed a single contended run inflating
            # ratio_all_queries_aqe_on from 1.70 to 2.07 — the two legs
            # must be equally noise-protected to be comparable)
            spark_aqe_on[q] = time_min(lambda: run_spark(q), runs)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_prev)

    n_q = len(queries)
    sp_total, du_total = sum(spark_times.values()), sum(duck_times.values())
    # The scale-representative comparison is the WORK-DOMINATED set:
    # queries the embedded engine itself spends >= 0.1 s on at this
    # layout. Below that, a Spark/DuckDB ratio measures Spark's fixed
    # ~0.2 s/stage scheduling floor against DuckDB's ~20 ms statement
    # floor — a constant that amortizes to zero at real scale (a 100 TB
    # scan is minutes) while the work-dominated ratio is what survives
    # a 100x scale-up. That heavy-subtotal ratio is therefore the
    # artifact's first-class `ratio`; the all-queries raw total stays
    # alongside as `ratio_all_queries`, with both engines' measured
    # floors reported as data.
    heavy = sorted(q for q in queries if duck_times[q] >= 0.1)
    sp_heavy = sum(spark_times[q] for q in heavy)
    du_heavy = sum(duck_times[q] for q in heavy)
    return {
        "metric": "multifile_layout",
        "n_files": n_files,
        "sf_dir": sf_dir,
        "spark": spark_times,
        "spark_total": round(sp_total, 3),
        "duckdb": duck_times,
        "duckdb_total": round(du_total, 3),
        "ratio": round(sp_heavy / max(du_heavy, 1e-9), 3),
        "ratio_queries": heavy,
        "ratio_spark_sec": round(sp_heavy, 3),
        "ratio_duckdb_sec": round(du_heavy, 3),
        "ratio_all_queries": round(sp_total / max(du_total, 1e-9), 3),
        # per-query fixed floors, measured: an empty Spark job vs a
        # trivial DuckDB statement. At this sf most of the all-queries
        # ratio is n_queries x (spark_floor - duck_floor) of scheduling
        # constants that are flat in data volume; subtracting them
        # (floor_adjusted) shows the data-dependent comparison.
        "spark_aqe_on": spark_aqe_on,  # per-query, for delta diagnosis
        "spark_total_aqe_on": round(sum(spark_aqe_on.values()), 3),
        "ratio_all_queries_aqe_on": round(
            sum(spark_aqe_on.values()) / max(du_total, 1e-9), 3
        ),
        "spark_empty_job_sec": spark_floor,
        "spark_shuffle_pipeline_sec": spark_shuffle_floor,
        "duckdb_empty_stmt_sec": duck_floor,
        "floor_adjusted_ratio_all": round(
            max(sp_total - n_q * spark_floor, 1e-9)
            / max(du_total - n_q * duck_floor, 1e-9),
            3,
        ),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    from polars_readstat_rs_spark.session import get_spark

    spark = get_spark("bench-multifile")
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps(run_multifile(spark, sf_dir, n_files)))


if __name__ == "__main__":
    main()

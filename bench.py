"""Headline benchmark: runs the flagship queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced to full materialization through the noop sink (no
driver collect — the measured path is scan → compute → discard, which is
the cluster-relevant shape).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from polars_readstat_rs_spark.queries import QUERIES
from polars_readstat_rs_spark.session import get_spark

# The 14-query set benched in round 1 — kept stable (by NAME, not list
# position: v05/p04/p06 were later inserted mid-list) so round-over-round
# totals stay comparable; extensions are reported separately via
# value_r1set vs value.
R1_SET = {
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
    "t02_quality_score",
    "t04_fingerprints",
    "m01_multimodal_bytes",
}
HEADLINE = [
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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.0

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers once so per-query times measure compute
    try:
        QUERIES["q01_pricing_summary"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    except Exception as exc:  # warmup failure must not zero the whole bench
        print(f"warmup failed: {exc!r}", file=sys.stderr)

    # Quiesce gate (r9 verdict item 4): the headline wall "regressed" two
    # rounds running purely from machine load at driver-bench time. Wait
    # (bounded) until the empty-job floor reaches its idle value (~0.055 s
    # on this VM) before measuring, and record floor + loadavg so the
    # artifact itself shows the conditions it was taken under.
    def _empty_job_floor(runs: int = 3) -> float:
        best = None
        for _ in range(runs):
            t0 = time.time()
            spark.range(1).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            if best is None or dt < best:
                best = dt
        return best

    idle_floor = float(os.environ.get("SPARK_GRAFT_IDLE_FLOOR", "0.12"))
    quiesce_tries = int(os.environ.get("SPARK_GRAFT_QUIESCE_TRIES", "12"))
    floor = None
    attempts = 0
    for attempts in range(1, quiesce_tries + 1):
        floor = _empty_job_floor()
        if floor <= idle_floor or attempts == quiesce_tries:
            break
        print(
            f"quiesce: empty-job floor {floor:.3f}s > {idle_floor}s "
            f"(attempt {attempts}/{quiesce_tries}); machine busy, waiting",
            file=sys.stderr,
        )
        time.sleep(10)

    times: dict[str, float] = {}
    errors: dict[str, str] = {}
    run_counts: dict[str, int] = {}
    for name in HEADLINE:
        # per-query isolation: one broken query must not zero out the
        # round's entire perf signal (BENCH_r02 died at its 4th query).
        # noisy-neighbor shared VM: retry until the min stabilizes
        # (two consecutive runs within 20% of the best), cap 5 runs.
        # The try wraps EACH run so a transient failure can't discard an
        # already-measured best; a query only reports FAILED when no run
        # succeeded at all.
        best = None
        stable = 0
        runs = 0
        for _ in range(7):
            runs += 1
            try:
                spark.catalog.clearCache()
                t0 = time.time()
                QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
            except Exception as exc:
                errors[name] = f"{type(exc).__name__}: {exc}"[:300]
                print(f"{name} run failed: {errors[name]}", file=sys.stderr)
                continue
            if best is None or dt < best:
                best = dt
                stable = 0
            elif dt <= best * 1.2:
                stable += 1
            if stable >= 2 and _ >= 3:
                break
        if best is not None:
            times[name] = round(best, 3)
            run_counts[name] = runs
            errors.pop(name, None)  # a later run succeeded

    total = round(sum(times.values()), 3)
    r1_total = round(sum(times[n] for n in R1_SET if n in times), 3)

    # Same-run DuckDB baseline over the IDENTICAL single-file inputs
    # (r9): round-over-round absolute wall times are confounded by VM
    # speed drift — replaying r7's exact tree in the r9 environment
    # measured 11.68 s vs its recorded 7.93 s (47% machine drift), while
    # r8's code was 2.25 s FASTER than r7's code under identical
    # conditions. The stable round-over-round metric is therefore the
    # ratio to a same-run DuckDB baseline, not the absolute total.
    duck_total = None
    try:
        import duckdb

        from polars_readstat_rs_spark.queries import ORACLES

        con = duckdb.connect()
        con.execute(f"SET threads={os.cpu_count()}")
        for tname in (
            "region nation customer supplier part orders "
            "lineitem events documents embeddings"
        ).split():
            con.execute(
                f"CREATE VIEW {tname} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{tname}.parquet')"
            )
        con.execute(ORACLES["q01_pricing_summary"]).fetchall()  # warmup
        duck_times: dict[str, float] = {}
        for name in HEADLINE:
            if name not in times or name not in ORACLES:
                continue
            best_d = None
            for _ in range(3):
                t0 = time.time()
                con.execute(ORACLES[name]).fetchall()
                dt = time.time() - t0
                if best_d is None or dt < best_d:
                    best_d = dt
            duck_times[name] = best_d
        con.close()
        duck_total = round(sum(duck_times.values()), 3)
    except Exception as exc:
        print(f"duckdb headline baseline failed: {exc!r}", file=sys.stderr)

    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "value_r1set": r1_total,
        "queries": times,
        "sf": sf,
        # min-until-stable discipline (r7 verdict task 7): every reported
        # time is the min over `runs` (3-7 per query; two consecutive runs
        # within 20% of the best required), so round-over-round deltas are
        # attributable to code, not noisy-neighbor VM jitter.
        "runs": min(run_counts.values()) if run_counts else 0,
        "runs_max": max(run_counts.values()) if run_counts else 0,
        # machine-condition telemetry: the empty-job floor measured just
        # before the headline loop (idle ~0.055 s on this VM), how many
        # quiesce waits it took to get there, and the 1-minute loadavg —
        # so a drifted wall number is attributable from the artifact.
        "spark_empty_job_sec": round(floor, 4) if floor is not None else None,
        "quiesce_attempts": attempts,
        "load_avg_1m": round(os.getloadavg()[0], 2),
    }
    if duck_total is not None:
        # machine-drift-immune headline metric: both engines timed in
        # THIS run on the identical single files
        out["duckdb_value"] = duck_total
        out["ratio_headline"] = round(total / max(duck_total, 1e-9), 3)
    if errors:
        # totals over a PARTIAL query set are not comparable round-over-
        # round — flag it loudly so a shrunken sum can't read as a win
        out["errors"] = errors
        out["partial"] = True

    # Multi-file layout comparison (first-class artifact since r4): the
    # single-file testdata parquets are ONE row group each, so the small
    # relational queries above mostly measure fixed per-job constants.
    # The staged N-file layout is the 100 TB-representative shape; both
    # engines are timed on the identical staged files.
    multifile = None
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools"))
        from bench_multifile import run_multifile

        multifile = run_multifile(spark, sf_dir, n_files=16, runs=3)
    except Exception as exc:  # the layout bench must never zero the headline
        out["multifile_error"] = f"{type(exc).__name__}: {exc}"[:300]

    # Two-line output contract (r6 verdict task 2): the driver captures
    # only the TAIL of stdout and parses the FINAL line as JSON. r5/r6
    # put the full multifile per-query detail on the final line (~3.8 kB)
    # and the capture window clipped its head -> "parsed": null two
    # rounds running. So: full detail goes on an EARLIER line; the final
    # line is a compact summary (scalars only from multifile) that must
    # stay well inside the window.
    if multifile is not None:
        print(json.dumps({"metric": "multifile_detail", "multifile": multifile}))
        out["multifile"] = {
            k: multifile[k]
            for k in (
                "n_files",
                "spark_total",
                "spark_total_aqe_on",
                "duckdb_total",
                "ratio",
                "ratio_all_queries",
                "ratio_all_queries_aqe_on",
                "floor_adjusted_ratio_all",
                "spark_shuffle_pipeline_sec",
            )
            if k in multifile
        }
    line = json.dumps(out)
    if len(line) > 1800:  # belt-and-braces: never exceed the tail window
        out.pop("multifile", None)
        out["truncated"] = True
        line = json.dumps(out)
    if len(line) > 1800 and errors:
        # many failing queries can push 17 x 300-char errors past the
        # window even with multifile gone — exactly the broken rounds
        # where the signal matters most. Truncate each error hard.
        out["errors"] = {k: v[:80] for k, v in errors.items()}
        line = json.dumps(out)
    if len(line) > 1800:
        # last resort: scalars only — always parseable
        line = json.dumps(
            {
                "metric": out["metric"],
                "value": out["value"],
                "unit": "sec",
                "value_r1set": out["value_r1set"],
                "sf": sf,
                "partial": out.get("partial", False),
                "truncated": True,
            }
        )
    print(line)


if __name__ == "__main__":
    main()

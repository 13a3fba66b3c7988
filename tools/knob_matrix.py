"""JVM aggregation knob matrix for the sf10 short-query constant
(q01/q24 — r10 verdict item 1): measure every plausibly-relevant
aggregation/scan knob at the staged scale factor and record a matrix
artifact, so the residual vs DuckDB is either closed or conclusively
bounded as engine-irreducible.

Runtime-settable knobs (one session, min-until-stable per cell,
empty-job-floor re-gated before every cell):
  twolevel  spark.sql.codegen.aggregate.map.twolevel.enabled
  vectorized spark.sql.codegen.aggregate.map.vectorized.enable
  sortagg   spark.sql.codegen.aggregate.sortAggregate.enabled

Static knobs (child process each — these take effect at session build
via the SPARK_GRAFT_* env path in session.py, NOT via spark.conf.set):
  offheap   SPARK_GRAFT_OFFHEAP=8g (execution memory + ColumnVectors)
  batch     SPARK_GRAFT_PARQUET_BATCH (columnarReaderBatchSize)
  maxpart   SPARK_GRAFT_MAXPART

Also records the scan/agg decomposition: scan+count floor and
scan+one-cents-sum over exactly the q01 column set, so the matrix
separates "parquet scan cost" from "hash agg constant".

Usage:
  python tools/knob_matrix.py <sf_dir> <out.jsonl> [n_files]      # full matrix
  python tools/knob_matrix.py <sf_dir> <out.jsonl> [n_files] --variant=NAME
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, ".")

from bench_multifile import stage, time_min  # noqa: E402

QUERIES_UNDER_TEST = ("q01_pricing_summary", "q24_windowed_agg")

RUNTIME_VARIANTS: dict[str, dict[str, str]] = {
    "base": {},
    "twolevel_off": {"spark.sql.codegen.aggregate.map.twolevel.enabled": "false"},
    "vectorized_on": {"spark.sql.codegen.aggregate.map.vectorized.enable": "true"},
    "twolevel_vectorized": {
        "spark.sql.codegen.aggregate.map.twolevel.enabled": "true",
        "spark.sql.codegen.aggregate.map.vectorized.enable": "true",
    },
    "sortagg_off": {"spark.sql.codegen.aggregate.sortAggregate.enabled": "false"},
}

STATIC_VARIANTS: dict[str, dict[str, str]] = {
    "offheap_8g": {"SPARK_GRAFT_OFFHEAP": "8g"},
    "batch_16k": {"SPARK_GRAFT_PARQUET_BATCH": "16384"},
    "maxpart_64m": {"SPARK_GRAFT_MAXPART": "64m"},
}


def _append(out_path: str, rec: dict) -> None:
    rec["ts"] = round(time.time(), 1)
    with open(out_path, "a") as fh:
        fh.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def run_variant(staged: str, out_path: str, variant: str) -> None:
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "96")
    from polars_readstat_rs_spark.queries import QUERIES
    from polars_readstat_rs_spark.session import get_spark

    spark = get_spark(f"knob-matrix-{variant}")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")

    def run_q(q: str) -> None:
        QUERIES[q](spark, staged).write.format("noop").mode("overwrite").save()

    # warm codegen + footers once
    run_q("q01_pricing_summary")
    idle_floor = float(os.environ.get("SPARK_GRAFT_IDLE_FLOOR", "0.12"))

    def quiesce() -> float:
        floor = None
        for _ in range(12):
            floor = time_min(
                lambda: spark.range(1).write.format("noop").mode("overwrite").save(),
                runs=3,
            )
            if floor <= idle_floor:
                break
            print(f"quiesce: floor {floor:.3f}s, waiting", file=sys.stderr, flush=True)
            time.sleep(10)
        return floor

    if variant == "q24_decomposition":
        # q24 closure (r11 verdict item 7): separate the tumbling-agg
        # query into its stage constants — 3-col events scan (noop),
        # scan + integer bucket + count (agg minus the cents sum), and
        # the full query — so the residual vs DuckDB is attributed to
        # scan floor + hash-agg constant, not plan shape.
        from pyspark.sql import functions as F

        ev_path = os.path.join(staged, "events.parquet")
        ecols = ["ts", "event_type", "value"]
        slide_us = 6 * 3600 * 1_000_000

        def ev_scan() -> None:
            spark.read.parquet(ev_path).select(ecols).write.format("noop").mode(
                "overwrite"
            ).save()

        def ev_bucket_count() -> None:
            us = F.unix_micros(F.col("ts").cast("timestamp"))
            (
                spark.read.parquet(ev_path)
                .select(ecols)
                .groupBy((us - F.pmod(us, F.lit(slide_us))).alias("_w"), "event_type")
                .count()
                .write.format("noop")
                .mode("overwrite")
                .save()
            )

        floor = quiesce()
        _append(
            out_path,
            {
                "variant": "q24_decomposition",
                "floor": round(floor, 4),
                "scan_3col_noop": round(time_min(ev_scan, runs=3), 3),
                "bucket_count": round(time_min(ev_bucket_count, runs=3), 3),
                "q24_full": round(
                    time_min(lambda: run_q("q24_windowed_agg"), runs=3), 3
                ),
            },
        )
        return

    todo = RUNTIME_VARIANTS if variant == "__runtime__" else {variant: {}}
    for name, confs in todo.items():
        # re-gate before EVERY matrix cell: a host contention wave
        # arriving mid-matrix would otherwise inflate later variants'
        # walls against a stale pre-wave floor (the exact artifact this
        # round's bench_scale_checkpoint fix addresses)
        floor = quiesce()
        for k, v in confs.items():
            spark.conf.set(k, v)
        rec: dict = {"variant": name, "floor": round(floor, 4)}
        for q in QUERIES_UNDER_TEST:
            rec[q] = round(time_min(lambda q=q: run_q(q), runs=3), 3)
        for k in confs:
            spark.conf.unset(k)
        _append(out_path, rec)

    if variant != "__runtime__":
        return

    # scan/agg decomposition over exactly q01's columns (scan floor vs
    # agg constant — both under the same session and floor)
    from pyspark.sql import functions as F

    li_path = os.path.join(staged, "lineitem.parquet")
    cols = [
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax", "l_shipdate",
    ]

    def scan_count() -> None:
        spark.read.parquet(li_path).select(cols).write.format("noop").mode("overwrite").save()

    def scan_one_sum() -> None:
        (
            spark.read.parquet(li_path)
            .select(cols)
            .agg(F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")))
            .write.format("noop").mode("overwrite").save()
        )

    floor = quiesce()
    _append(
        out_path,
        {
            "variant": "decomposition",
            "floor": round(floor, 4),
            "scan_7col_noop": round(time_min(scan_count, runs=3), 3),
            "scan_one_cents_sum": round(time_min(scan_one_sum, runs=3), 3),
        },
    )


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    variant = next(
        (a.split("=", 1)[1] for a in sys.argv[1:] if a.startswith("--variant=")), None
    )
    sf_dir, out_path = args[0], args[1]
    n_files = int(args[2]) if len(args) > 2 else 16
    staged = stage(sf_dir, n_files)

    if variant:
        run_variant(staged, out_path, variant)
        return

    # full matrix: runtime variants in-process, static ones as children
    run_variant(staged, out_path, "__runtime__")
    for name, env in STATIC_VARIANTS.items():
        child_env = dict(os.environ, **env)
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), sf_dir, out_path,
             str(n_files), f"--variant={name}"],
            env=child_env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        if r.returncode != 0:
            _append(out_path, {"variant": name, "error": f"child rc {r.returncode}"})


if __name__ == "__main__":
    main()

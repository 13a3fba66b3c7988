"""A/B: serial vs concurrent compaction-job submission.

Builds a hive-partitioned table with many partitions of small parquet
files (so the plan holds many independent rewrite jobs, each cheap —
the regime where driver submission latency dominates), then executes
an identical plan twice on fresh copies: max_concurrency=1 (the old
serial loop) vs the default pool. Verifies both runs are row-identical
to the source and writes one JSON line to COMPACT_AB_r12.json.

Usage: python tools/bench_compaction_ab.py [n_partitions] [files_per_part]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from polars_readstat_rs_spark.operators import maintenance  # noqa: E402


def build(spark, base: str, n_parts: int, files_per_part: int) -> None:
    n = n_parts * files_per_part * 50
    df = spark.range(n).select(
        (F.col("id") % n_parts).cast("string").alias("part"),
        F.col("id").alias("k"),
        (F.col("id") * 7 % 113).alias("v"),
    )
    df.repartition(n_parts * files_per_part, "k").write.partitionBy(
        "part"
    ).parquet(base)


def run_one(spark, base: str, max_concurrency: int) -> dict:
    manifest, id_to_path = maintenance.fs_file_manifest(spark, base)
    plan = maintenance.compaction_plan(
        manifest, target_bytes=1 << 30, small_threshold=1 << 30
    )
    t0 = time.perf_counter()
    stats = maintenance.execute_compaction(
        spark, plan, id_to_path, max_concurrency=max_concurrency
    )
    wall = time.perf_counter() - t0
    return {"wall_sec": round(wall, 3), **stats}


def main() -> None:
    n_parts = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    files_per = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.showConsoleProgress", "false")
        .appName("compact-ab")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    root = "/tmp/compact_ab"
    shutil.rmtree(root, ignore_errors=True)
    src = os.path.join(root, "src")
    build(spark, src, n_parts, files_per)
    truth = spark.read.parquet(src)
    truth_hash = truth.select(
        F.expr("bit_xor(xxhash64(part, k, v))").alias("h"), F.count("*").alias("n")
    ).collect()[0]

    out = {"n_partitions": n_parts, "files_per_part": files_per, "legs": {}}
    for label, conc in (("serial", 1), ("concurrent8", 8)):
        base = os.path.join(root, label)
        shutil.copytree(src, base)
        leg = run_one(spark, base, conc)
        got = spark.read.parquet(base).select(
            F.expr("bit_xor(xxhash64(part, k, v))").alias("h"),
            F.count("*").alias("n"),
        ).collect()[0]
        leg["row_identical"] = (got["h"] == truth_hash["h"]) and (
            got["n"] == truth_hash["n"]
        )
        out["legs"][label] = leg
    out["speedup"] = round(
        out["legs"]["serial"]["wall_sec"] / out["legs"]["concurrent8"]["wall_sec"], 2
    )
    print(json.dumps(out))
    with open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "COMPACT_AB_r12.json"), "w"
    ) as fh:
        json.dump(out, fh, indent=2)
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()

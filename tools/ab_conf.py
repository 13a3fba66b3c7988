"""Interleaved A/B of a runtime conf for one query (r15): run N
A/B pairs alternating in ONE session (A = session default, B = conf
applied), noop sink, min + all walls reported. Interleaving controls
for the JIT settling and host-load drift that make cross-session
comparisons lie (see OPTIMIZATION_r15.md).

Usage: python tools/ab_conf.py <sf_dir|staged> <query> <k=v[;k=v]> [pairs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tools")


def main() -> None:
    data_dir, qname, confs = sys.argv[1], sys.argv[2], sys.argv[3]
    pairs = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    kvs = [kv.split("=", 1) for kv in confs.split(";")]

    from polars_readstat_rs_spark.operators.dedup import release_cached
    from polars_readstat_rs_spark.queries import QUERIES
    from polars_readstat_rs_spark.session import get_spark

    spark = get_spark(f"ab-{qname}")
    spark.sparkContext.setLogLevel("ERROR")
    defaults = {k: spark.conf.get(k, None) for k, _ in kvs}

    staged = data_dir
    if not os.path.exists(os.path.join(data_dir, "_STAGED")) and os.path.exists(
        os.path.join(data_dir, "lineitem.parquet")
    ):
        from bench_multifile import stage

        staged = stage(data_dir, int(os.environ.get("SCALING_NFILES", "16")))

    QUERIES["q01_pricing_summary"](spark, staged).write.format("noop").mode(
        "overwrite"
    ).save()

    def run_once():
        spark.catalog.clearCache()
        t0 = time.time()
        out = QUERIES[qname](spark, staged)
        out.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        release_cached(out)
        return dt

    def quiesce(idle=0.12, attempts=12):
        f = None
        for _ in range(attempts):
            best = None
            for _ in range(3):
                t0 = time.time()
                spark.range(1).write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                best = dt if best is None or dt < best else best
            f = best
            if f <= idle:
                return f
            time.sleep(10)
        return f

    # BLOCK design, not row-interleave: alternating two distinct plans
    # per run doubles the fresh-codegen-class churn and C2 never
    # settles (measured: interleaved pairs read 4-58 s for the same
    # variant). Each block runs one variant to its settled state;
    # blocks alternate A,B,A,B so host drift hits both variants.
    walls = {"A": [], "B": []}
    floors = []
    for blk in range(2):
        for variant in ("A", "B"):
            if variant == "B":
                for k, v in kvs:
                    spark.conf.set(k, v)
            else:
                for k, _ in kvs:
                    if defaults[k] is None:
                        spark.conf.unset(k)
                    else:
                        spark.conf.set(k, defaults[k])
            floors.append(round(quiesce(), 4))
            for _ in range(pairs):
                walls[variant].append(round(run_once(), 3))
            print(
                json.dumps({"block": blk, "variant": variant, "walls": walls[variant][-pairs:], "floor": floors[-1]}),
                flush=True,
            )
    print(
        json.dumps(
            {
                "query": qname,
                "conf": confs,
                "pairs": pairs,
                "A_walls": walls["A"],
                "B_walls": walls["B"],
                "A_min": min(walls["A"]),
                "B_min": min(walls["B"]),
                "floors": floors,
                "load_avg_1m": round(os.getloadavg()[0], 2),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()

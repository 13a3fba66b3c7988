"""AQE-on overhead profile for the multifile leg (r13 verdict item 4).

Times each headline query on the staged 16-file layout with AQE off
and on (Spark only — the DuckDB side is unchanged by Spark conf), so
the per-query AQE stage-barrier cost is visible and any knob change in
the session factory's AQE branch can be A/B'd quickly.

Usage: python tools/profile_aqe_multifile.py [sf_dir] [runs]
       [--conf k=v ...]   extra confs applied ONLY to the AQE-on leg
       [--queries a,b]    subset of the headline set
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

from bench_multifile import DEFAULT_QUERIES, stage, time_min  # noqa: E402


def main() -> None:
    argv = sys.argv[1:]
    args, extra, subset = [], [], None
    i = 0
    while i < len(argv):
        if argv[i] == "--conf" and i + 1 < len(argv):
            if "=" not in argv[i + 1]:
                sys.exit(f"--conf needs key=value, got {argv[i + 1]!r}")
            extra.append(argv[i + 1].split("=", 1))
            i += 2
        elif argv[i] == "--queries" and i + 1 < len(argv):
            subset = argv[i + 1].split(",")
            i += 2
        else:
            args.append(argv[i])
            i += 1
    sf_dir = args[0] if args else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(args[1]) if len(args) > 1 else 2
    qset = subset or DEFAULT_QUERIES

    from polars_readstat_rs_spark.operators.dedup import release_cached
    from polars_readstat_rs_spark.queries import QUERIES
    from polars_readstat_rs_spark.session import get_spark

    spark = get_spark("profile-aqe-multifile")
    spark.sparkContext.setLogLevel("ERROR")
    staged = stage(sf_dir, 16)

    def run_spark(q):
        spark.catalog.clearCache()
        out = QUERIES[q](spark, staged)
        out.write.format("noop").mode("overwrite").save()
        release_cached(out)

    run_spark("q01_pricing_summary")  # warm

    # pin the off leg EXPLICITLY off and restore the session's actual
    # prior value afterwards — under SPARK_GRAFT_AQE=1 the factory
    # default is on, and assuming "off" would mislabel both legs
    # (r14 code-review finding)
    aqe_prev = spark.conf.get("spark.sql.adaptive.enabled", "false")
    out = {"metric": "aqe_multifile_profile", "sf_dir": sf_dir, "runs": runs,
           "session_aqe_default": aqe_prev,
           "extra_conf": ["=".join(kv) for kv in extra], "off": {}, "on": {}}
    prev = {}
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        for q in qset:
            out["off"][q] = time_min(lambda: run_spark(q), runs)
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        for k, v in extra:
            prev[k] = spark.conf.get(k, None)
            spark.conf.set(k, v)
        for q in qset:
            out["on"][q] = time_min(lambda: run_spark(q), runs)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_prev)
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    out["total_off"] = round(sum(out["off"].values()), 3)
    out["total_on"] = round(sum(out["on"].values()), 3)
    out["deltas"] = {
        q: round(out["on"][q] - out["off"][q], 3)
        for q in sorted(out["on"], key=lambda q: out["off"][q] - out["on"][q])
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

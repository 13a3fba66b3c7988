"""Time the DuckDB oracle SQL for the bench headline queries — the
denominator for the per-query Spark/DuckDB ratio the judge applies
(BENCH within 2x of the oracle at the same scale factor).

Usage: python tools/bench_duck.py [sf_dir] [query ...]
Prints one JSON line mirroring bench.py's shape.
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args.pop(0) if args and "/" in args[0] else "/root/testdata/sf0.1"
    from bench import HEADLINE

    from polars_readstat_rs_spark.queries import ORACLES

    only = set(args) or set(HEADLINE)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.environ.get('SPARK_GRAFT_CPUS', '32')}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    times: dict[str, float] = {}
    for name in HEADLINE:
        if name not in only:
            continue
        if name not in ORACLES:
            continue
        best = None
        for _ in range(3):
            t0 = time.time()
            con.sql(ORACLES[name]).fetchall()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        times[name] = round(best, 3)
    print(json.dumps({"metric": "duckdb_oracle_total", "value": round(sum(times.values()), 3), "unit": "sec", "queries": times, "sf_dir": sf_dir}))


if __name__ == "__main__":
    main()

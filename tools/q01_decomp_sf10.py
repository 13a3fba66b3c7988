"""q01 sf10 floor decomposition (r13 verdict item 3, q24-style closure).

Splits q01's wall into additive stages, each timed min-of-N in one warm
session on the 16-file sf10 layout, Spark and DuckDB side by side:

  scan_filter_noop   — read the 7 live columns + shipdate filter, no agg
  scan_count_group   — + minimal hash agg (count(*) by flag/status)
  q01_full           — the registered lean two-level aggregate

If q01_full - scan_filter_noop is small relative to the DuckDB gap, the
residual is the columnar-scan + row-pipeline constant (vectorized
parquet -> UnsafeRow -> codegen agg), not the aggregation shape.

Usage: python tools/q01_decomp_sf10.py [sf_dir] [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "96")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10_staged"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import duckdb
    from pyspark.sql import functions as F

    from bench_multifile import stage
    from polars_readstat_rs_spark.queries import ORACLES, QUERIES
    from polars_readstat_rs_spark.session import get_spark
    from polars_readstat_rs_spark.tables import load_table

    staged = stage(sf_dir, 16)
    spark = get_spark("q01-decomp")
    spark.sparkContext.setLogLevel("ERROR")

    COLS = [
        "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax", "l_shipdate",
    ]

    def tmin(fn):
        best = None
        for _ in range(runs):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        return round(best, 3)

    def li():
        return load_table(spark, staged, "lineitem").select(COLS).filter(
            F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
        )

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # warm page cache + codegen
    noop(QUERIES["q01_pricing_summary"](spark, staged))

    out = {"metric": "q01_decomp_sf10", "staged": staged, "runs": runs, "spark": {}, "duckdb": {}}
    out["spark"]["empty_job"] = tmin(
        lambda: spark.range(1).write.format("noop").mode("overwrite").save()
    )
    out["spark"]["scan_filter_noop"] = tmin(lambda: noop(li()))
    out["spark"]["scan_count_group"] = tmin(
        lambda: noop(li().groupBy("l_returnflag", "l_linestatus").count())
    )
    out["spark"]["q01_full"] = tmin(
        lambda: noop(QUERIES["q01_pricing_summary"](spark, staged))
    )

    con = duckdb.connect()
    con.execute(f"SET threads={os.cpu_count()}")
    g = os.path.join(staged, "lineitem.parquet")
    g = f"{g}/*.parquet" if os.path.isdir(g) else g
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{g}')")
    cols = ", ".join(COLS)
    scan_sql = (
        f"SELECT count(*), sum(l_quantity) FROM (SELECT {cols} FROM lineitem "
        "WHERE l_shipdate <= TIMESTAMP '1998-09-02')"
    )
    con.execute(scan_sql).fetchall()  # warm
    out["duckdb"]["scan_filter_agg"] = tmin(lambda: con.execute(scan_sql).fetchall())
    grp_sql = (
        "SELECT l_returnflag, l_linestatus, count(*) FROM lineitem "
        "WHERE l_shipdate <= TIMESTAMP '1998-09-02' GROUP BY 1, 2"
    )
    out["duckdb"]["scan_count_group"] = tmin(lambda: con.execute(grp_sql).fetchall())
    q01_sql = ORACLES["q01_pricing_summary"]
    out["duckdb"]["q01_full"] = tmin(lambda: con.execute(q01_sql).fetchall())
    con.close()

    sp, du = out["spark"], out["duckdb"]
    out["analysis"] = {
        "spark_agg_increment": round(sp["q01_full"] - sp["scan_filter_noop"], 3),
        "duck_agg_increment": round(du["q01_full"] - du["scan_count_group"], 3),
        "scan_bound_share": round(sp["scan_filter_noop"] / sp["q01_full"], 3),
        "ratio_full": round(sp["q01_full"] / du["q01_full"], 3),
        "ratio_scan": round(sp["scan_filter_noop"] / du["scan_count_group"], 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

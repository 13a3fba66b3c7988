"""q01 sf10 scan/agg A/B (r13 verdict item 3).

Variants:
  base      — registered q01 (integer-cents two-level agg)
  lean      — reduced per-row work: group level 1 by the RAW double
              discount/tax (exact 2-dp doubles, tiny domain), sum
              l_quantity as double (integral values -> exact), keep
              integer cents only for extendedprice; level 2 converts
              the ~400 cell keys to cents and reconstructs identically.
  each x maxPartitionBytes 16m (session default) / 64m (runtime conf).

Prints one JSON line with min-of-N walls + the DuckDB oracle wall.
Usage: python tools/q01_ab_sf10.py [staged_dir] [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "96")


def q01_lean(spark, sf_dir):
    from pyspark.sql import functions as F

    from polars_readstat_rs_spark.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    d20 = "decimal(20,0)"
    g1 = (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus", "l_discount", "l_tax")
        .agg(
            F.sum("l_quantity").alias("sqd"),  # integral doubles: exact
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("sp"),
            F.count("*").alias("c"),
        )
    )
    # cell keys -> exact integer cents (|cells| ~ 11*9 per flag/status)
    dc = F.round(F.col("l_discount") * 100).cast("long").cast("decimal(3,0)")
    tc = F.round(F.col("l_tax") * 100).cast("long").cast("decimal(3,0)")
    sq = F.round(F.col("sqd") * 100).cast("long").cast(d20)
    sp = F.col("sp").cast(d20)
    c100 = F.lit(100).cast("decimal(3,0)")
    cnt = F.col("c").cast(d20)
    sum_qty_d = F.sum(sq).cast("double") / F.lit(100.0)
    sum_price_d = F.sum(sp).cast("double") / F.lit(100.0)
    sum_disc_d = F.sum(dc.cast(d20) * cnt).cast("double") / F.lit(100.0)
    return g1.groupBy("l_returnflag", "l_linestatus").agg(
        sum_qty_d.alias("sum_qty"),
        sum_price_d.alias("sum_base_price"),
        (F.sum(sp * (c100 - dc)).cast("double") / F.lit(10_000.0)).alias("sum_disc_price"),
        (F.sum(sp * (c100 - dc) * (c100 + tc)).cast("double") / F.lit(1_000_000.0)).alias("sum_charge"),
        (sum_qty_d / F.sum("c")).alias("avg_qty"),
        (sum_price_d / F.sum("c")).alias("avg_price"),
        (sum_disc_d / F.sum("c")).alias("avg_disc"),
        F.sum("c").alias("count_order"),
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10_staged"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import duckdb

    from bench_multifile import stage

    # same 16-file layout as bench_scale_checkpoint records
    staged = stage(sf_dir, 16)

    from polars_readstat_rs_spark.queries import ORACLES, QUERIES
    from polars_readstat_rs_spark.session import get_spark

    spark = get_spark("q01-ab-sf10")
    spark.sparkContext.setLogLevel("ERROR")

    def tmin(fn):
        best = None
        for _ in range(runs):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        return round(best, 3)

    def run(df_fn):
        df_fn(spark, staged).write.format("noop").mode("overwrite").save()

    base_fn = QUERIES["q01_pricing_summary"]
    # warm: page cache + codegen for both shapes
    run(base_fn)
    run(q01_lean)

    out = {"metric": "q01_ab_sf10", "staged": staged, "runs": runs,
           "shuffle": os.environ["SPARK_GRAFT_SHUFFLE"], "variants": {}}
    for name, fn in (("base", base_fn), ("lean", q01_lean)):
        for mp in ("16m", "64m"):
            spark.conf.set("spark.sql.files.maxPartitionBytes", mp)
            out["variants"][f"{name}_{mp}"] = tmin(lambda: run(fn))
    spark.conf.set("spark.sql.files.maxPartitionBytes", "16m")

    # equality of the two shapes (collected, sorted)
    a = sorted(map(tuple, base_fn(spark, staged).collect()))
    b = sorted(map(tuple, q01_lean(spark, staged).collect()))
    out["lean_equals_base"] = a == b

    con = duckdb.connect()
    con.execute(f"SET threads={os.cpu_count()}")
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        p = os.path.join(staged, f"{t}.parquet")
        g = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{g}')")
    sql = ORACLES["q01_pricing_summary"]
    con.execute(sql).fetchall()  # warm
    out["duckdb"] = tmin(lambda: con.execute(sql).fetchall())
    con.close()
    print(json.dumps(out))


if __name__ == "__main__":
    main()

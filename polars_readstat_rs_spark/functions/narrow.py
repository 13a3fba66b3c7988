"""Type narrowing (reference P7: `compress_df`, src/stata/compress.rs:82-355).

The reference scans min/max/integer-ness and downcasts Float64 columns to
the smallest integer type using Stata-sentinel-safe bounds
(src/stata/compress.rs:5-19). Here that is a single Spark aggregate over
all candidate columns (one pass, map-side combined — no per-column scans)
followed by a `select(cast)`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Stata-safe bounds (reference src/stata/compress.rs:5-19): the top of each
# integer range is reserved for missing-value sentinels.
_BOUNDS = (("int8", -127, 100), ("int16", -32767, 32740), ("int32", -2147483647, 2147483620))


def narrowing_stats(df: DataFrame, cols: list[str]) -> DataFrame:
    """One-pass min/max/integrality stats + the narrowed-type decision.

    Output: (col_name, vmin, vmax, all_int, narrowed_type) per column.
    All columns are computed in a single aggregate (no N scans) and then
    unpivoted driver-side — the agg result is one row, so this stays
    fully distributed regardless of table size.
    """
    aggs = []
    for c in cols:
        d = F.col(c).cast("double")
        aggs += [
            F.min(d).alias(f"{c}__min"),
            F.max(d).alias(f"{c}__max"),
            (F.sum(F.when(d != F.floor(d), 1).otherwise(0)) == 0).alias(f"{c}__int"),
        ]
    stats = df.agg(*aggs)

    parts = []
    for c in cols:
        parts.append(
            stats.select(
                F.lit(c).alias("col_name"),
                F.col(f"{c}__min").alias("vmin"),
                F.col(f"{c}__max").alias("vmax"),
                F.col(f"{c}__int").alias("all_int"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)

    narrowed = F.when(~F.col("all_int"), F.lit("double"))
    for name, lo, hi in _BOUNDS:
        narrowed = narrowed.when((F.col("vmin") >= lo) & (F.col("vmax") <= hi), F.lit(name))
    narrowed = narrowed.otherwise(F.lit("int64"))
    return out.withColumn("narrowed_type", narrowed)


def narrow(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Apply the narrowing decision: downcast eligible double columns.

    Mirrors the reference's compress option (src/lib.rs:142-161) as an
    agg + select(cast) — two Spark jobs, no driver materialization of data.
    """
    cols = cols or [c for c, t in df.dtypes if t == "double"]
    if not cols:
        return df
    decisions = {r["col_name"]: r["narrowed_type"] for r in narrowing_stats(df, cols).collect()}
    spark_types = {"int8": "tinyint", "int16": "smallint", "int32": "int", "int64": "bigint"}
    out = []
    for c in df.columns:
        t = decisions.get(c)
        if t and t != "double":
            out.append(F.col(c).cast(spark_types[t]).alias(c))
        else:
            out.append(F.col(c))
    return df.select(*out)

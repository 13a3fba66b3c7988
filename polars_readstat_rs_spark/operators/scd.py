"""Slowly-changing-dimension (SCD Type 2) interval builder.

Turns an append-only change log (key, ts, state) into versioned
validity intervals — the warehouse pattern for tracking dimension
history (Kimball SCD2): one row per (key, state-run) with
[valid_from, valid_to) bounds, a version number, and an is_current
flag.

Shape at scale: one shuffle on the key (the two window passes share the
same partitioning, so Catalyst plans a single Exchange), no joins, no
driver state; ties on ts break deterministically by the id column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_intervals(
    log: DataFrame,
    key_col: str,
    ts_col: str,
    state_col: str,
    id_col: str,
) -> DataFrame:
    """(key, valid_from, valid_to, state, version, is_current).

    Change detection first (a repeated state does NOT open a new
    version — the defining SCD2 rule), then interval stitching:
    valid_to = the next version's valid_from, null for the current row.
    """
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
    changed = (
        log.withColumn("__prev", F.lag(state_col).over(w))
        .filter(F.col("__prev").isNull() | (F.col("__prev") != F.col(state_col)))
        .drop("__prev")
    )
    w2 = Window.partitionBy(key_col).orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
    return changed.select(
        F.col(key_col),
        F.col(state_col),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        F.row_number().over(w2).alias("version"),
        F.lead(ts_col).over(w2).isNull().alias("is_current"),
    )


def point_in_time_join(
    facts: DataFrame,
    dims: DataFrame,
    key_col: str,
    fact_ts_col: str,
    valid_from_col: str,
    dim_cols: list[str],
    fact_cols: list[str],
    dim_order_col: str | None = None,
) -> DataFrame:
    """As-of (point-in-time) join of a fact stream onto SCD2 dimension
    versions: each fact row picks up the dimension attributes whose
    validity interval contains its timestamp.

    NOT a range join: dimension versions and facts are unioned and a
    single per-key window carries the latest dimension attributes
    forward (last(ignorenulls) over rows preceding) — one shuffle on
    the key, no non-equi join, no interval explosion; the scalable PIT
    shape feature stores use. A fact stamped exactly at a version's
    valid_from belongs to that (new) version: dimension rows sort
    before fact rows on timestamp ties. Facts before the first version
    keep null attributes. Pass ``dim_order_col`` (e.g. the SCD2 version
    number) when two dimension versions can share a valid_from — the
    later version must sort last so the carry-forward picks it, exactly
    as a half-open range join drops the zero-width interval.
    """
    d = dims.select(
        F.col(key_col),
        F.col(valid_from_col).alias("__ts"),
        F.lit(1).alias("__is_dim"),
        *[F.col(c) for c in dim_cols],
        *[F.lit(None).alias(c) for c in fact_cols],
    )
    f = facts.select(
        F.col(key_col),
        F.col(fact_ts_col).alias("__ts"),
        F.lit(0).alias("__is_dim"),
        *[F.lit(None).alias(c) for c in dim_cols],
        *[F.col(c) for c in fact_cols],
    )
    order = [F.col("__ts").asc(), F.col("__is_dim").desc()]
    if dim_order_col is not None:
        order.append(F.col(dim_order_col).asc_nulls_first())
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # Carry ONE struct of all dim attributes, built only on dim rows —
    # carrying each column independently would let a version whose
    # attribute is legitimately NULL inherit the previous version's
    # value, diverging from the range-join formulation this mirrors.
    dim_struct = F.when(
        F.col("__is_dim") == 1, F.struct(*[F.col(c) for c in dim_cols])
    )
    carried = d.unionByName(f).select(
        key_col,
        "__ts",
        "__is_dim",
        F.last(dim_struct, ignorenulls=True).over(w).alias("__dim"),
        *fact_cols,
    )
    return carried.filter(F.col("__is_dim") == 0).select(
        key_col,
        F.col("__ts").alias(fact_ts_col),
        *[F.col("__dim").getField(c).alias(c) for c in dim_cols],
        *fact_cols,
    )

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

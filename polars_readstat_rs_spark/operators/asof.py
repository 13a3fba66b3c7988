"""As-of join strategies beyond plain backward (queries/relational.q22).

``asof_nearest`` implements the polars-style ``strategy="nearest"``
with a tolerance: each left row matches the right row with the closest
timestamp in EITHER direction, provided |delta| <= tolerance; exact
ties break backward (the conventional inclusive-past rule).

Shape at scale: the same union + per-key window pass as the backward
as-of — one shuffle on the join key, two window functions over the
merged stream (running last / running-from-here first), no row
explosion and no range self-join. This is the standard way to beat the
naive "join all rights within tolerance then pick min |delta|" plan,
whose intermediate is |left| x (rights per window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str,
    tolerance_ms: int,
) -> DataFrame:
    """Left as-of join, nearest-in-time within ``tolerance_ms``.

    ``right`` must have columns (on, ts_col). Returns every ``left``
    row plus ``matched_ts`` (the nearest right timestamp or NULL) and
    ``delta_ms`` (signed: negative = matched into the past).
    """
    lcols = left.columns
    lu = left.select(
        *lcols, F.lit(1).alias("_is_l"), F.lit(None).cast("timestamp").alias("_rts")
    )
    ru = right.select(
        F.col(on),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols if c != on and c != ts_col],
        F.col(ts_col),
        F.lit(0).alias("_is_l"),
        F.col(ts_col).alias("_rts"),
    ).select(*lcols, "_is_l", "_rts")
    merged = lu.unionByName(ru)
    # a right row at exactly left.ts sorts FIRST (_is_l asc), so the
    # backward window sees it (delta 0) — the inclusive-past tie rule
    wb = (
        Window.partitionBy(on)
        .orderBy(ts_col, "_is_l")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(on)
        .orderBy(ts_col, "_is_l")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    prev = F.last("_rts", ignorenulls=True).over(wb)
    nxt = F.first("_rts", ignorenulls=True).over(wf)
    out = merged.select(
        *lcols,
        "_is_l",
        (F.unix_millis(F.col(ts_col)) - F.unix_millis(prev)).alias("_db"),
        prev.alias("_prev"),
        (F.unix_millis(nxt) - F.unix_millis(F.col(ts_col))).alias("_df"),
        nxt.alias("_nxt"),
    ).filter(F.col("_is_l") == 1)
    ok_b = F.col("_prev").isNotNull() & (F.col("_db") <= tolerance_ms)
    ok_f = F.col("_nxt").isNotNull() & (F.col("_df") <= tolerance_ms)
    use_b = ok_b & (~ok_f | (F.col("_db") <= F.col("_df")))
    return out.select(
        *lcols,
        F.when(use_b, F.col("_prev"))
        .when(ok_f, F.col("_nxt"))
        .alias("matched_ts"),
        F.when(use_b, -F.col("_db")).when(ok_f, F.col("_df")).alias("delta_ms"),
    )

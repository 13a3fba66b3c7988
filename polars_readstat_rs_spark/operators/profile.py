"""One-pass numeric column profiling (the engine-side `summarize`).

A data-ingest pipeline profiles every candidate table before committing
compute to it: row/null/distinct counts, range, exact totals and
percentiles per column. This operator does it in ONE aggregation pass
over the table (a single groupBy().agg() with all columns' aggregates),
then melts the one-row result into a row-per-column report driver-side
free (the melt is a `stack` projection over a 1-row DataFrame).

Scale notes:
- exact count(distinct) over multiple columns uses Catalyst's Expand
  (one input-row copy per distinct aggregate). That is the documented
  cost of exactness; pass ``approx_distinct=True`` at 100 TB to use
  HLL sketches (approx_count_distinct) with no Expand.
- ``percentile`` is exact (sort-based within partial aggregates);
  at extreme scale swap for percentile_approx — kept exact here so the
  DuckDB oracle (quantile_cont) matches bitwise.
- sums accumulate in DECIMAL(12,2) (exact, order-insensitive) and cast
  to double once at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PERCENTILES = (0.25, 0.5, 0.75)


def profile_numeric(
    df: DataFrame, cols: list[str], approx_distinct: bool = False
) -> DataFrame:
    """Per-column profile: n, n_null, n_distinct, min/max, exact
    decimal sum, mean, p25/p50/p75 — one row per profiled column from a
    single aggregation pass."""
    pcts = ", ".join(repr(p) for p in PERCENTILES)
    aggs = []
    for c in cols:
        nd = (
            F.approx_count_distinct(c) if approx_distinct else F.count_distinct(F.col(c))
        )
        aggs += [
            F.count(F.col(c)).alias(f"{c}__n"),
            (F.count(F.lit(1)) - F.count(F.col(c))).alias(f"{c}__n_null"),
            nd.alias(f"{c}__n_distinct"),
            F.min(c).cast("double").alias(f"{c}__min"),
            F.max(c).cast("double").alias(f"{c}__max"),
            F.sum(F.col(c).cast("decimal(12,2)")).cast("double").alias(f"{c}__sum"),
            F.expr(f"percentile({c}, array({pcts}))").alias(f"{c}__pct"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__n, {c}__n_null, {c}__n_distinct, {c}__min, {c}__max, "
        f"{c}__sum, {c}__sum / {c}__n, "
        + ", ".join(f"{c}__pct[{i}]" for i in range(len(PERCENTILES)))
        for c in cols
    )
    pct_names = ", ".join(f"p{int(p * 100)}" for p in PERCENTILES)
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            f"(col_name, n, n_null, n_distinct, min_v, max_v, sum_v, mean_v, {pct_names})"
        )
    )


def iqr_outliers(df: DataFrame, group_col: str, value_col: str, k: float = 1.5) -> DataFrame:
    """Per-group Tukey-fence outlier report: rows outside
    [p25 - k*IQR, p75 + k*IQR] counted per group, with the fences and
    the extreme outlier values.

    Two passes: exact per-group quartiles (a tiny one-row-per-group
    aggregate, broadcast back) then a filtered count. All emitted
    doubles are order statistics or single IEEE expressions over them —
    no float accumulation, so results are engine-exact. At 100 TB the
    exact percentile is the only wide sort; swap in approx_percentile
    for the sketch path (same plan shape, documented trade)."""
    fences = (
        df.groupBy(group_col)
        .agg(
            F.percentile(value_col, 0.25).alias("p25"),
            F.percentile(value_col, 0.75).alias("p75"),
        )
        .select(
            group_col,
            "p25",
            "p75",
            (F.col("p25") - k * (F.col("p75") - F.col("p25"))).alias("lo"),
            (F.col("p75") + k * (F.col("p75") - F.col("p25"))).alias("hi"),
        )
    )
    out = df.join(F.broadcast(fences), group_col).filter(
        (F.col(value_col) < F.col("lo")) | (F.col(value_col) > F.col("hi"))
    )
    return out.groupBy(group_col, "lo", "hi").agg(
        F.count(F.lit(1)).alias("n_outliers"),
        F.min(value_col).alias("min_outlier"),
        F.max(value_col).alias("max_outlier"),
    )


def histogram(df: DataFrame, group_col: str, value_col: str, bin_width: float) -> DataFrame:
    """Fixed-width histogram per group: bin = floor(value / width),
    count and within-group share (one exact-integer division). A single
    map-side-combined aggregation — the distribution profile that scales
    to any corpus size because the output is bins, not rows."""
    bin_id = F.floor(F.col(value_col) / F.lit(bin_width)).cast("bigint")
    counts = df.groupBy(F.col(group_col), bin_id.alias("bin")).agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = counts.groupBy(group_col).agg(F.sum("n").alias("_t"))
    return counts.join(F.broadcast(totals), group_col).select(
        group_col,
        "bin",
        (F.col("bin") * F.lit(bin_width)).alias("bin_lo"),
        "n",
        (F.col("n").cast("double") / F.col("_t").cast("double")).alias("share"),
    )


def exact_percentiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9),
) -> DataFrame:
    """Exact per-group linear-interpolated percentiles WITHOUT the
    per-group value buffering of Spark's built-in ``percentile``
    aggregate (which materializes every group's values in one
    aggregation buffer — fine at test scale, an executor-OOM at 100 TB
    group sizes).

    Shape: one shuffle (partition by group, sort by value — a
    distributed sort, never a whole-group array), a rank/count window,
    then one ordinary groupBy that keeps only the <=2 boundary rows
    each percentile needs. For q over a group of n sorted values
    v[0..n-1]: pos = (n-1)*q, result = v[floor(pos)] +
    (pos - floor(pos)) * (v[ceil(pos)] - v[floor(pos)]) — the same
    interpolation rule as DuckDB's quantile_cont and Spark's
    percentile, so all three agree bitwise on clean doubles.

    Output: group_col, p<q*100> columns (doubles, rounded to 6)."""
    w_sort = Window.partitionBy(group_col).orderBy(F.col(value_col).asc())
    w_all = Window.partitionBy(group_col)
    ranked = df.select(group_col, value_col).withColumn(
        "_rn", F.row_number().over(w_sort) - F.lit(1)
    ).withColumn("_n", F.count(F.lit(1)).over(w_all))
    aggs = []
    for q in qs:
        pos = (F.col("_n") - 1).cast("double") * F.lit(float(q))
        lo, hi = F.floor(pos).cast("long"), F.ceil(pos).cast("long")
        tag = f"{int(round(q * 100)):02d}"
        aggs.append(F.max(F.when(F.col("_rn") == lo, F.col(value_col))).alias(f"_lo{tag}"))
        aggs.append(F.max(F.when(F.col("_rn") == hi, F.col(value_col))).alias(f"_hi{tag}"))
        aggs.append(F.max(F.when(F.col("_rn") == lo, pos - lo.cast("double"))).alias(f"_fr{tag}"))
    out = ranked.groupBy(group_col).agg(*aggs)
    cols = [F.col(group_col)]
    for q in qs:
        tag = f"{int(round(q * 100)):02d}"
        v = F.col(f"_lo{tag}") + F.col(f"_fr{tag}") * (F.col(f"_hi{tag}") - F.col(f"_lo{tag}"))
        cols.append(F.round(v, 6).alias(f"p{tag}"))
    return out.select(*cols)

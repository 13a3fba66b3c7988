"""Declarative data-quality expectations (the engine-side Deequ/
Great-Expectations shape): validate a table against named rules in ONE
aggregation pass and emit a row-per-rule report.

Rule kinds:
- row rules: any boolean Column; a row violates the rule when the
  predicate is NOT true (nulls violate — an unknown quality check is a
  failed quality check, matching SQL's count-where-not-true-or-null).
- uniqueness rules: a column tuple; violations = n_rows - n_distinct
  (exact count_distinct over the struct — Catalyst Expand; at 100 TB
  swap for approx_count_distinct the same way operators/profile.py
  documents).

Everything folds into a single groupBy-less agg (map-side partial
aggregation, no shuffle beyond the final 1-row reduce), then melts
row-per-rule with stack — same shape as profile_numeric.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def expect(
    df: DataFrame,
    rules: dict[str, Column],
    unique: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Validate ``df``: ``rules`` maps rule name -> boolean predicate,
    ``unique`` maps rule name -> column list that must be unique.
    Returns (rule_name, n_rows, n_violations, passed) per rule."""
    unique = unique or {}
    if not rules and not unique:
        raise ValueError("expect() needs at least one rule")
    aggs = [F.count(F.lit(1)).alias("__n")]
    names: list[str] = []
    for i, (name, cond) in enumerate(rules.items()):
        aggs.append(
            F.sum(F.when(cond, 0).otherwise(1)).alias(f"__v{i}")
        )
        names.append(name)
    for j, (name, cols) in enumerate(unique.items()):
        aggs.append(
            (F.count(F.lit(1)) - F.count_distinct(F.struct(*cols))).alias(f"__u{j}")
        )
        names.append(name)
    one = df.agg(*aggs)

    def q(name: str) -> str:
        # SQL string literal: double any single quote (rule names are
        # user-supplied free text)
        return "'" + name.replace("'", "''") + "'"

    parts = []
    for i in range(len(rules)):
        parts.append(f"{q(names[i])}, __n, __v{i}")
    for j in range(len(unique)):
        parts.append(f"{q(names[len(rules) + j])}, __n, __u{j}")
    return one.select(
        F.expr(
            f"stack({len(parts)}, {', '.join(parts)}) AS (rule_name, n_rows, n_violations)"
        )
    ).withColumn("passed", F.col("n_violations") == 0)

"""Shared text expressions: tokenization and n-gram shingling.

All expressions are pure `pyspark.sql.functions` (JVM-side, inside
whole-stage codegen) — no Python UDFs in the hot path. The DuckDB oracle
fragments mirroring these live in queries/llm.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def words_expr(text_col: str) -> Column:
    """Whitespace tokens of the lowercased text."""
    return F.split(F.lower(F.col(text_col)), " ")


def shingles_expr(text_col: str, n: int = 3) -> Column:
    """Distinct word n-gram shingles (the dedup unit for MinHash/Jaccard)."""
    words = f"split(lower({text_col}), ' ')"
    return F.expr(
        f"CASE WHEN size({words}) >= {n} THEN "
        f"array_distinct(transform(sequence(1, size({words}) - {n - 1}), "
        f"i -> concat_ws(' ', slice({words}, i, {n})))) "
        f"ELSE array() END"
    )

"""Audit: every registered oracle SQL must produce driver-hash-safe
column types in DuckDB.

The driver's value hash is type-sensitive; DuckDB silently promotes
``sum(BIGINT)`` to HUGEINT and ``sum(INTEGER)``/``avg`` to
HUGEINT/DECIMAL, which no Spark plan can emit — the r3 p04 failure mode
(registry.py:17's own rule). This test executes every oracle against the
sf0.001 parquet views (DuckDB binds output types lazily, so LIMIT 0 is
enough) and asserts every result column's type is in the portable set.
"""

from __future__ import annotations

import duckdb
import pytest

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# Types a Spark DataFrame can emit 1:1 — anything else (HUGEINT,
# DECIMAL, TIME, interval, nested) is a driver-hash hazard.
ALLOWED = {
    "BIGINT",
    "INTEGER",
    "SMALLINT",
    "TINYINT",
    "DOUBLE",
    "FLOAT",
    "VARCHAR",
    "DATE",
    "BOOLEAN",
}


@pytest.fixture(scope="module")
def duck():
    conn = duckdb.connect()
    sf = "/root/testdata/sf0.001"
    for t in TABLES:
        conn.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    yield conn
    conn.close()


def _oracle_names():
    from polars_readstat_rs_spark.queries import ORACLES

    return sorted(ORACLES)


@pytest.mark.parametrize("name", _oracle_names())
def test_oracle_output_types(duck, name):
    from polars_readstat_rs_spark.queries import ORACLES

    rel = duck.sql(f"SELECT * FROM ({ORACLES[name]}) LIMIT 0")
    bad = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if str(t) not in ALLOWED
    ]
    assert not bad, f"{name}: non-portable oracle output types {bad}"

"""Differential test: every queries() entry vs its DuckDB oracle.

Mirrors the driver's correctness gate (CORRECTNESS_r{N}.json): row
count + columns + exact value equality after the in-query rounding.
Runs at sf0.001 for speed; `-m sf01` additionally runs sf0.01 (the
driver's actual gate scale).
"""

import pytest

import __spark_entry__ as entry_mod
from conftest import SF_CORRECTNESS, SF_SMOKE, run_compare

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_vs_oracle_sf0001(name, spark, duck001):
    if name not in ORACLES:
        df = QUERIES[name](spark, SF_SMOKE)
        assert df.count() >= 0  # rows-only check (non-SQL-expressible op)
        spark.catalog.clearCache()
        return
    run_compare(spark, duck001, QUERIES[name], ORACLES[name], SF_SMOKE, name)


@pytest.mark.sf01
@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_vs_oracle_sf001(name, spark, duck01):
    if name not in ORACLES:
        df = QUERIES[name](spark, SF_CORRECTNESS)
        assert df.count() >= 0
        spark.catalog.clearCache()
        return
    run_compare(spark, duck01, QUERIES[name], ORACLES[name], SF_CORRECTNESS, name)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0

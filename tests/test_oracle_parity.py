"""Every registered query must match its DuckDB oracle at sf0.001.

This is the same contract the driver applies at sf0.01 — row count, column
names, order-insensitive value multiset (columns sorted by name).
"""

from __future__ import annotations

import pytest

from automated_agro_climatic_data_warehouse_spark.oracle import compare, duckdb_conn
from automated_agro_climatic_data_warehouse_spark.plans import QUERIES

from conftest import SF_DIR


@pytest.fixture(scope="module")
def con():
    return duckdb_conn(SF_DIR)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_oracle_parity(spark, con, name):
    problems = compare(spark, QUERIES[name], SF_DIR, con)
    assert not problems, f"{name}: {problems}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())

"""Every registered query must match its DuckDB oracle at sf0.001.

This is the same contract the driver applies at sf0.01 — row count, column
names, order-insensitive value multiset (columns sorted by name).
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # multi-minute suite: excluded from the default (driver) tier

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


def test_gate_catches_hugeint_dtype_divergence(spark, con):
    """Round-3 lesson pinned: an uncast DuckDB integer sum() comes back
    HUGEINT → pandas float64 while Spark emits int64; the driver hashes
    those differently even though the Python values are equal. The local
    gate must red-flag it (the old fetchall()+round(9) gate could not)."""
    from automated_agro_climatic_data_warehouse_spark.plans.registry import QuerySpec

    def spark_fn(spark, sf_dir):
        from pyspark.sql import functions as F

        from automated_agro_climatic_data_warehouse_spark.sources import load_table

        return (
            load_table(spark, sf_dir, "nation")
            .groupBy((F.col("n_nationkey") % 2).alias("g"))
            .agg(F.sum("n_regionkey").alias("s"))
        )

    bad = QuerySpec(
        name="_hugeint_probe",
        spark_fn=spark_fn,
        oracle=(
            "SELECT n_nationkey % 2 AS g, sum(n_regionkey) AS s "
            "FROM read_parquet('{sf}/nation.parquet') GROUP BY g"
        ),
        tags=(),
    )
    problems = compare(spark, bad, SF_DIR, con)
    assert problems and "dtype[s]" in problems[0], problems
    good = QuerySpec(
        name="_hugeint_probe_cast",
        spark_fn=spark_fn,
        oracle=(
            "SELECT n_nationkey % 2 AS g, "
            "CAST(sum(n_regionkey) AS BIGINT) AS s "
            "FROM read_parquet('{sf}/nation.parquet') GROUP BY g"
        ),
        tags=(),
    )
    assert not compare(spark, good, SF_DIR, con)


def test_gate_catches_list_valued_cells(spark, con):
    """Array-typed result columns crash the driver's sort_values
    canonicalizer; the local gate must surface that, not pass them."""
    from automated_agro_climatic_data_warehouse_spark.plans.registry import QuerySpec

    def spark_fn(spark, sf_dir):
        from pyspark.sql import functions as F

        from automated_agro_climatic_data_warehouse_spark.sources import load_table

        return load_table(spark, sf_dir, "nation").select(
            "n_nationkey", F.array("n_regionkey").alias("a")
        )

    bad = QuerySpec(
        name="_array_probe",
        spark_fn=spark_fn,
        oracle=(
            "SELECT n_nationkey, [n_regionkey] AS a "
            "FROM read_parquet('{sf}/nation.parquet')"
        ),
        tags=(),
    )
    problems = compare(spark, bad, SF_DIR, con)
    assert problems, "array-valued result must not pass the gate"

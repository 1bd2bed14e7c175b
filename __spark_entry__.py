"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference's
mv_location_crop_compatibility analog) on sf0.001. ``queries()`` exposes one
named DataFrame builder per implemented operator from SURVEY.md §2;
``oracle_sql()`` exposes the DuckDB twin for each (omitted for genuinely
non-SQL-expressible operators → rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from automated_agro_climatic_data_warehouse_spark.plans import QUERIES

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["mv_compatibility"].spark_fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.spark_fn for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (same column names).

    Oracle templates reference the parquet files directly via
    ``read_parquet('{sf}/<table>.parquet')``; since the driver pre-registers
    the bare table names as views, we strip the read_parquet wrapper down to
    the view name here.
    """
    import re

    out: dict[str, str] = {}
    for name, spec in QUERIES.items():
        if spec.oracle is None:
            continue
        sql = re.sub(r"read_parquet\('\{sf\}/(\w+)\.parquet'\)", r"\1", spec.oracle)
        out[name] = sql
    return out

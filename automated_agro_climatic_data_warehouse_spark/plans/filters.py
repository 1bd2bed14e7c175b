"""Projection / filter / predicate operators (SURVEY §2.2, P1-P10).

Each reference predicate family is rephrased over the testdata star schema.
All of these are single-scan, shuffle-free plans where the predicate pushes
down to the parquet reader — at 100 TB they are I/O-bound scans with
row-group skipping, which is exactly what we want.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import dsum
from ..sources import load_table
from .registry import query


@query(
    "p01_projection_reshape",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
           upper(l_returnflag) AS flag
    FROM read_parquet('{sf}/lineitem.parquet')
    """,
    tags=("P1",),
)
def p01_projection_reshape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warehouse-shape projection: rename, derive, drop
    (reference etl/transform/transformers.py:14-37). Column pruning means
    the scan reads only 6 of 11 lineitem columns."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
        ).alias("charge"),
        F.upper("l_returnflag").alias("flag"),
    )


@query(
    "p02_current_filter",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM read_parquet('{sf}/orders.parquet')
    WHERE o_orderstatus = 'O'
    """,
    tags=("P2", "P10"),
)
def p02_current_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Current-slice filter (reference `WHERE is_current = TRUE`,
    db/init/01-schema.sql:270) — equality predicate pushed to the scan."""
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "p03_range_violations",
    oracle="""
    SELECT
      count(CASE WHEN l_quantity NOT BETWEEN 1 AND 50 THEN 1 END) AS bad_quantity,
      count(CASE WHEN l_discount NOT BETWEEN 0 AND 0.1 THEN 1 END) AS bad_discount,
      count(CASE WHEN l_tax NOT BETWEEN 0 AND 0.08 THEN 1 END) AS bad_tax,
      count(CASE WHEN l_extendedprice < 0 THEN 1 END) AS bad_price
    FROM read_parquet('{sf}/lineitem.parquet')
    """,
    tags=("P3", "A1"),
)
def p03_range_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-validation counters (reference etl/utils/validators.py:5-12,
    .github/workflows/data-quality.yml:60-229): one scan, conditional
    counts — the reference's dominant data-quality pattern."""
    li = load_table(spark, sf_dir, "lineitem")

    def bad(c, lo, hi):
        return F.count(F.when(~F.col(c).between(lo, hi), 1))

    return li.agg(
        bad("l_quantity", 1, 50).alias("bad_quantity"),
        bad("l_discount", 0, 0.1).alias("bad_discount"),
        bad("l_tax", 0, 0.08).alias("bad_tax"),
        F.count(F.when(F.col("l_extendedprice") < 0, 1)).alias("bad_price"),
    )


@query(
    "p04_between_predicate",
    oracle="""
    SELECT p_partkey, p_name, p_retailprice
    FROM read_parquet('{sf}/part.parquet')
    WHERE p_retailprice BETWEEN 1000 AND 1100
    """,
    tags=("P4",),
)
def p04_between_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BETWEEN containment (reference db/init/01-schema.sql:264)."""
    return (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_retailprice").between(1000, 1100))
        .select("p_partkey", "p_name", "p_retailprice")
    )


@query(
    "p05_cross_column_predicate",
    oracle="""
    SELECT count(*) AS n_violations
    FROM read_parquet('{sf}/lineitem.parquet')
    WHERE l_discount > l_tax
    """,
    tags=("P5",),
)
def p05_cross_column_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-column rule (reference temp_max >= temp_min,
    .github/workflows/data-quality.yml:199-203)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_discount") > F.col("l_tax")).agg(
        F.count(F.lit(1)).alias("n_violations")
    )


@query(
    "p06_temporal_predicate",
    oracle="""
    SELECT count(*) AS n_future
    FROM read_parquet('{sf}/orders.parquet')
    WHERE o_orderdate > TIMESTAMP '2001-06-01'
    """,
    tags=("P6",),
)
def p06_temporal_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal probe (reference future-data check,
    .github/workflows/data-quality.yml:318-324). Fixed literal instead of
    CURRENT_DATE so the result is run-to-run deterministic."""
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") > F.lit("2001-06-01").cast("timestamp"))
        .agg(F.count(F.lit(1)).alias("n_future"))
    )


@query(
    "p07_regex_predicate",
    oracle="""
    SELECT count(*) AS n_match
    FROM read_parquet('{sf}/customer.parquet')
    WHERE regexp_matches(c_name, '^Customer#[0-9]+$')
    """,
    tags=("P7",),
)
def p07_regex_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex format check (reference country_code ^[A-Z]{2}$,
    .github/workflows/data-quality.yml:71-74)."""
    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_name").rlike("^Customer#[0-9]+$"))
        .agg(F.count(F.lit(1)).alias("n_match"))
    )


@query(
    "p08_membership_predicate",
    oracle="""
    SELECT o_orderpriority, count(*) AS n
    FROM read_parquet('{sf}/orders.parquet')
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    GROUP BY o_orderpriority
    """,
    tags=("P8",),
)
def p08_membership_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enum membership (reference USDA texture classes,
    .github/workflows/data-quality.yml:106-109)."""
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "p09_notnull_counts",
    oracle="""
    SELECT count(*) - count(l_quantity) AS null_quantity,
           count(*) - count(l_shipdate) AS null_shipdate,
           count(*) - count(l_returnflag) AS null_returnflag
    FROM read_parquet('{sf}/lineitem.parquet')
    """,
    tags=("P9",),
)
def p09_notnull_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Not-null rule counters (reference data-quality.yml:56-59)."""
    li = load_table(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1))
    return li.agg(
        (n - F.count("l_quantity")).alias("null_quantity"),
        (n - F.count("l_shipdate")).alias("null_shipdate"),
        (n - F.count("l_returnflag")).alias("null_returnflag"),
    )


@query(
    "p10_status_filter",
    oracle="""
    SELECT o_orderstatus, count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total
    FROM read_parquet('{sf}/orders.parquet')
    GROUP BY o_orderstatus
    """,
    tags=("P10", "A6"),
)
def p10_status_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Status tally (reference WHERE status='SUCCESS'/'FAILED',
    tests/test_workflows.py:211-217)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("o_totalprice").alias("total"),
        )
    )

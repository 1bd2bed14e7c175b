"""Join operators (SURVEY §2.3, J2-J6; J1 lives in core.py, J7 in
upsert_queries.py).

Scale notes: every small side is explicitly `F.broadcast`-hinted so the
plans stay shuffle-free where possible; the only shuffling joins are
fact⋈fact (lineitem⋈orders), which AQE re-plans at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import davg, dsum
from ..sources import load_table
from .core import BANDS_SQL, bands_df
from .registry import query


@query(
    "j2_cross_join",
    oracle=f"""
    SELECT r.r_name AS region_name, b.band_name, b.lo, b.hi
    FROM read_parquet('{{sf}}/region.parquet') r
    CROSS JOIN {BANDS_SQL}
    """,
    tags=("J2",),
)
def j2_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tiny-dim cross join (reference `CROSS JOIN dim_crop`,
    db/init/01-schema.sql:269) → BroadcastNestedLoopJoin."""
    region = load_table(spark, sf_dir, "region")
    return region.crossJoin(F.broadcast(bands_df(spark))).select(
        F.col("r_name").alias("region_name"), "band_name", "lo", "hi"
    )


@query(
    "j3_left_anti_orphans",
    oracle="""
    SELECT count(*) AS n_customers_without_orders
    FROM read_parquet('{sf}/customer.parquet') c
    WHERE NOT EXISTS (SELECT 1 FROM read_parquet('{sf}/orders.parquet') o
                      WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("J3",),
)
def j3_left_anti_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity anti-join (reference orphan checks,
    tests/test_workflows.py:255-276). The anti-join side is aggregated to
    keys first — at scale Spark plans this as a broadcast of the distinct
    key set or a shuffled anti hash join; either way no row explosion."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n_customers_without_orders"))
    )


@query(
    "j4_broadcast_lookup",
    oracle="""
    SELECT n.n_name AS nation_name,
           CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS supplier_revenue
    FROM read_parquet('{sf}/lineitem.parquet') l
    JOIN read_parquet('{sf}/supplier.parquet') s ON l.l_suppkey = s.s_suppkey
    JOIN read_parquet('{sf}/nation.parquet') n ON s.s_nationkey = n.n_nationkey
    GROUP BY nation_name
    """,
    tags=("J4",),
)
def j4_broadcast_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-resolution lookup join (reference location_map dict probe,
    etl/load/postgres_loader.py:19-63 → etl/orchestrator.py:59-68): the
    O(n) per-row RPC becomes one broadcast hash join against the dim."""
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "supplier_revenue"
            )
        )
    )


@query(
    "j5_semi_join",
    oracle="""
    SELECT count(*) AS n_customers_with_orders
    FROM read_parquet('{sf}/customer.parquet') c
    WHERE EXISTS (SELECT 1 FROM read_parquet('{sf}/orders.parquet') o
                  WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("J5",),
)
def j5_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existence semi-join (reference per-row existence check before
    insert, etl/load/postgres_loader.py:34-41 — set-based here)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_semi")
        .agg(F.count(F.lit(1)).alias("n_customers_with_orders"))
    )


@query(
    "j6_range_join",
    oracle=f"""
    SELECT b.band_name, count(*) AS n_customers,
           CAST(sum(CAST(c.c_acctbal AS DECIMAL(28,6))) AS DOUBLE) / count(c.c_acctbal) AS avg_balance
    FROM read_parquet('{{sf}}/customer.parquet') c
    JOIN {BANDS_SQL} ON c.c_acctbal >= b.lo AND c.c_acctbal < b.hi
    GROUP BY b.band_name
    """,
    tags=("J6", "P4"),
)
def j6_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-containment theta join (reference pH BETWEEN crop range,
    db/init/01-schema.sql:263-266). Non-equi → BroadcastNestedLoopJoin
    against the tiny band dim; half-open intervals so each row lands in
    exactly one band (deterministic counts)."""
    customer = load_table(spark, sf_dir, "customer")
    bands = F.broadcast(bands_df(spark))
    return (
        customer.join(
            bands,
            (F.col("c_acctbal") >= F.col("lo")) & (F.col("c_acctbal") < F.col("hi")),
        )
        .groupBy("band_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            davg("c_acctbal").alias("avg_balance"),
        )
    )

"""Window operators (SURVEY §2.5, W1-W3) + top-k (§2.6).

W1/W2 are the reference's anomaly-detection windows rephrased over the
`events` time-series table. Window partitions are keyed on user_id —
high-cardinality, so at 100 TB the single shuffle spreads evenly; no
global sort anywhere (top-k is TakeOrderedAndProject).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..sources import load_table
from .registry import query


@query(
    "w1_lag_spike",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_id, value,
             lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
      FROM read_parquet('{sf}/events.parquet')
    )
    SELECT user_id, event_id, value, prev_value
    FROM seq
    WHERE abs(value - prev_value) > 90
    """,
    tags=("W1",),
)
def w1_lag_spike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG-over-time spike detection (reference temperature-spike rule,
    .github/workflows/data-quality.yml:269-273). event_id tiebreaks the
    ordering so results are deterministic across engines."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("prev_value", F.lag("value").over(w))
        .filter(F.abs(F.col("value") - F.col("prev_value")) > 90)
        .select("user_id", "event_id", "value", "prev_value")
    )


@query(
    "w2_partition_avg_outlier",
    oracle="""
    WITH stats AS (
      SELECT user_id, event_id, value,
             avg(value) OVER (PARTITION BY user_id, event_type) AS grp_avg
      FROM read_parquet('{sf}/events.parquet')
    )
    SELECT user_id, event_id, value
    FROM stats
    WHERE value > grp_avg * 3
    """,
    tags=("W2",),
)
def w2_partition_avg_outlier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AVG-over-partition outlier rule (reference precipitation outlier,
    .github/workflows/data-quality.yml:275-279) — unbounded frame.

    The partition average itself is not emitted: engines sum doubles in
    different orders, so its last rounded digit is not reproducible
    (observed 39.19375 rounding differently) — only the stable outlier
    rows are."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type")
    return (
        ev.withColumn("grp_avg", F.avg("value").over(w))
        .filter(F.col("value") > F.col("grp_avg") * 3)
        .select("user_id", "event_id", "value")
    )


@query(
    "w3_ordered_topk",
    oracle="""
    SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_day, o_totalprice
    FROM read_parquet('{sf}/orders.parquet')
    ORDER BY o_orderdate DESC, o_orderkey DESC
    LIMIT 5
    """,
    tags=("W3",),
)
def w3_ordered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-N probe (reference ORDER BY start_time DESC LIMIT 5,
    tests/test_workflows.py:211-217). Spark plans orderBy+limit as
    TakeOrderedAndProject — true top-k, no global sort."""
    return (
        load_table(spark, sf_dir, "orders")
        .orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
        .limit(5)
        .select(
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("order_day"),
            "o_totalprice",
        )
    )


@query(
    "w4_topk_per_group",
    oracle="""
    WITH ranked AS (
      SELECT c_nationkey, c_custkey, c_acctbal,
             row_number() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM read_parquet('{sf}/customer.parquet')
    )
    SELECT c_nationkey, c_custkey, c_acctbal, rn
    FROM ranked WHERE rn <= 3
    """,
    tags=("W-ext",),
)
def w4_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group via row_number — the ranking pattern the SCD2/upsert
    emulation relies on (SURVEY §2.5 note)."""
    w = W.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), "c_custkey")
    return (
        load_table(spark, sf_dir, "customer")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_nationkey", "c_custkey", "c_acctbal", "rn")
    )


@query(
    "w5_running_total",
    oracle="""
    SELECT user_id, event_id,
           CAST(sum(CAST(value AS DECIMAL(28,6))) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS running_value
    FROM read_parquet('{sf}/events.parquet')
    """,
    tags=("W-ext",),
)
def w5_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit-frame running total — frame-spec coverage the reference
    never uses but a warehouse surface needs."""
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_id",
            F.sum(F.col("value").cast("decimal(28,6)")).over(w).cast("double").alias("running_value"),
        )
    )

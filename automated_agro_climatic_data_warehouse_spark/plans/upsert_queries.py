"""Upsert / merge / SCD2 operator queries (SURVEY §2.1 S11-S13, §2.3 J7,
§2.7 D2). The Spark side uses operators/upsert.py and operators/scd2.py;
the oracle states the same semantics as plain SQL set algebra.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import keys as K
from ..operators import insert_if_absent, scd2_apply, upsert
from ..sources import load_table
from .registry import query

# deterministic synthetic "update batch" over customer:
#  - every 7th customer gets acctbal+100 (conflict → update)
#  - every 97th spawns a brand-new customer (no conflict → insert);
#    -(key+1) keys are strictly negative, disjoint from the 0..150k·sf
#    key space at ANY sf, unlike a fixed additive offset
_UPDATES_SQL = """
      SELECT c_custkey, c_name, c_nationkey, c_acctbal + 100 AS c_acctbal,
             c_mktsegment
      FROM read_parquet('{sf}/customer.parquet') WHERE c_custkey % 7 = 0
      UNION ALL
      SELECT -(c_custkey + 1), 'Customer#' || CAST(-(c_custkey + 1) AS VARCHAR),
             c_nationkey, 0.0, 'NEW'
      FROM read_parquet('{sf}/customer.parquet') WHERE c_custkey % 97 = 0
"""


def _updates_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    changed = c.filter(F.col("c_custkey") % 7 == 0).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        (F.col("c_acctbal") + 100).alias("c_acctbal"),
        "c_mktsegment",
    )
    new = c.filter(F.col("c_custkey") % 97 == 0).select(
        (-(F.col("c_custkey") + 1)).alias("c_custkey"),
        F.concat(F.lit("Customer#"), (-(F.col("c_custkey") + 1)).cast("string")).alias(
            "c_name"
        ),
        "c_nationkey",
        F.lit(0.0).alias("c_acctbal"),
        F.lit("NEW").alias("c_mktsegment"),
    )
    return changed.unionByName(new)


@query(
    "s11_upsert_full",
    oracle=f"""
    WITH updates AS ({_UPDATES_SQL})
    SELECT * FROM updates
    UNION ALL
    SELECT t.* FROM read_parquet('{{sf}}/customer.parquet') t
    WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.c_custkey = t.c_custkey)
    """,
    tags=("S11", "J7"),
)
def s11_upsert_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-row upsert: ON CONFLICT (c_custkey) DO UPDATE over the whole row
    (reference weather sink, etl/load/postgres_loader.py:99-140)."""
    target = load_table(spark, sf_dir, "customer")
    return upsert(target, _updates_df(spark, sf_dir), ["c_custkey"])


@query(
    "j7_selective_merge",
    oracle=f"""
    WITH updates AS ({_UPDATES_SQL})
    SELECT t.c_custkey, t.c_name, t.c_nationkey,
           coalesce(u.c_acctbal, t.c_acctbal) AS c_acctbal, t.c_mktsegment
    FROM read_parquet('{{sf}}/customer.parquet') t
    LEFT JOIN updates u ON t.c_custkey = u.c_custkey
    UNION ALL
    SELECT u.c_custkey, u.c_name, u.c_nationkey, u.c_acctbal, u.c_mktsegment
    FROM updates u
    WHERE NOT EXISTS (SELECT 1 FROM read_parquet('{{sf}}/customer.parquet') t
                      WHERE t.c_custkey = u.c_custkey)
    """,
    tags=("J7", "S11"),
)
def j7_selective_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-selective merge: conflicts update ONLY c_acctbal, keeping the
    target's other columns (reference soil sink updates only
    texture/ph/metadata, postgres_loader.py:77-80)."""
    target = load_table(spark, sf_dir, "customer")
    return upsert(
        target, _updates_df(spark, sf_dir), ["c_custkey"], update_cols=["c_acctbal"]
    )


@query(
    "s12_key_resolution",
    oracle="""
    WITH dim AS (
      SELECT DISTINCT c_mktsegment, md5(c_mktsegment) AS segment_key
      FROM read_parquet('{sf}/customer.parquet')
    )
    SELECT d.segment_key, count(*) AS n_customers
    FROM read_parquet('{sf}/customer.parquet') c
    JOIN dim d ON c.c_mktsegment = d.c_mktsegment
    GROUP BY d.segment_key
    """,
    tags=("S12", "J4", "F1"),
)
def s12_key_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surrogate-key resolution via broadcast of the hashed dimension
    (reference location_map probe, postgres_loader.py:19-63 — the per-row
    RPC loop becomes one broadcast hash join)."""
    c = load_table(spark, sf_dir, "customer")
    dim = c.select("c_mktsegment").distinct().withColumn(
        "segment_key", K.natural_key("c_mktsegment")
    )
    return (
        c.join(F.broadcast(dim), "c_mktsegment")
        .groupBy("segment_key")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "s13_insert_if_absent",
    oracle="""
    WITH existing AS (
      SELECT sha256('order:' || CAST(o_orderkey AS VARCHAR)) AS key_hash
      FROM read_parquet('{sf}/orders.parquet') WHERE o_orderkey % 2 = 0
    ), incoming AS (
      SELECT o_orderkey,
             sha256('order:' || CAST(o_orderkey AS VARCHAR)) AS key_hash
      FROM read_parquet('{sf}/orders.parquet')
    )
    SELECT count(*) AS n_new, min(o_orderkey) AS first_key
    FROM incoming WHERE key_hash NOT IN (SELECT key_hash FROM existing)
    """,
    tags=("S13", "D1"),
)
def s13_insert_if_absent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Idempotency-key gate (reference etl/utils/database.py:49-63):
    only never-seen keys pass."""
    o = load_table(spark, sf_dir, "orders")
    kh = K.idempotency_key("order", F.col("o_orderkey"))
    existing = o.filter(F.col("o_orderkey") % 2 == 0).select(kh.alias("key_hash"))
    incoming = o.select("o_orderkey", kh.alias("key_hash"))
    new = insert_if_absent(existing, incoming, "key_hash")
    return new.agg(
        F.count(F.lit(1)).alias("n_new"), F.min("o_orderkey").alias("first_key")
    )


@query(
    "scd2_close_and_insert",
    oracle="""
    WITH cur AS (
      SELECT md5(CAST(c_custkey AS VARCHAR)) AS location_hash, c_custkey,
             c_acctbal, c_mktsegment
      FROM read_parquet('{sf}/customer.parquet')
    ), inc AS (
      SELECT md5(CAST(c_custkey AS VARCHAR)) AS location_hash, c_custkey,
             c_acctbal + 500 AS c_acctbal, c_mktsegment
      FROM read_parquet('{sf}/customer.parquet') WHERE c_custkey % 11 = 0
      UNION ALL
      SELECT md5(CAST(-(c_custkey + 1) AS VARCHAR)), -(c_custkey + 1),
             0.0, 'NEW'
      FROM read_parquet('{sf}/customer.parquet') WHERE c_custkey % 13 = 0
    ), changed AS (
      SELECT cur.location_hash FROM cur JOIN inc USING (location_hash)
      WHERE cur.c_acctbal IS DISTINCT FROM inc.c_acctbal
         OR cur.c_mktsegment IS DISTINCT FROM inc.c_mktsegment
    )
    SELECT location_hash, c_custkey, c_acctbal, c_mktsegment,
           DATE '2024-01-01' AS effective_date,
           DATE '2024-06-01' AS expiration_date, FALSE AS is_current
    FROM cur WHERE location_hash IN (SELECT location_hash FROM changed)
    UNION ALL
    SELECT location_hash, c_custkey, c_acctbal, c_mktsegment,
           DATE '2024-01-01', NULL, TRUE
    FROM cur WHERE location_hash NOT IN (SELECT location_hash FROM changed)
    UNION ALL
    SELECT location_hash, c_custkey, c_acctbal, c_mktsegment,
           DATE '2024-06-01', NULL, TRUE
    FROM inc WHERE location_hash IN (SELECT location_hash FROM changed)
       OR location_hash NOT IN (SELECT location_hash FROM cur)
    """,
    tags=("D2", "S11", "P2"),
)
def scd2_close_and_insert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 batch apply (reference dim_location SCD2 columns,
    db/init/01-schema.sql:22-24): changed keys close the old row and open a
    new current one; new keys insert; unchanged pass through."""
    c = load_table(spark, sf_dir, "customer")
    nk = F.md5(F.col("c_custkey").cast("string"))
    dim = c.select(
        nk.alias("location_hash"),
        "c_custkey",
        "c_acctbal",
        "c_mktsegment",
        F.lit("2024-01-01").cast("date").alias("effective_date"),
        F.lit(None).cast("date").alias("expiration_date"),
        F.lit(True).alias("is_current"),
    )
    inc_changed = c.filter(F.col("c_custkey") % 11 == 0).select(
        nk.alias("location_hash"),
        "c_custkey",
        (F.col("c_acctbal") + 500).alias("c_acctbal"),
        "c_mktsegment",
    )
    inc_new = c.filter(F.col("c_custkey") % 13 == 0).select(
        F.md5((-(F.col("c_custkey") + 1)).cast("string")).alias("location_hash"),
        (-(F.col("c_custkey") + 1)).alias("c_custkey"),
        F.lit(0.0).alias("c_acctbal"),
        F.lit("NEW").alias("c_mktsegment"),
    )
    incoming = inc_changed.unionByName(inc_new)
    return scd2_apply(
        dim,
        incoming,
        natural_key="location_hash",
        tracked_cols=["c_acctbal", "c_mktsegment"],
        as_of="2024-06-01",
    )


@query(
    "j13_scd2_pointintime",
    oracle="""
    WITH v1 AS (
      SELECT c_custkey, 1 AS version, c_acctbal AS bal_asof,
             TIMESTAMP '1995-01-01' AS eff,
             CASE WHEN c_custkey % 3 = 0 THEN TIMESTAMP '1998-01-01' END AS exp
      FROM read_parquet('{sf}/customer.parquet')
    ), v2 AS (
      SELECT c_custkey, 2 AS version, c_acctbal + 100 AS bal_asof,
             TIMESTAMP '1998-01-01' AS eff, CAST(NULL AS TIMESTAMP) AS exp
      FROM read_parquet('{sf}/customer.parquet') WHERE c_custkey % 3 = 0
    ), dim AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
    SELECT o.o_orderkey, o.o_orderdate, d.c_custkey,
           CAST(d.version AS BIGINT) AS version, d.bal_asof
    FROM read_parquet('{sf}/orders.parquet') o
    JOIN dim d ON d.c_custkey = o.o_custkey
    WHERE d.eff <= o.o_orderdate
      AND (d.exp IS NULL OR o.o_orderdate < d.exp)
    """,
    tags=("J6", "scd2", "point-in-time"),
)
def j13_scd2_pointintime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time SCD2 read: every fact row joins the dimension
    VERSION that was valid at the fact's own date (effective ≤ date <
    expiration) — the query pattern SCD2 exists to serve, completing
    the write path (scd2_close_and_insert). A synthetic two-version
    history (every third customer re-versioned at 1998-01-01) makes the
    version routing observable: pre-1998 orders see version 1, later
    orders of re-versioned customers see version 2. Plan: an EQUI hash
    join on custkey with the validity-range residual as a post-join
    filter — per-key fan-out is bounded by the version count (2 here;
    dozens at worst in practice), so this never degenerates into a
    range join; dim versions broadcast when the dimension fits, and
    the fact side is never shuffled twice."""
    c = load_table(spark, sf_dir, "customer")
    v1 = c.select(
        "c_custkey",
        F.lit(1).alias("version"),
        F.col("c_acctbal").alias("bal_asof"),
        F.lit("1995-01-01").cast("timestamp").alias("eff"),
        F.when(
            F.col("c_custkey") % 3 == 0, F.lit("1998-01-01").cast("timestamp")
        ).alias("exp"),
    )
    v2 = c.filter(F.col("c_custkey") % 3 == 0).select(
        "c_custkey",
        F.lit(2).alias("version"),
        (F.col("c_acctbal") + 100).alias("bal_asof"),
        F.lit("1998-01-01").cast("timestamp").alias("eff"),
        F.lit(None).cast("timestamp").alias("exp"),
    )
    dim = v1.unionByName(v2)
    o = load_table(spark, sf_dir, "orders")
    return (
        o.join(F.broadcast(dim), F.col("c_custkey") == F.col("o_custkey"))
        .filter(
            (F.col("eff") <= F.col("o_orderdate"))
            & (F.col("exp").isNull() | (F.col("o_orderdate") < F.col("exp")))
        )
        .select(
            "o_orderkey",
            "o_orderdate",
            "c_custkey",
            F.col("version").cast("bigint").alias("version"),
            "bal_asof",
        )
    )

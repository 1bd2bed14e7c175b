"""Classic warehouse analytics suite (TPC-H-shaped, adapted to the
driver testdata's column subset — no partsupp/shipmode/phone columns).

These widen the analytical surface beyond the reference's own queries
(SURVEY §3.3 runs ad-hoc SQL over the star schema; this is the standard
multi-join/agg corpus any warehouse user brings with them). Every plan
follows the repo parity conventions (functions/parity.py): exact-decimal
money aggregation, broadcast dimensions, no unpartitioned windows, ties
broken on unique keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import DSUM_SQL, dsum
from ..sources import load_table
from .registry import query

def _rev() -> "F.Column":
    # built lazily: classic-Spark Column construction needs an active
    # SparkContext, which doesn't exist at module import time
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


_REV_SQL = DSUM_SQL("l_extendedprice * (1 - l_discount)")


@query(
    "q7_volume_shipping",
    oracle=f"""
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           {_REV_SQL} AS revenue
    FROM read_parquet('{{sf}}/lineitem.parquet') l
    JOIN read_parquet('{{sf}}/orders.parquet') o ON o.o_orderkey = l.l_orderkey
    JOIN read_parquet('{{sf}}/customer.parquet') c ON c.c_custkey = o.o_custkey
    JOIN read_parquet('{{sf}}/nation.parquet') nc ON nc.n_nationkey = c.c_nationkey
    JOIN read_parquet('{{sf}}/supplier.parquet') s ON s.s_suppkey = l.l_suppkey
    JOIN read_parquet('{{sf}}/nation.parquet') ns ON ns.n_nationkey = s.s_nationkey
    WHERE ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
        OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
      AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01'
                           AND TIMESTAMP '1997-12-31'
    GROUP BY supp_nation, cust_nation, l_year
    """,
    tags=("analytics", "J1", "A3"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bilateral trade volume between two nations per ship year (TPC-H
    Q7 shape). The two nation dims and supplier broadcast; lineitem ⋈
    orders is the only big shuffle, and the nation-pair predicate prunes
    before aggregation. Revenue in exact decimals."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    ns = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    nc = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    return (
        l.filter(
            F.col("l_shipdate").between("1996-01-01", "1997-12-31 00:00:00")
        )
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(ns), F.col("s_nk") == F.col("s_nationkey"))
        .join(F.broadcast(nc), F.col("c_nk") == F.col("c_nationkey"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(dsum(_rev()).alias("revenue"))
    )


@query(
    "q8_market_share",
    oracle=f"""
    WITH all_rev AS (
      SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
             {DSUM_SQL("l_extendedprice * (1 - l_discount)")} AS total,
             {DSUM_SQL("CASE WHEN ns.n_name = 'NATION_3' "
                       "THEN l_extendedprice * (1 - l_discount) "
                       "ELSE 0 END")} AS nation_rev
      FROM read_parquet('{{sf}}/lineitem.parquet') l
      JOIN read_parquet('{{sf}}/orders.parquet') o ON o.o_orderkey = l.l_orderkey
      JOIN read_parquet('{{sf}}/part.parquet') p ON p.p_partkey = l.l_partkey
      JOIN read_parquet('{{sf}}/supplier.parquet') s ON s.s_suppkey = l.l_suppkey
      JOIN read_parquet('{{sf}}/nation.parquet') ns ON ns.n_nationkey = s.s_nationkey
      WHERE p.p_type = 'PROMO'
      GROUP BY o_year
    )
    SELECT o_year, nation_rev / total AS mkt_share, total AS total_revenue
    FROM all_rev
    """,
    tags=("analytics", "J1", "A3"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One nation's market share of PROMO-part revenue per order year
    (TPC-H Q8 shape). Both numerator and denominator accumulate as exact
    decimals in the SAME pass (conditional dsum), so the share is one
    IEEE division of identical operands — bit-stable cross-engine, and
    one aggregation instead of two scans."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), "n_name"
    )
    rev = _rev()
    nation_rev = F.when(F.col("n_name") == "NATION_3", rev).otherwise(
        F.lit(0.0)
    )
    agg = (
        l.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("s_nk") == F.col("s_nationkey"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            dsum(rev).alias("total"),
            dsum(nation_rev).alias("nation_rev"),
        )
    )
    return agg.select(
        "o_year",
        (F.col("nation_rev") / F.col("total")).alias("mkt_share"),
        F.col("total").alias("total_revenue"),
    )


@query(
    "q10_returned_items",
    oracle=f"""
    WITH ranked AS (
      SELECT c.c_custkey, c.c_name, n.n_name,
             {_REV_SQL} AS revenue
      FROM read_parquet('{{sf}}/lineitem.parquet') l
      JOIN read_parquet('{{sf}}/orders.parquet') o ON o.o_orderkey = l.l_orderkey
      JOIN read_parquet('{{sf}}/customer.parquet') c ON c.c_custkey = o.o_custkey
      JOIN read_parquet('{{sf}}/nation.parquet') n ON n.n_nationkey = c.c_nationkey
      WHERE l.l_returnflag = 'R'
        AND o.o_orderdate >= TIMESTAMP '1997-01-01'
        AND o.o_orderdate < TIMESTAMP '1998-01-01'
      GROUP BY c.c_custkey, c.c_name, n.n_name
    )
    SELECT c_custkey, c_name, n_name, revenue
    FROM ranked ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
    tags=("analytics", "J1", "W3"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 customers by returned-item revenue in one year (TPC-H Q10
    shape): selective returnflag + date predicates push into the scan,
    customer/nation broadcast, and the final top-k plans as
    TakeOrderedAndProject (per-partition heaps — never a global sort).
    Tie-break on c_custkey keeps the cut deterministic."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01")
        & (F.col("o_orderdate") < "1998-01-01")
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        l.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(_rev()).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "q13_customer_distribution",
    oracle="""
    WITH per_cust AS (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM read_parquet('{sf}/customer.parquet') c
      LEFT JOIN read_parquet('{sf}/orders.parquet') o
        ON o.o_custkey = c.c_custkey
       AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    SELECT c_count, count(*) AS custdist
    FROM per_cust GROUP BY c_count
    """,
    tags=("analytics", "J3", "A5"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count distribution INCLUDING zero-order customers
    (TPC-H Q13 shape): the left outer join is the part a naive inner-join
    rewrite silently drops. count(o_orderkey) counts only matched rows —
    nulls from the outer side fall out, which both engines agree on. Two
    shuffles: the outer join on custkey, then the tiny count-of-counts."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


@query(
    "q14_promo_effect",
    oracle=f"""
    SELECT 100.0 * {DSUM_SQL("CASE WHEN p.p_type = 'PROMO' "
                             "THEN l_extendedprice * (1 - l_discount) "
                             "ELSE 0 END")}
           / {DSUM_SQL("l_extendedprice * (1 - l_discount)")} AS promo_pct
    FROM read_parquet('{{sf}}/lineitem.parquet') l
    JOIN read_parquet('{{sf}}/part.parquet') p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-03-01'
      AND l.l_shipdate < TIMESTAMP '1997-04-01'
    """,
    tags=("analytics", "J4", "A3"),
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promo revenue share for one month (TPC-H Q14 shape): the date
    predicate prunes the fact scan, part broadcasts, and both decimal
    sums accumulate in one pass; 100·a/b is two IEEE ops on identical
    operands."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-03-01")
        & (F.col("l_shipdate") < "1997-04-01")
    )
    p = load_table(spark, sf_dir, "part")
    promo = F.when(F.col("p_type") == "PROMO", _rev()).otherwise(F.lit(0.0))
    agg = (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .agg(dsum(promo).alias("pr"), dsum(_rev()).alias("tr"))
    )
    return agg.select(
        (F.lit(100.0) * F.col("pr") / F.col("tr")).alias("promo_pct")
    )


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH srev AS (
      SELECT l_suppkey AS supplier_no, {_REV_SQL} AS total_revenue
      FROM read_parquet('{{sf}}/lineitem.parquet')
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM srev r
    JOIN read_parquet('{{sf}}/supplier.parquet') s
      ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM srev)
    """,
    tags=("analytics", "J4", "A3"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier(s) by quarterly revenue (TPC-H Q15 shape). The max
    rides back as a 1-row broadcast crossJoin + equality filter — no
    window at all, so no single-partition sort and exact-decimal
    equality keeps multi-winner ties correct."""
    l = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1997-04-01")
    )
    s = load_table(spark, sf_dir, "supplier")
    srev = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(_rev()).alias("total_revenue")
    )
    mx = srev.agg(F.max("total_revenue").alias("mx"))
    return (
        srev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q17_small_qty_revenue",
    oracle=f"""
    WITH pavg AS (
      SELECT l_partkey AS avg_pk,
             {DSUM_SQL('l_quantity')} / count(*) AS avg_qty
      FROM read_parquet('{{sf}}/lineitem.parquet')
      GROUP BY l_partkey
    )
    SELECT {DSUM_SQL('l_extendedprice')} / 7.0 AS avg_yearly
    FROM read_parquet('{{sf}}/lineitem.parquet') l
    JOIN read_parquet('{{sf}}/part.parquet') p ON p.p_partkey = l.l_partkey
    JOIN pavg ON pavg.avg_pk = l.l_partkey
    WHERE p.p_brand = 'Brand#3' AND p.p_size < 10
      AND l.l_quantity < 0.2 * pavg.avg_qty
    """,
    tags=("analytics", "J4", "A3"),
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue lost to small-quantity orders of one brand (TPC-H Q17
    shape — the correlated-subquery classic). The per-part average
    quantity DECORRELATES into a groupBy + equi-join: one extra shuffle
    on partkey instead of one subquery per row; the brand/size filter
    broadcasts. avg as exact-decimal sum / count keeps the 0.2·avg
    threshold comparison bit-stable."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#3") & (F.col("p_size") < 10)
    )
    pavg = l.groupBy(F.col("l_partkey").alias("avg_pk")).agg(
        (dsum("l_quantity") / F.count(F.col("l_quantity"))).alias("avg_qty")
    )
    joined = (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(pavg, F.col("avg_pk") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
    )
    return joined.agg(
        (dsum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly")
    )


@query(
    "q19_discounted_revenue",
    oracle=f"""
    SELECT {_REV_SQL} AS revenue
    FROM read_parquet('{{sf}}/lineitem.parquet') l
    JOIN read_parquet('{{sf}}/part.parquet') p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    tags=("analytics", "J4", "P5"),
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive multi-predicate revenue (TPC-H Q19 shape): three
    (brand, size, quantity) bands OR-ed together. The join stays a
    single broadcast hash join on partkey with the disjunction evaluated
    post-join — Catalyst cannot split an OR across join keys, but the
    part side prunes to the union of the three brand/size bands before
    broadcasting."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 5)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 10)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
        )
    )
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(dsum(_rev()).alias("revenue"))
    )

"""Join operators (SURVEY §2.3, J2-J6; J1 lives in core.py, J7 in
upsert_queries.py).

Scale notes: every small side is explicitly `F.broadcast`-hinted so the
plans stay shuffle-free where possible; the only shuffling joins are
fact⋈fact (lineitem⋈orders), which AQE re-plans at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

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


@query(
    "j14_geo_grid_nearest",
    oracle="""
    WITH st AS (
      SELECT s_suppkey,
             CAST(('0x' || substr(md5('lat:' || CAST(s_suppkey AS VARCHAR)),
                   1, 8)) AS BIGINT) % 1800 AS lat_dd,
             CAST(('0x' || substr(md5('lon:' || CAST(s_suppkey AS VARCHAR)),
                   1, 8)) AS BIGINT) % 3600 AS lon_dd
      FROM read_parquet('{sf}/supplier.parquet')
    ), pr AS (
      SELECT c_custkey,
             CAST(('0x' || substr(md5('lat:c' || CAST(c_custkey AS VARCHAR)),
                   1, 8)) AS BIGINT) % 1800 AS lat_dd,
             CAST(('0x' || substr(md5('lon:c' || CAST(c_custkey AS VARCHAR)),
                   1, 8)) AS BIGINT) % 3600 AS lon_dd
      FROM read_parquet('{sf}/customer.parquet')
    ), st9 AS (
      SELECT s.s_suppkey, s.lat_dd, s.lon_dd,
             s.lat_dd // 100 + o.da AS cl,
             (s.lon_dd // 100 + o.db + 36) % 36 AS cn
      FROM st s, (VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),
                         (1,-1),(1,0),(1,1)) AS o(da, db)
    ), cand AS (
      SELECT p.c_custkey, s.s_suppkey,
             (p.lat_dd - s.lat_dd) * (p.lat_dd - s.lat_dd)
             + least(abs(p.lon_dd - s.lon_dd),
                     3600 - abs(p.lon_dd - s.lon_dd))
               * least(abs(p.lon_dd - s.lon_dd),
                       3600 - abs(p.lon_dd - s.lon_dd)) AS d2
      FROM pr p JOIN st9 s
        ON s.cl = p.lat_dd // 100 AND s.cn = p.lon_dd // 100
    )
    SELECT c_custkey, s_suppkey AS nearest_suppkey, CAST(d2 AS BIGINT) AS d2
    FROM (
      SELECT c_custkey, s_suppkey, d2,
             row_number() OVER (PARTITION BY c_custkey
                                ORDER BY d2, s_suppkey) AS rk
      FROM cand
    ) WHERE rk = 1
    """,
    tags=("joins", "geo", "blocking"),
)
def j14_geo_grid_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-station spatial join with grid-cell blocking — the
    weather-station lookup an agro-climatic warehouse runs per field
    (reference domain: SoilGrids/Open-Meteo are point APIs; at warehouse
    scale the same question is a spatial join). Coordinates are planted
    deterministically (hash of the key → offset decidegrees, so every
    scale factor has them); the scale story is the join shape: each
    station registers in its 10°×10° grid cell AND the 8 neighbors (a
    9× bounded fan-out of the SMALL side), probes join on their single
    cell — an EQUI-join a shuffle can partition, never an all-pairs
    theta join; per-probe candidates are ring-bounded, and the argmin
    is a per-probe row_number. Distance is integer squared
    equirectangular decidegrees with longitude wraparound (least of the
    two ways round) — the blocking metric; production would rescore the
    top candidates with haversine, which changes no plumbing. Contract:
    a probe whose 3×3 ring holds no station yields no row (radius-
    bounded lookup, not a global scan). Offset coords keep every value
    nonnegative so integer division floors identically on both engines."""
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    from ..operators.dedup import hash32

    def coords(df, key, salt):
        return df.select(
            key,
            (hash32(F.concat(F.lit(f"lat:{salt}"), F.col(key).cast("string"))) % 1800).alias("lat_dd"),
            (hash32(F.concat(F.lit(f"lon:{salt}"), F.col(key).cast("string"))) % 3600).alias("lon_dd"),
        )

    st = coords(sup, "s_suppkey", "")
    pr = coords(cust, "c_custkey", "c")
    offs = F.array(
        *[
            F.struct(F.lit(a).alias("da"), F.lit(b).alias("db"))
            for a in (-1, 0, 1)
            for b in (-1, 0, 1)
        ]
    )
    st9 = st.select(
        "s_suppkey",
        F.col("lat_dd").alias("s_lat"),
        F.col("lon_dd").alias("s_lon"),
        F.explode(offs).alias("o"),
    ).select(
        "s_suppkey",
        "s_lat",
        "s_lon",
        (F.expr("s_lat div 100") + F.col("o.da")).alias("cl"),
        ((F.expr("s_lon div 100") + F.col("o.db") + 36) % 36).alias("cn"),
    )
    dlat = F.col("lat_dd") - F.col("s_lat")
    dlon_raw = F.abs(F.col("lon_dd") - F.col("s_lon"))
    dlon = F.least(dlon_raw, F.lit(3600) - dlon_raw)
    cand = pr.join(
        st9,
        (F.col("cl") == F.expr("lat_dd div 100"))
        & (F.col("cn") == F.expr("lon_dd div 100")),
    ).select(
        "c_custkey",
        "s_suppkey",
        (dlat * dlat + dlon * dlon).cast("bigint").alias("d2"),
    )
    w = W.partitionBy("c_custkey").orderBy("d2", "s_suppkey")
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "c_custkey",
            F.col("s_suppkey").alias("nearest_suppkey"),
            "d2",
        )
    )


@query(
    "j15_market_basket",
    oracle="""
    WITH li AS (
      SELECT DISTINCT l_orderkey, l_partkey
      FROM read_parquet('{sf}/lineitem.parquet')
    ), pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )
    SELECT part_a, part_b, CAST(count(*) AS BIGINT) AS n_orders
    FROM pairs GROUP BY part_a, part_b
    ORDER BY n_orders DESC, part_a ASC, part_b ASC
    LIMIT 20
    """,
    tags=("joins", "market-basket", "co-occurrence"),
)
def j15_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top bought-together part pairs — co-occurrence mining (the
    association-rule / recommendation seed). The naive form is a fact
    self-join; the scale-safe property making it tractable is that the
    pair fan-out is PER-ORDER quadratic, not corpus quadratic: orders
    hold a handful of distinct parts (TPC-H ≤7), so the equi-self-join
    on l_orderkey — co-partitioned, both sides the same shuffle — emits
    ≤ C(7,2) pairs per order, linear in orders overall. A pathological
    giant basket would be the hot key; the production guard caps
    basket size (a 10k-item basket's pairs are boilerplate, the same
    argument as the MinHash stop-gram df cap). The (a < b)
    canonicalization halves the pairs and makes them well-ordered;
    counting groups on the bounded popular-pair key space with map-side
    partials, and the top-20 is TakeOrderedAndProject with a total
    (count desc, pair asc) tiebreak."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    b = li.select(
        F.col("l_orderkey").alias("o2"), F.col("l_partkey").alias("part_b")
    )
    pairs = li.join(
        b,
        (F.col("l_orderkey") == F.col("o2"))
        & (F.col("l_partkey") < F.col("part_b")),
    ).select(F.col("l_partkey").alias("part_a"), "part_b")
    return (
        pairs.groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.desc("n_orders"), F.asc("part_a"), F.asc("part_b"))
        .limit(20)
    )

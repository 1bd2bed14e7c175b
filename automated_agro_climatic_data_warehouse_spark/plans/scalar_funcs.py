"""Scalar-function operator queries (SURVEY §2.8 F1-F12, F22-F24).

Each query exercises one function family from
automated_agro_climatic_data_warehouse_spark.functions over testdata, with a
DuckDB oracle twin. All JVM-side column expressions — zero UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import keys
from ..sources import load_table
from .registry import query


@query(
    "f01_md5_natural_key",
    oracle="""
    SELECT c_custkey,
           md5(printf('%.6f,%.6f', c_acctbal, CAST(c_custkey AS DOUBLE))) AS location_hash
    FROM read_parquet('{sf}/customer.parquet')
    """,
    tags=("F1", "D2"),
)
def f01_md5_natural_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MD5 natural key with fixed-decimal formatting (reference
    etl/transform/transformers.py:77-79) — format parity is the test."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.md5(
            F.format_string(
                "%.6f,%.6f", F.col("c_acctbal"), F.col("c_custkey").cast("double")
            )
        ).alias("location_hash"),
    )


@query(
    "f02_sha256_idempotency",
    oracle="""
    SELECT o_orderkey,
           sha256('order:' || CAST(o_orderkey AS VARCHAR)) AS key_hash
    FROM read_parquet('{sf}/orders.parquet')
    WHERE o_orderkey % 100 = 0
    """,
    tags=("F2", "D1"),
)
def f02_sha256_idempotency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHA-256 idempotency key (reference etl/utils/database.py:51-52)."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey",
        keys.idempotency_key("order", F.col("o_orderkey")).alias("key_hash"),
    )


@query(
    "f03_date_key_roundtrip",
    oracle="""
    SELECT DISTINCT CAST(strftime(o_orderdate, '%Y%m%d') AS INT) AS date_key,
           CAST(o_orderdate AS DATE) AS decoded
    FROM read_parquet('{sf}/orders.parquet')
    """,
    tags=("F3",),
)
def f03_date_key_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """YYYYMMDD encode + decode roundtrip (reference transformers.py:42)."""
    o = load_table(spark, sf_dir, "orders")
    k = keys.date_key(F.col("o_orderdate"))
    return o.select(
        k.alias("date_key"), keys.date_key_decode(k).alias("decoded")
    ).distinct()


@query(
    "f05_case_labeling",
    oracle="""
    SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                WHEN o_totalprice < 200000 THEN 'medium'
                ELSE 'large' END AS size_tier,
           count(*) AS n
    FROM read_parquet('{sf}/orders.parquet')
    GROUP BY size_tier
    """,
    tags=("F5",),
)
def f05_case_labeling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE labeling (reference compatibility labels,
    db/init/01-schema.sql:263-266)."""
    o = load_table(spark, sf_dir, "orders")
    tier = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 200000, "medium")
        .otherwise("large")
    )
    return o.groupBy(tier.alias("size_tier")).agg(F.count(F.lit(1)).alias("n"))


@query(
    "f06_coalesce_defaults",
    oracle="""
    SELECT count(CASE WHEN coalesce(nullif(l_discount, 0.0), -1.0) = -1.0
                 THEN 1 END) AS n_defaulted,
           count(*) AS n_total
    FROM read_parquet('{sf}/lineitem.parquet')
    """,
    tags=("F6",),
)
def f06_coalesce_defaults(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COALESCE null-defaulting (reference tests/test_workflows.py:117-123)."""
    li = load_table(spark, sf_dir, "lineitem")
    defaulted = F.coalesce(F.nullif(F.col("l_discount"), F.lit(0.0)), F.lit(-1.0))
    return li.agg(
        F.count(F.when(defaulted == -1.0, 1)).alias("n_defaulted"),
        F.count(F.lit(1)).alias("n_total"),
    )


@query(
    "f07_round_clamp",
    oracle="""
    SELECT greatest(0.02, least(0.08, l_discount)) AS clamped, count(*) AS n
    FROM read_parquet('{sf}/lineitem.parquet')
    GROUP BY clamped
    """,
    tags=("F7",),
)
def f07_round_clamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """greatest/least clamping (reference `_clamp`, cleaners.py:526-530)."""
    li = load_table(spark, sf_dir, "lineitem")
    clamped = F.greatest(F.lit(0.02), F.least(F.lit(0.08), F.col("l_discount")))
    return li.groupBy(clamped.alias("clamped")).agg(F.count(F.lit(1)).alias("n"))


@query(
    "f08_unit_correction",
    oracle="""
    SELECT event_id,
           CASE WHEN value > 60 THEN (value - 32) * 5 / 9 ELSE value END AS value_c
    FROM read_parquet('{sf}/events.parquet')
    WHERE event_id % 50 = 0
    """,
    tags=("F8",),
)
def f08_unit_correction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional °F→°C correction (reference cleaners.py:401-413) —
    row-level IEEE arithmetic, emitted unrounded."""
    ev = load_table(spark, sf_dir, "events")
    v = F.col("value")
    return ev.filter(F.col("event_id") % 50 == 0).select(
        "event_id",
        F.when(v > 60, (v - 32) * 5 / 9).otherwise(v).alias("value_c"),
    )


@query(
    "f09_minmax_swap",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           least(l_discount, l_tax) AS rate_lo,
           greatest(l_discount, l_tax) AS rate_hi
    FROM read_parquet('{sf}/lineitem.parquet')
    WHERE l_orderkey % 500 = 0
    """,
    tags=("F9",),
)
def f09_minmax_swap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min/max swap repair (reference cleaners.py:280-283)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_orderkey") % 500 == 0).select(
        "l_orderkey",
        "l_linenumber",
        F.least("l_discount", "l_tax").alias("rate_lo"),
        F.greatest("l_discount", "l_tax").alias("rate_hi"),
    )


@query(
    "f10_nan_inf_scrub",
    oracle="""
    WITH noisy AS (
      SELECT event_id,
             CASE WHEN event_id % 100 = 0 THEN CAST('nan' AS DOUBLE)
                  WHEN event_id % 101 = 0 THEN CAST('inf' AS DOUBLE)
                  ELSE value END AS v
      FROM read_parquet('{sf}/events.parquet')
    )
    SELECT count(*) AS n_total,
           count(CASE WHEN isnan(v) OR v = CAST('inf' AS DOUBLE)
                        OR v = CAST('-inf' AS DOUBLE) THEN 1 END) AS n_scrubbed
    FROM noisy
    """,
    tags=("F10",),
)
def f10_nan_inf_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NaN/Inf scrub (reference cleaners.py:415-426): inject deterministic
    NaN/Inf, count what the scrubber nulls."""
    ev = load_table(spark, sf_dir, "events")
    v = (
        F.when(F.col("event_id") % 100 == 0, F.lit("nan").cast("double"))
        .when(F.col("event_id") % 101 == 0, F.lit("inf").cast("double"))
        .otherwise(F.col("value"))
    )
    from ..functions.cleaning import scrub_nan_inf

    scrubbed = scrub_nan_inf(v)
    return ev.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.when(scrubbed.isNull() & v.isNotNull(), 1)).alias("n_scrubbed"),
    )


@query(
    "f11_synonym_canonicalize",
    oracle="""
    SELECT coalesce(
             CASE event_type WHEN 'click' THEN 'Click'
                             WHEN 'view' THEN 'Impression'
                             WHEN 'purchase' THEN 'Conversion' END,
             upper(substr(event_type, 1, 1)) || lower(substr(event_type, 2))
           ) AS canonical_type,
           count(*) AS n
    FROM read_parquet('{sf}/events.parquet')
    GROUP BY canonical_type
    """,
    tags=("F11",),
)
def f11_synonym_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synonym-map canonicalization with initcap fallback (reference crop
    synonym dict, cleaners.py:445-479). The fallback is spelled
    upper(first)+lower(rest) because DuckDB 1.0 lacks initcap — same
    result for single-word tokens."""
    ev = load_table(spark, sf_dir, "events")
    mapping = F.create_map(
        F.lit("click"), F.lit("Click"),
        F.lit("view"), F.lit("Impression"),
        F.lit("purchase"), F.lit("Conversion"),
    )
    et = F.col("event_type")
    fallback = F.concat(
        F.upper(F.substring(et, 1, 1)), F.lower(F.expr("substring(event_type, 2)"))
    )
    canonical = F.coalesce(F.element_at(mapping, et), fallback)
    return ev.groupBy(canonical.alias("canonical_type")).agg(
        F.count(F.lit(1)).alias("n")
    )


@query(
    "f12_texture_triangle",
    oracle="""
    WITH comp AS (
      SELECT l_quantity AS clay, l_discount * 400 AS sand, l_tax * 400 AS silt
      FROM read_parquet('{sf}/lineitem.parquet')
    ), normed AS (
      SELECT clay / (clay + sand + silt) * 100.0 AS n_clay,
             sand / (clay + sand + silt) * 100.0 AS n_sand,
             silt / (clay + sand + silt) * 100.0 AS n_silt
      FROM comp
    )
    SELECT CASE WHEN n_clay >= 40.0 THEN 'Clay'
                WHEN n_sand >= 70.0 AND n_clay < 15.0 THEN 'Sand'
                WHEN n_silt >= 80.0 THEN 'Silt'
                WHEN n_clay >= 27.0 AND n_sand <= 45.0 THEN 'Clay Loam'
                WHEN n_sand >= 52.0 THEN 'Sandy Loam'
                WHEN n_silt >= 50.0 THEN 'Silt Loam'
                ELSE 'Loam' END AS texture,
           count(*) AS n
    FROM normed
    GROUP BY texture
    """,
    tags=("F12",),
)
def f12_texture_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """USDA texture-triangle classifier (reference cleaners.py:481-511)
    over synthetic composition columns derived from lineitem."""
    from ..functions.cleaning import usda_texture

    li = load_table(spark, sf_dir, "lineitem")
    tex = usda_texture(
        F.col("l_quantity"), F.col("l_discount") * 400, F.col("l_tax") * 400
    )
    return li.groupBy(tex.alias("texture")).agg(F.count(F.lit(1)).alias("n"))


@query(
    "f22_json_metadata",
    oracle="""
    SELECT c_custkey,
           to_json(struct_pack(source := 'customer_feed',
                               entity_key := c_custkey,
                               segment := c_mktsegment)) AS metadata
    FROM read_parquet('{sf}/customer.parquet')
    WHERE c_custkey % 10 = 0
    """,
    tags=("F22",),
)
def f22_json_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON metadata construction (reference transformers.py:29-37) —
    to_json(struct(...)); both engines emit compact key-ordered JSON."""
    c = load_table(spark, sf_dir, "customer")
    return c.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        F.to_json(
            F.struct(
                F.lit("customer_feed").alias("source"),
                F.col("c_custkey").alias("entity_key"),
                F.col("c_mktsegment").alias("segment"),
            )
        ).alias("metadata"),
    )


@query(
    "f23_array_evidence_slice",
    oracle="""
    SELECT c_nationkey,
           array_to_string(list_slice(list_sort(list(c_name)), 1, 5), ',')
             AS top_names
    FROM read_parquet('{sf}/customer.parquet')
    GROUP BY c_nationkey
    """,
    tags=("F23",),
)
def f23_array_evidence_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 evidence slice (reference raw_evidence[:5],
    nlp_extractor.py:114): collect → sort (determinism) → slice →
    stringify for hashing."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.concat_ws(
            ",", F.slice(F.sort_array(F.collect_list("c_name")), 1, 5)
        ).alias("top_names")
    )


@query(
    "f24_round_halfup",
    oracle="""
    SELECT round(c_acctbal) AS rounded_bal, count(*) AS n
    FROM read_parquet('{sf}/customer.parquet')
    GROUP BY rounded_bal
    """,
    tags=("F24",),
)
def f24_round_halfup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer rounding (reference round(x, n) everywhere,
    cleaners.py:224-225). Ties-away-from-zero agrees between Spark
    (HALF_UP on the exact binary value) and DuckDB (C round()) at integer
    precision; fractional-digit round() is NOT portable — see
    functions/parity.py."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy(F.round("c_acctbal").alias("rounded_bal")).agg(
        F.count(F.lit(1)).alias("n")
    )

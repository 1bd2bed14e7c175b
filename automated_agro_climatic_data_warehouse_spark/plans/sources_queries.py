"""Source-operator queries (SURVEY §2.1 S2, S4, S8) over testdata.

S2/S4 construct the raw payload shapes deterministically from table
columns, run the landing-layer parsers, and oracle-check that the parse
recovers the planted values. S8 is the multi-source priority fallback.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from ..sources.landing import parse_soil_payload, unzip_daily_arrays
from .registry import query


@query(
    "s02_json_payload_parse",
    oracle="""
    SELECT s_suppkey,
           CAST(s_suppkey % 60 AS DOUBLE) AS clay_0_5cm,
           CAST(s_suppkey % 40 AS DOUBLE) AS sand_0_5cm,
           CAST(100 - s_suppkey % 60 - s_suppkey % 40 AS DOUBLE) AS silt_0_5cm,
           CAST(55 + s_suppkey % 30 AS DOUBLE) / 10.0 AS ph_descaled
    FROM read_parquet('{sf}/supplier.parquet')
    """,
    tags=("S2", "S1", "F8"),
)
def s02_json_payload_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SoilGrids-shaped JSON payload → from_json + higher-order array
    navigation → typed columns (reference soil_api.py:81-116), plus the
    ×10 pH descale (F8). The oracle states the planted values — the
    parser must recover them exactly."""
    s = load_table(spark, sf_dir, "supplier")
    clay = (F.col("s_suppkey") % 60).cast("string")
    sand = (F.col("s_suppkey") % 40).cast("string")
    silt = (100 - F.col("s_suppkey") % 60 - F.col("s_suppkey") % 40).cast("string")
    ph10 = (55 + F.col("s_suppkey") % 30).cast("string")  # ×10-scaled, like the API

    def layer(name: str, mean: F.Column) -> F.Column:
        return F.concat(
            F.lit('{"name": "' + name + '", "depths": [{"label": "0-5cm", '
                  '"values": {"mean": '),
            mean,
            F.lit("}}]}"),
        )

    payload = F.concat(
        F.lit('{"properties": {"layers": ['),
        layer("clay", clay), F.lit(", "),
        layer("sand", sand), F.lit(", "),
        layer("silt", silt), F.lit(", "),
        layer("phh2o", ph10),
        F.lit("]}}"),
    )
    parsed = parse_soil_payload(
        s.select("s_suppkey", payload.alias("payload"))
    )
    from ..functions.cleaning import fix_ph_scale

    return parsed.select(
        "s_suppkey",
        "clay_0_5cm",
        "sand_0_5cm",
        "silt_0_5cm",
        fix_ph_scale(F.col("ph_0_5cm")).alias("ph_descaled"),
    )


@query(
    "s04_parallel_array_unzip",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM read_parquet('{sf}/lineitem.parquet')
    """,
    tags=("S4",),
)
def s04_parallel_array_unzip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-Meteo parallel-array pivot (reference weather_api.py:95-125):
    roll lineitem up into per-order parallel arrays (the API response
    shape), then arrays_zip+explode back to rows. The oracle is the
    original table — a perfect roundtrip proves the unzip."""
    li = load_table(spark, sf_dir, "lineitem")
    nested = li.groupBy("l_orderkey").agg(
        F.sort_array(
            F.collect_list(F.struct("l_linenumber", "l_quantity", "l_extendedprice"))
        ).alias("rows")
    ).select(
        "l_orderkey",
        F.col("rows.l_linenumber").alias("linenumbers"),
        F.col("rows.l_quantity").alias("quantities"),
        F.col("rows.l_extendedprice").alias("prices"),
    )
    return unzip_daily_arrays(
        nested,
        {
            "l_linenumber": "linenumbers",
            "l_quantity": "quantities",
            "l_extendedprice": "prices",
        },
    )


@query(
    "s08_priority_fallback",
    oracle="""
    WITH src_a AS (
      SELECT p_partkey, p_retailprice AS price, 0.9 AS reliability, 'fao' AS src
      FROM read_parquet('{sf}/part.parquet') WHERE p_partkey % 3 <> 0
    ), src_b AS (
      SELECT p_partkey, p_retailprice + 1 AS price, 0.6 AS reliability, 'usda' AS src
      FROM read_parquet('{sf}/part.parquet') WHERE p_partkey % 2 <> 0
    ), unioned AS (
      SELECT * FROM src_a UNION ALL SELECT * FROM src_b
    ), ranked AS (
      SELECT *, row_number() OVER (PARTITION BY p_partkey
                                   ORDER BY reliability DESC, src) AS rn
      FROM unioned
    )
    SELECT p_partkey, price, src FROM ranked WHERE rn = 1
    """,
    tags=("S8", "S6", "S7"),
)
def s08_priority_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source scan with priority fallback (reference
    scrape_multiple_crops FAO-first chain, web_scraper.py:168-184 +
    data-quality.yml:45-47): union per-source frames, keep the
    highest-reliability row per key. Rows only in the lower-priority
    source survive — fallback, not override."""
    from pyspark.sql.window import Window as W

    p = load_table(spark, sf_dir, "part")
    src_a = p.filter(F.col("p_partkey") % 3 != 0).select(
        "p_partkey",
        F.col("p_retailprice").alias("price"),
        F.lit(0.9).alias("reliability"),
        F.lit("fao").alias("src"),
    )
    src_b = p.filter(F.col("p_partkey") % 2 != 0).select(
        "p_partkey",
        (F.col("p_retailprice") + 1).alias("price"),
        F.lit(0.6).alias("reliability"),
        F.lit("usda").alias("src"),
    )
    w = W.partitionBy("p_partkey").orderBy(F.desc("reliability"), "src")
    return (
        src_a.unionByName(src_b)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("p_partkey", "price", "src")
    )


@query(
    "s06_html_text_extract",
    oracle="""
    WITH page AS (
      SELECT doc_id,
             '<html><head><script>var x=1;</script><style>.a{color:red}</style>'
             || '</head><body><nav>menu</nav><h1>Crop profile</h1><p>'
             || text || '</p><footer>copyright</footer></body></html>' AS html
      FROM read_parquet('{sf}/documents.parquet')
    ), stripped AS (
      SELECT doc_id,
        regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        regexp_replace(html,
          '<script[^>]*>.*?</script>', ' ', 'gs'),
          '<style[^>]*>.*?</style>', ' ', 'gs'),
          '<(nav|footer)[^>]*>.*?</(nav|footer)>', ' ', 'gs'),
          '<[^>]+>', ' ', 'g'),
          '\\s+', ' ', 'g') AS t
      FROM page
    )
    SELECT doc_id, trim(t) AS page_text FROM stripped
    """,
    tags=("S6", "S7", "F16"),
)
def s06_html_text_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML page scan → visible text (reference web_scraper.py:94-131:
    strip script/style/nav/footer then extract text). BeautifulSoup's job
    done with native regexp_replace chains — JVM-side, no Python parser
    in the hot path; (?s) dotall matches across embedded newlines."""
    docs = load_table(spark, sf_dir, "documents")
    html = F.concat(
        F.lit(
            "<html><head><script>var x=1;</script><style>.a{color:red}</style>"
            "</head><body><nav>menu</nav><h1>Crop profile</h1><p>"
        ),
        F.col("text"),
        F.lit("</p><footer>copyright</footer></body></html>"),
    )
    t = F.regexp_replace(html, "(?s)<script[^>]*>.*?</script>", " ")
    t = F.regexp_replace(t, "(?s)<style[^>]*>.*?</style>", " ")
    t = F.regexp_replace(t, "(?s)<(nav|footer)[^>]*>.*?</(nav|footer)>", " ")
    t = F.regexp_replace(t, "<[^>]+>", " ")
    t = F.regexp_replace(t, "\\s+", " ")
    return docs.select("doc_id", F.trim(t).alias("page_text"))


@query(
    "s16_corrupt_json_recovery",
    oracle="""
    WITH payloads AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 50 = 0
                  THEN substr(j, 1, length(j) - 6)   -- truncated mid-object
                  ELSE j END AS payload
      FROM (
        SELECT o_orderkey,
               '{"k": ' || CAST(o_orderkey AS VARCHAR)
               || ', "c": ' || CAST(o_custkey AS VARCHAR)
               || ', "s": "' || o_orderstatus || '"}' AS j
        FROM read_parquet('{sf}/orders.parquet')
      )
    )
    SELECT count(CASE WHEN json_valid(payload) THEN 1 END) AS n_valid,
           count(CASE WHEN NOT json_valid(payload) THEN 1 END) AS n_corrupt,
           CAST(sum(CASE WHEN json_valid(payload)
                         THEN CAST(payload ->> 'k' AS BIGINT) END) AS BIGINT)
             AS sum_recovered_keys
    FROM payloads
    """,
    tags=("S2", "S9", "robustness"),
)
def s16_corrupt_json_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corrupt-tolerant JSON ingestion (the schema-drift / partial-payload
    reality of the reference's API sources, soil_api.py error paths):
    every 50th payload is truncated mid-object; `from_json` yields NULL
    for unparseable rows instead of failing the job, and the query
    separates recovered rows from quarantined ones — the
    PERMISSIVE-mode landing pattern. At 100 TB this is the difference
    between one bad record killing a 6-hour load and a dead-letter
    count."""
    o = load_table(spark, sf_dir, "orders")
    j = F.concat(
        F.lit('{"k": '),
        F.col("o_orderkey").cast("string"),
        F.lit(', "c": '),
        F.col("o_custkey").cast("string"),
        F.lit(', "s": "'),
        F.col("o_orderstatus"),
        F.lit('"}'),
    )
    payload = F.when(
        F.col("o_orderkey") % 50 == 0, F.substring(j, 1, F.length(j) - 6)
    ).otherwise(j)
    parsed = o.select(
        payload.alias("payload"),
        F.from_json(payload, "k long, c long, s string").alias("p"),
    )
    valid = F.col("p").isNotNull() & F.col("p.k").isNotNull()
    return parsed.agg(
        F.count(F.when(valid, 1)).alias("n_valid"),
        F.count(F.when(~valid, 1)).alias("n_corrupt"),
        F.sum(F.when(valid, F.col("p.k"))).alias("sum_recovered_keys"),
    )


@query(
    "s19_union_by_name_evolution",
    oracle="""
    WITH v1 AS (
      SELECT o_orderkey, o_custkey, o_totalprice,
             CAST(NULL AS VARCHAR) AS o_orderpriority
      FROM read_parquet('{sf}/orders.parquet') WHERE o_orderkey % 2 = 0
    ), v2 AS (
      SELECT o_orderkey, o_custkey, CAST(NULL AS DOUBLE) AS o_totalprice,
             o_orderpriority
      FROM read_parquet('{sf}/orders.parquet') WHERE o_orderkey % 2 = 1
    ), unioned AS (
      SELECT * FROM v1 UNION ALL SELECT * FROM v2
    )
    SELECT CAST(o_orderkey % 2 AS BIGINT) AS schema_version,
           count(*) AS n_rows,
           count(o_totalprice) AS n_price,
           count(o_orderpriority) AS n_priority,
           CAST(sum(CAST(coalesce(o_totalprice, 0) AS DECIMAL(28,6)))
                AS DOUBLE) AS total_price
    FROM unioned GROUP BY schema_version
    """,
    tags=("S11", "schema-evolution", "union"),
)
def s19_union_by_name_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution merge via the REAL `unionByName(
    allowMissingColumns=True)` operator: two snapshots of the orders
    feed with drifted schemas (v1 carries o_totalprice, v2 dropped it
    and added o_orderpriority) align BY COLUMN NAME with engine-side
    NULL fill for each side's missing columns — the position-blind
    union every multi-vintage data lake needs (positional UNION would
    silently zip mismatched columns; a failed read would stall the
    feed). The oracle replays the alignment with explicit typed-NULL
    projections. Aggregated per schema vintage so the NULL-fill
    pattern is value-checked: each side's own column is fully
    populated, the other side's is fully NULL, and the price sum rides
    the decimal rail. Column pruning still reaches both scans — the
    union is late-projected."""
    orders = load_table(spark, sf_dir, "orders")
    v1 = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    v2 = orders.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    unioned = v1.unionByName(v2, allowMissingColumns=True)
    return unioned.groupBy(
        (F.col("o_orderkey") % 2).cast("bigint").alias("schema_version")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_totalprice").alias("n_price"),
        F.count("o_orderpriority").alias("n_priority"),
        F.sum(
            F.coalesce(F.col("o_totalprice"), F.lit(0)).cast("decimal(28,6)")
        )
        .cast("double")
        .alias("total_price"),
    )

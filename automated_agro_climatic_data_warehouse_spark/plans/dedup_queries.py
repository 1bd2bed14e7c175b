"""Deduplication operator queries — reference surface D1-D3 (SURVEY §2.7).

The large-scale near-dup family (MinHash-LSH, SimHash, n-gram Jaccard,
embedding cosine) lives in similarity_queries.py / textstats_queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions import keys as K
from ..sources import load_table
from .registry import query


@query(
    "d1_batch_key_dedup",
    oracle="""
    WITH batch AS (
      SELECT event_id, user_id, value,
             sha256('event:' || CAST(event_id AS VARCHAR)) AS key_hash
      FROM read_parquet('{sf}/events.parquet')
      UNION ALL
      SELECT event_id, user_id, value + 1,
             sha256('event:' || CAST(event_id AS VARCHAR)) AS key_hash
      FROM read_parquet('{sf}/events.parquet') WHERE event_id % 5 = 0
    ), ranked AS (
      SELECT *, row_number() OVER (PARTITION BY key_hash
                                   ORDER BY value DESC) AS rn
      FROM batch
    )
    SELECT count(*) AS n_kept,
           count(DISTINCT key_hash) AS n_keys
    FROM ranked WHERE rn = 1
    """,
    tags=("D1", "F2"),
)
def d1_batch_key_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-batch idempotency-key dedup with deterministic winner
    (reference SHA-256 gate, etl/utils/database.py:49-63; the reference's
    last-statement-wins becomes an explicit row_number pick)."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_id", "user_id", "value",
        K.idempotency_key("event", F.col("event_id")).alias("key_hash"),
    )
    dupes = (
        ev.filter(F.col("event_id") % 5 == 0)
        .select(
            "event_id", "user_id", (F.col("value") + 1).alias("value"),
            K.idempotency_key("event", F.col("event_id")).alias("key_hash"),
        )
    )
    batch = base.unionByName(dupes)
    w = W.partitionBy("key_hash").orderBy(F.desc("value"))
    kept = batch.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return kept.agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.countDistinct("key_hash").alias("n_keys"),
    )


@query(
    "d2_natural_key_dedup",
    oracle="""
    WITH expanded AS (
      SELECT doc_id, text FROM read_parquet('{sf}/documents.parquet')
      UNION ALL
      SELECT doc_id + 100000, text
      FROM read_parquet('{sf}/documents.parquet') WHERE doc_id % 10 = 0
    ), hashed AS (
      SELECT doc_id, md5(text) AS text_hash FROM expanded
    ), ranked AS (
      SELECT doc_id, text_hash,
             row_number() OVER (PARTITION BY text_hash ORDER BY doc_id) AS rn
      FROM hashed
    )
    SELECT doc_id, text_hash FROM ranked WHERE rn = 1
    """,
    tags=("D2", "dedup-exact"),
)
def d2_natural_key_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dup removal by content hash, keeping the lowest id (reference
    natural-key uniqueness, db/init/01-schema.sql:21,49; also the exact
    leg of the training-data dedup family). Injected duplicates
    (doc_id+100000 for every 10th doc) prove collapses happen.

    Scale: hash-groupBy shuffles once on md5(text) — uniform keys, no skew;
    this is the canonical 100 TB exact-dedup plan."""
    docs = load_table(spark, sf_dir, "documents")
    expanded = docs.select("doc_id", "text").unionByName(
        docs.filter(F.col("doc_id") % 10 == 0).select(
            (F.col("doc_id") + 100000).alias("doc_id"), "text"
        )
    )
    hashed = expanded.select("doc_id", F.md5("text").alias("text_hash"))
    w = W.partitionBy("text_hash").orderBy("doc_id")
    return (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "text_hash")
    )


@query(
    "d3_distinct_sources",
    oracle="""
    SELECT DISTINCT source FROM read_parquet('{sf}/documents.parquet')
    """,
    tags=("D3",),
)
def d3_distinct_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Visited-set dedup (reference visited_urls set,
    etl/extract/web_scraper.py:67) — distinct() pre-fetch."""
    return load_table(spark, sf_dir, "documents").select("source").distinct()

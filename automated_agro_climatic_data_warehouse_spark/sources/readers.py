"""Parquet readers for the driver-generated testdata star schema.

Replaces the reference's per-request HTTP extract layer
(reference: etl/extract/soil_api.py:141-167, etl/extract/weather_api.py:46-93)
with Spark-native columnar scans. At 100 TB these scans get predicate
pushdown, column pruning and partition pruning from Catalyst for free —
never pre-materialize a filtered copy; express the filter on the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one testdata table. Plain `spark.read.parquet` — Catalyst owns
    pushdown/pruning; do not cache here (caching defeats pushdown).

    `events.ts` is written as parquet TIMESTAMP(NANOS) which Spark 4 rejects
    natively; we read it via `nanosAsLong` and floor-convert ns→µs with
    integer `div` (exact on longs — a double division would lose µs precision
    at 1.7e18 ns), matching DuckDB's own ns→µs truncation.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000").cast("long"))
        )
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def fan_out(df: DataFrame) -> DataFrame:
    """Round-robin repartition to full cluster parallelism.

    Use before a CPU-heavy per-row stage (md5 shingling, regex NLP, pandas-UDF
    scoring) whose input scan has too few splits to saturate the cluster. The
    local testdata parquet files are single-row-group (1-2 splits — parquet
    cannot split below a row group), which would pin an md5-bound pipeline to
    1-2 of 32 cores. At production scale inputs arrive pre-split, and for
    genuinely large inputs this narrow shuffle of raw bytes is noise next to
    the downstream per-row compute it parallelizes."""
    sc = df.sparkSession.sparkContext
    return df.repartition(sc.defaultParallelism)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so `spark.sql` queries see the
    same names the DuckDB oracle does."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)

"""SparkSession factory.

One place to pin every config that matters for correctness parity with the
DuckDB oracle (UTC session timezone, Arrow) and for local[N] throughput
(AQE, shuffle partitions sized to cores, not the 200 default).

At cluster scale the same builder works — only master/memory change; the
partitioning knobs (`spark.sql.shuffle.partitions`) should then be set to
~2-3x total cores or left to AQE coalescing.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "agro_dwh_spark", cpus: int | None = None) -> SparkSession:
    """Build (or reuse) the session.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (default: all cores).
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # shuffle partitions ~ cores for local mode; AQE coalesces further
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        # UTC so timestamp values hash identically to DuckDB's naive-UTC
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Let the planner pick shuffled-hash join when its size conditions
        # fit (guide-standard batch-ETL baseline): SHJ skips the sort on
        # both sides, and the planner still falls back to sort-merge when
        # no side can build a local hash map, so the setting is
        # scale-safe. Interleaved best-of-3 A/B at sf0.1 on the 10
        # heaviest join-shaped queries: -14% total (pagerank -32%,
        # modularity -33%, ivfpq -25%), no confirmed regression.
        # SPARK_GRAFT_PREFER_SMJ=true restores the Spark default.
        .config(
            "spark.sql.join.preferSortMergeJoin",
            os.environ.get("SPARK_GRAFT_PREFER_SMJ", "false"),
        )
        # bucketed managed tables (warehouse.write_bucketed) land here;
        # session-scoped in-memory catalog, parquet files on disk
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/spark_graft_warehouse"),
        )
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def drop_checkpoint_blocks(spark: SparkSession) -> None:
    """Free all persisted RDD blocks (localCheckpoint intermediates from
    the dedup/CC/graph families are never auto-freed). Timing harnesses
    (bench.py, tools/scale_probe.py) call this between queries: left in
    place, accumulated blocks add GC/eviction pressure measured to
    inflate later timings 2-5x."""
    jsc = spark.sparkContext._jsc
    for rdd_id in list(jsc.getPersistentRDDs().keySet()):
        jsc.sc().unpersistRDD(rdd_id, True)

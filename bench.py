"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from automated_agro_climatic_data_warehouse_spark.plans import QUERIES  # noqa: E402
from automated_agro_climatic_data_warehouse_spark.session import get_spark  # noqa: E402

# headline set: the flagship MV, the big agg, the big star join, and one
# representative from each heavy family (window, dedup, similarity, text).
HEADLINE = [
    "mv_compatibility",
    "q1_pricing_summary",
    "j1_star_join_revenue",
    "s10_date_dimension",
    "quality_suite",
    "s11_upsert_full",
    "w1_lag_spike",
    "ev_tumbling_hourly",
    "dedup_minhash_lsh",
    "ann_brute_topk",
    "ts_quality_score",
    "f13_clean_pipeline",
    "q3_shipping_priority",
    "ev_asof_join",
    "cdc_snapshot_diff",
    "emb_label_centroids",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")
    names = [n for n in HEADLINE if n in QUERIES]
    # Warm-up: timings measure steady-state query execution, not first-touch
    # costs that a long-lived cluster pays once —
    # (a) parquet footers / file listings for every input table,
    from automated_agro_climatic_data_warehouse_spark.sources import load_tables

    for df in load_tables(spark, sf_dir).values():
        df.count()
    # (b) JVM JIT + codegen via one full query,
    QUERIES[names[0]].spark_fn(spark, sf_dir).count()
    # (c) the Python/Arrow worker pool (first pandas-UDF use pays ~3s of
    #     worker spawn + numpy import)
    from pyspark.sql import functions as F

    from automated_agro_climatic_data_warehouse_spark.operators.similarity import cosine_pandas

    spark.range(256, numPartitions=spark.sparkContext.defaultParallelism).select(
        cosine_pandas(
            F.array(F.col("id").cast("float")), F.array(F.col("id").cast("float"))
        )
    ).count()
    timings: dict[str, float] = {}
    for name in names:
        t0 = time.time()
        df = QUERIES[name].spark_fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {n} rows in {timings[name]}s", file=sys.stderr)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()

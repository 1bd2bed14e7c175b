"""Cross-monitor contracts.

1. Every chain-drain monitor's `empty_schema` must BE the schema its
   merge produces: an empty first drain otherwise returns a frame
   downstream readouts silently mis-bind against — a failure no
   stream≡batch test catches because those always drain data.
2. ann_ivf_spill's build-vs-query trade is MEASURED, not asserted in
   prose: its probe-side candidate frame must be about half
   ann_ivf_topk's (1 probed list vs 2), while its list frame doubles.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_drain_empty_schema_matches_merge_output(spark):
    import datetime

    from automated_agro_climatic_data_warehouse_spark.operators.quality import (
        anova_moments_merge,
        ct_merge,
        kw_histogram_merge,
        lb_daily_merge,
        mw_histogram_merge,
        srm_daily_merge,
        vhist_merge,
    )
    from automated_agro_climatic_data_warehouse_spark.operators.survival import (
        km_histogram_merge,
    )

    cases = [
        (
            mw_histogram_merge,
            "cents bigint, g1 int",
            [(1, 1)],
            "cents bigint, t bigint, t1 bigint",
        ),
        (
            kw_histogram_merge,
            "grp string, cents bigint",
            [("g", 1)],
            "grp string, cents bigint, tg bigint",
        ),
        (
            srm_daily_merge,
            "day date, in_a int",
            [(datetime.date(2024, 1, 1), 1)],
            "day date, n_a bigint, n_b bigint",
        ),
        (
            vhist_merge,
            "event_type string, cents bigint",
            [("t", 1)],
            "event_type string, cents bigint, n bigint",
        ),
        (
            ct_merge,
            "event_type string, dow bigint",
            [("t", 0)],
            "event_type string, dow bigint, o bigint",
        ),
        (
            anova_moments_merge,
            "group string, x bigint",
            [("g", 1)],
            "group string, n bigint, s1 bigint, s2 bigint",
        ),
        (
            lb_daily_merge,
            "day date",
            [(datetime.date(2024, 1, 1),)],
            "day date, x bigint",
        ),
        (
            km_histogram_merge,
            "dur bigint, censored int",
            [(1, 0)],
            "dur bigint, churned bigint, censored_n bigint",
        ),
    ]
    for merge, in_schema, rows, empty_schema in cases:
        merged = merge(spark.createDataFrame(rows, in_schema), None)
        empty = spark.createDataFrame([], empty_schema)
        assert [f.simpleString() for f in merged.schema.fields] == [
            f.simpleString() for f in empty.schema.fields
        ], f"{merge.__name__}: empty_schema drifted from merge output"


def test_ivf_spill_trades_list_size_for_probe_traffic(spark, sf_dir):
    """Measured candidate counts: spill doubles the list frame and
    halves per-query probe traffic vs the 2-probe IVF."""
    from automated_agro_climatic_data_warehouse_spark.operators.similarity import (
        nearest_centroids,
    )
    from automated_agro_climatic_data_warehouse_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cent = emb.filter(F.col("vec_id") < 16)
    lists1 = nearest_centroids(emb, cent, 1)
    lists2 = nearest_centroids(emb, cent, 2)
    assert lists2.count() == 2 * lists1.count()

    probes1 = nearest_centroids(emb.filter(F.col("vec_id") < 30), cent, 1)
    probes2 = nearest_centroids(emb.filter(F.col("vec_id") < 30), cent, 2)
    spill_cands = probes1.join(
        lists2.select(F.col("vec_id").alias("nid"), "centroid_id"),
        "centroid_id",
    ).count()
    topk_cands = probes2.join(
        lists1.select(F.col("vec_id").alias("nid"), "centroid_id"),
        "centroid_id",
    ).count()
    # both scan ~2 lists' worth of corpus per query on average; the
    # spill variant reaches them through ONE probe join whose build
    # side was precomputed — candidate totals must be the same order,
    # with spill never more than topk + one list's slack
    assert 0 < spill_cands <= 2 * topk_cands
    # and the probe SIDE itself halves (1 row per query, not 2)
    assert probes1.count() * 2 == probes2.count()

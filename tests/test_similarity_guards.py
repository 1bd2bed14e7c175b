"""Guard-rail tests for the ANN operators: probe-set cap, empty probe
set, and id-dtype-derived output schema (the mapInPandas schema must
follow the corpus id column, not a hardcoded long)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from automated_agro_climatic_data_warehouse_spark.operators.similarity import (
    brute_force_topk,
)


def _corpus(spark, n=30, dim=4, id_type="long"):
    rows = [(i, [float((i * 7 + j * 3) % 11) - 5.0 for j in range(dim)])
            for i in range(n)]
    return spark.createDataFrame(rows, f"vec_id {id_type}, embedding array<double>")


def test_brute_force_probe_cap_raises(spark):
    corpus = _corpus(spark)
    with pytest.raises(ValueError, match="bucketed_topk"):
        brute_force_topk(corpus, F.lit(True), k=3, max_probe=10).collect()


def test_brute_force_empty_probe_returns_empty(spark):
    corpus = _corpus(spark)
    out = brute_force_topk(corpus, F.col("vec_id") < 0, k=3)
    assert out.count() == 0
    assert out.columns == ["query_id", "neighbor_id", "rank"]


def test_brute_force_int_id_schema(spark):
    corpus = _corpus(spark, id_type="int")
    out = brute_force_topk(corpus, F.col("vec_id") < 2, k=3)
    assert dict(out.dtypes)["query_id"] == "int"
    assert dict(out.dtypes)["neighbor_id"] == "int"
    got = out.collect()
    assert {r.query_id for r in got} == {0, 1}
    assert all(1 <= r.rank <= 3 for r in got)


def test_brute_force_unsupported_id_type(spark):
    corpus = _corpus(spark).withColumn("vec_id", F.col("vec_id").cast("string"))
    with pytest.raises(TypeError, match="unsupported id column type"):
        brute_force_topk(corpus, F.col("vec_id") == "1", k=3)


def test_train_centroids_recovers_planted_clusters(spark):
    """Lloyd training must converge on well-separated planted clusters:
    every member of a planted cluster ends up assigned to the same
    trained centroid."""
    import numpy as np

    from automated_agro_climatic_data_warehouse_spark.operators.similarity import (
        nearest_centroids,
        train_centroids,
    )

    rng = np.random.RandomState(7)
    bases = rng.randn(3, 16).astype("float32")
    rows = []
    for i in range(60):
        c = i % 3
        v = bases[c] + 0.01 * rng.randn(16).astype("float32")
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    cents = train_centroids(df, k=3, rounds=2)
    assert cents.count() == 3
    assigned = nearest_centroids(
        df, cents.withColumnRenamed("centroid_id", "vec_id"), 1
    ).collect()
    by_cluster = {}
    for r in assigned:
        by_cluster.setdefault(r.vec_id % 3, set()).add(r.centroid_id)
    # each planted cluster maps to exactly one centroid, all distinct
    assert all(len(v) == 1 for v in by_cluster.values())
    assert len({v.pop() for v in by_cluster.values()}) == 3

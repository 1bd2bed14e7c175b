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

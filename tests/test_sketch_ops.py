"""Frequency-sketch invariants (operators/sketches.py), beyond oracle
parity: the Misra-Gries superset guarantee must hold under ANY
partitioning, and the exact-verify phase must make the query answer
partitioning-independent.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from automated_agro_climatic_data_warehouse_spark.operators.sketches import mg_candidates
from automated_agro_climatic_data_warehouse_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def _skewed_df(spark, n_partitions: int):
    # 60% "hot", 30% "warm", 10% long tail of singletons.
    rows = (
        [("hot",)] * 600 + [("warm",)] * 300 + [(f"tail{i}",) for i in range(100)]
    )
    return spark.createDataFrame(rows, "token string").repartition(n_partitions)


def test_mg_superset_guarantee_any_partitioning(spark):
    """Every value with global freq > total/(k+1) must survive the
    per-partition sketch union, for several partition counts."""
    for parts in (1, 4, 32):
        df = _skewed_df(spark, parts)
        total = df.count()
        k = 9
        cand = {r.token for r in mg_candidates(df, "token", k).collect()}
        exact = {
            r.token
            for r in df.groupBy("token")
            .count()
            .filter(F.col("count") * (k + 1) > total)
            .collect()
        }
        assert exact <= cand, (parts, exact - cand)
        # bounded output: at most k survivors per partition
        assert len(cand) <= k * parts


def test_heavy_hitters_matches_exact_pandas(spark):
    """ts_heavy_hitters == a direct pandas full count above total/400
    (proves the sketch prefilter never drops a qualifying token)."""
    got = {
        (r.token, r.cnt)
        for r in QUERIES["ts_heavy_hitters"].spark_fn(spark, SF).collect()
    }
    text = pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])["text"]
    toks = text.str.lower().str.split(r"\s+").explode()
    toks = toks[toks != ""]
    vc = toks.value_counts()
    want = {(t, int(c)) for t, c in vc.items() if c * 400 > len(toks)}
    assert got == want

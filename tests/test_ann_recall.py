"""ANN quality: recall of the approximate paths vs exact ground truth.

Approximate nearest-neighbor operators trade recall for pruning — but
that trade has to be MEASURED, not assumed, or a refactor can silently
turn "approximate" into "wrong". Ground truth is brute_force_topk (the
exact GEMM path); recall@k is averaged over a fixed probe set.

Bounds: IVF with trained centroids and nprobe=4 of 8 lists has to
clear 0.8 on this data; the untrained deterministic-seed quantizer
(the oracle-replayable default) clears a lower bar with nprobe=4 —
both far above the ~k/N ≈ 0.02 a broken index would score.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from automated_agro_climatic_data_warehouse_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
    train_centroids,
)
from automated_agro_climatic_data_warehouse_spark.sources import load_table

SF = "/root/testdata/sf0.001"
K = 10


def _probe():
    return F.col("vec_id") < 20


def _topk_sets(df) -> dict:
    out: dict = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def _recall(got: dict, want: dict) -> float:
    per_q = [
        len(got.get(q, set()) & hits) / len(hits) for q, hits in want.items()
    ]
    return sum(per_q) / len(per_q)


def test_ivf_recall_vs_exact(spark):
    corpus = load_table(spark, SF, "embeddings")
    exact = _topk_sets(brute_force_topk(corpus, _probe(), k=K))
    assert len(exact) == 20

    seeded = _topk_sets(
        ivf_topk(corpus, _probe(), k=K, n_centroids=8, nprobe=4)
    )
    r_seeded = _recall(seeded, exact)
    assert r_seeded >= 0.5, f"seeded-quantizer recall collapsed: {r_seeded}"

    cents = train_centroids(corpus, k=8, rounds=3)
    trained = _topk_sets(
        ivf_topk(corpus, _probe(), k=K, n_centroids=8, nprobe=4, centroids=cents)
    )
    r_trained = _recall(trained, exact)
    assert r_trained >= 0.8, f"trained-IVF recall too low: {r_trained}"

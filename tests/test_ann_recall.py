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


def test_pq_adc_recall_vs_exact(spark):
    """PQ ADC search is lossy by design (16 codes × 8 subspaces on this
    data); its top-5 must still overlap the exact cosine top-5 well
    above chance. Chance overlap ≈ k/N ≈ 0.01 at sf0.001; broken codes
    or a broken LUT join land there, working compression lands far
    higher. (ADC ranks by compressed L2 under a 16-codeword donor
    codebook; ground truth is cosine — measured overlap on this data is
    0.19, ~19× chance. The floor is 0.1: regressions to chance are what
    this test exists to catch, not codebook quality, which
    train_centroids improves in production.)"""
    from automated_agro_climatic_data_warehouse_spark.plans import QUERIES

    emb = load_table(spark, SF, "embeddings")
    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(emb, F.col("vec_id") < 20, k=5).collect()
    }
    adc = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["ann_pq_adc_topk"].spark_fn(spark, SF).collect()
    }
    queries = {q for q, _ in exact}
    assert queries == {q for q, _ in adc}
    overlap = len(exact & adc) / len(exact)
    assert overlap >= 0.1, f"PQ ADC overlap@5 collapsed to {overlap:.2f}"


def test_ivfpq_recall_vs_exact(spark):
    """IVF-PQ composes two lossy stages (2-of-8 cell probe + residual
    PQ), so its overlap floor sits between chance (~0.01) and flat PQ
    ADC. Residual encoding should not LOSE precision vs raw-vector PQ
    within probed cells; the failure mode this pins is a broken
    residual/LUT join or a cell-routing bug, both of which land at
    chance. Queries with empty probed cells (possible at tiny sf) are
    allowed to miss entirely, but most queries must return rows."""
    from automated_agro_climatic_data_warehouse_spark.plans import QUERIES

    emb = load_table(spark, SF, "embeddings")
    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(emb, F.col("vec_id") < 20, k=5).collect()
    }
    ivfpq = {
        (r.query_id, r.neighbor_id)
        for r in QUERIES["ann_ivfpq_topk"].spark_fn(spark, SF).collect()
    }
    assert len({q for q, _ in ivfpq}) >= 15  # most queries produce top-5
    overlap = len(exact & ivfpq) / len(exact)
    assert overlap >= 0.08, f"IVF-PQ overlap@5 collapsed to {overlap:.2f}"

"""Multimodal binary plumbing: Arrow mapInPandas decode path determinism."""

from __future__ import annotations

import hashlib
import zlib

from pyspark.sql import functions as F

from automated_agro_climatic_data_warehouse_spark.operators.multimodal import (
    FEATURE_DIM,
    _fake_decode,
    documents_as_media,
    extract_features,
)
from automated_agro_climatic_data_warehouse_spark.sources import load_table


def test_feature_extract_matches_local_computation(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    feats = extract_features(documents_as_media(docs)).collect()
    texts = {r.doc_id: r.text for r in docs.collect()}
    assert len(feats) == len(texts)
    for r in feats:
        payload = texts[r.media_id].encode()
        assert r.n_bytes == len(payload)
        assert r.checksum == (zlib.crc32(payload) & 0xFFFFFFFF)
        assert r.features == _fake_decode(payload)
        assert len(r.features) == FEATURE_DIM


def test_feature_extract_rerun_deterministic(spark, sf_dir):
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    a = sorted(tuple(r) for r in extract_features(media).collect())
    b = sorted(tuple(r) for r in extract_features(media.repartition(7)).collect())
    assert a == b  # partitioning must not change results


def test_resize_pool_drops_short_and_pools_exactly(spark):
    from automated_agro_climatic_data_warehouse_spark.operators.multimodal import resize_pool

    rows = [
        (1, bytes(range(16)), "image/fake"),   # 4x4 grid: blocks = pixels
        (2, b"tiny", "image/fake"),            # side 2 < 4 -> dropped
    ]
    media = spark.createDataFrame(
        rows, "media_id long, payload binary, media_type string"
    )
    out = resize_pool(media).collect()
    assert {r["media_id"] for r in out} == {1}
    got = {r["block"]: r["mean_px"] for r in out}
    # side == POOL_OUT: each block is exactly one pixel, mean == byte
    assert got == {i: float(i) for i in range(16)}

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

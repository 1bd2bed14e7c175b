"""The xxhash64 production backend must find the same planted near-dup
pairs as the md5 parity backend — the exact-Jaccard verify is backend-
independent, so any pair surviving both candidate generations carries an
identical jaccard value."""

from __future__ import annotations

import pytest

from automated_agro_climatic_data_warehouse_spark.operators.dedup import minhash_lsh_dedup
from automated_agro_climatic_data_warehouse_spark.plans.dedup_queries import _expanded_docs


def _pairs(spark, sf_dir, backend):
    docs = _expanded_docs(spark, sf_dir)
    return {
        (r.doc_a, r.doc_b): r.jaccard
        for r in minhash_lsh_dedup(docs, threshold=0.6, backend=backend).collect()
    }


def test_backends_agree_on_planted_dups(spark, sf_dir):
    md5_pairs = _pairs(spark, sf_dir, "md5")
    xx_pairs = _pairs(spark, sf_dir, "xxhash64")
    assert md5_pairs, "planted near-dups must be found"
    # every planted pair (orig, orig+100000) is a >0.9-jaccard near-dup —
    # both backends' band geometry must surface all of them
    planted_md5 = {p for p, j in md5_pairs.items() if j >= 0.9}
    planted_xx = {p for p, j in xx_pairs.items() if j >= 0.9}
    assert planted_md5 == planted_xx
    # shared pairs carry identical exact-Jaccard values
    for p in set(md5_pairs) & set(xx_pairs):
        assert md5_pairs[p] == xx_pairs[p]


def test_unknown_backend_raises(spark, sf_dir):
    docs = _expanded_docs(spark, sf_dir)
    with pytest.raises(ValueError, match="backend"):
        minhash_lsh_dedup(docs, backend="sha1").collect()

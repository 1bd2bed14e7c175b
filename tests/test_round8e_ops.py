"""Round-8 fifth wave: triplet-margin audit (full numpy differential)
and RAKE keyword extraction (full python reimplementation differential).
"""

from __future__ import annotations

import re
from collections import Counter, defaultdict

import numpy as np

from automated_agro_climatic_data_warehouse_spark.plans import QUERIES
from automated_agro_climatic_data_warehouse_spark.plans.textstats_queries import (
    _RAKE_STOPS,
)


def test_triplet_margin_matches_numpy(spark, sf_dir):
    """Per-label (n_anchors, n_margin_pos, sum_margin) recomputed from
    raw vectors with plain numpy over all 100 anchors."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    qx = {
        r.vec_id: np.round(np.array(r.embedding, dtype=np.float64) * 4096)
        .astype(np.int64)
        for r in emb
    }
    lab = {r.vec_id: r.label for r in emb}
    per_label = defaultdict(lambda: [0, 0, 0])
    for a in range(100):
        d_pos = d_neg = None
        for b_, v in qx.items():
            if b_ == a:
                continue
            d = int(((qx[a] - v) ** 2).sum())
            if lab[b_] == lab[a]:
                d_pos = d if d_pos is None else min(d_pos, d)
            else:
                d_neg = d if d_neg is None else min(d_neg, d)
        if d_pos is None or d_neg is None:
            continue
        st = per_label[lab[a]]
        st[0] += 1
        st[1] += d_neg > d_pos
        st[2] += d_neg - d_pos
    got = {
        r.label: (r.n_anchors, r.n_margin_pos, r.sum_margin)
        for r in QUERIES["emb_triplet_margin"].spark_fn(spark, sf_dir).collect()
    }
    assert got == {k: tuple(v) for k, v in per_label.items()}
    assert sum(v[0] for v in per_label.values()) == 100


def _rake_python(docs):
    """Reference RAKE on (doc_id, text) rows: stopword-delimited runs,
    degree/freq word scores on the 2^-20 grid, phrase = summed words."""
    stops = set(_RAKE_STOPS)
    phrases = []  # list of word tuples
    for _, text in docs:
        words = [w for w in re.split(r"\s+", text.lower()) if w]
        run = []
        for w in words:
            if w in stops:
                if run:
                    phrases.append(tuple(run))
                run = []
            else:
                run.append(w)
        if run:
            phrases.append(tuple(run))
    freq = Counter()
    deg = Counter()
    for p in phrases:
        for w in p:
            freq[w] += 1
            deg[w] += len(p)
    wq = {w: round(deg[w] / freq[w] * 1048576) for w in freq}
    scored = Counter()
    meta = {}
    for p in phrases:
        text = " ".join(p)
        scored[text] += 1
        meta[text] = (sum(wq[w] for w in p), len(p))
    rows = [
        (text, meta[text][0], meta[text][1], n) for text, n in scored.items()
    ]
    rows.sort(key=lambda r: (-r[1], r[0]))
    return rows[:20]


def test_rake_matches_python_reference(spark, sf_dir):
    docs = [
        (r.doc_id, r.text)
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    ]
    want = _rake_python(docs)
    got = [
        (r.phrase, r.score_q, r.n_words, r.n_occurrences)
        for r in QUERIES["ts_rake_keywords"].spark_fn(spark, sf_dir).collect()
    ]
    assert got == want
    # RAKE's point: multi-word phrases dominate the top of the list
    assert sum(1 for _, _, nw, _ in got if nw >= 2) >= 10

"""Round-3 operator invariants, beyond oracle parity.

Oracle parity proves Spark ≡ DuckDB on the same plan; these tests pin the
SEMANTICS against independent reimplementations (pandas/numpy) and the
mathematical invariants the operators promise.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from automated_agro_climatic_data_warehouse_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def test_int8_quantize_roundtrip_error_bound(spark):
    """Dequantized values must be within scale/2 of the original
    (rounding guarantee), and quantized codes within the int8 range.

    The driver-checked query posexplodes to (vec_id, scale, pos, q)
    scalar rows (round-4 reshape); reassemble per-vector arrays here.
    """
    out = QUERIES["emb_int8_quantize"].spark_fn(spark, SF).collect()
    emb = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    }
    assert out
    by_vec: dict[int, list] = {}
    scales: dict[int, float] = {}
    for r in out:
        by_vec.setdefault(r.vec_id, []).append((r.pos, r.q))
        scales[r.vec_id] = r.scale
    assert set(by_vec) == set(emb)
    for vec_id, cells in by_vec.items():
        orig = emb[vec_id]
        assert sorted(p for p, _ in cells) == list(range(len(orig)))
        q = np.asarray(
            [v for _, v in sorted(cells)], dtype=np.int64
        )
        scale = scales[vec_id]
        assert np.abs(q).max() <= 127
        dequant = q * scale
        assert np.abs(dequant - orig).max() <= scale / 2 + 1e-12


def test_time_weighted_avg_matches_pandas(spark):
    """TWA must equal an independent pandas step-interpolation."""
    got = {
        r.user_id: (r.twa, r.total_us, r.n_intervals)
        for r in QUERIES["w8_time_weighted_avg"].spark_fn(spark, SF).collect()
    }
    pdf = pd.read_parquet(
        f"{SF}/events.parquet", columns=["user_id", "event_id", "value", "ts"]
    ).sort_values(["user_id", "ts", "event_id"])
    want = {}
    for uid, g in pdf.groupby("user_id"):
        us = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        dur = np.diff(us)
        if len(dur) == 0:
            continue
        vals = g["value"].to_numpy()[:-1]
        want[uid] = (
            float((vals * dur).sum() / dur.sum()),
            int(dur.sum()),
            len(dur),
        )
    assert set(got) == set(want)
    for uid, (twa, tot, n) in want.items():
        gtwa, gtot, gn = got[uid]
        assert gn == n and gtot == tot
        assert abs(gtwa - twa) < 1e-6, uid


def test_unigram_logprob_matches_numpy(spark):
    """avg_nll must equal an independent add-one-smoothed unigram LM."""
    got = {
        r.doc_id: (r.avg_nll, r.n_tokens)
        for r in QUERIES["ts_unigram_logprob"].spark_fn(spark, SF).collect()
    }
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    toks = {
        int(r.doc_id): [w for w in str(r.text).lower().split() if w]
        for r in docs.itertuples()
    }
    from collections import Counter

    counts = Counter(w for ws in toks.values() for w in ws)
    n = sum(counts.values())
    v = len(counts)
    for doc_id, ws in toks.items():
        if not ws:
            assert doc_id not in got
            continue
        nll = [-np.log((counts[w] + 1) / (n + v)) for w in ws]
        assert got[doc_id][1] == len(ws)
        assert abs(got[doc_id][0] - float(np.mean(nll))) < 1e-6, doc_id


def test_simhash_hamming_band_join_is_complete(spark):
    """Band blocking must find EXACTLY the pairs an all-pairs hamming
    scan finds (pigeonhole completeness, then exact filter)."""
    from automated_agro_climatic_data_warehouse_spark.operators.dedup import (
        simhash_fingerprints,
    )
    from automated_agro_climatic_data_warehouse_spark.plans.dedup_queries import (
        _expanded_docs,
    )

    fp = {
        r.doc_id: r.simhash
        for r in simhash_fingerprints(_expanded_docs(spark, SF), bits=16).collect()
    }
    ids = sorted(fp)
    want = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(fp[a] ^ fp[b]).count("1") <= 3
    }
    got = {
        (r.doc_a, r.doc_b)
        for r in QUERIES["dedup_simhash_hamming"].spark_fn(spark, SF).collect()
    }
    assert got == want and len(want) > 0

"""Round-8 ninth wave: RRF hybrid rank fusion, capture-recapture
completeness, HITS hubs/authorities — full independent Python
recomputation (DuckDB oracle parity is tools/check.py's job).
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

from automated_agro_climatic_data_warehouse_spark.plans import QUERIES


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def test_rrf_matches_python(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    qv = {
        r.vec_id: [round(float(x) * 4096) for x in r.embedding] for r in emb
    }
    expect = {}
    for p in [v for v in qv if v < 6]:
        dots, hams = {}, {}
        for c, vec in qv.items():
            if c == p:
                continue
            dots[c] = sum(x * y for x, y in zip(qv[p], vec))
            hams[c] = sum(
                (x >= 0) != (y >= 0) for x, y in zip(qv[p], vec)
            )
        ra = {
            c: i + 1
            for i, c in enumerate(sorted(dots, key=lambda c: (-dots[c], c)))
        }
        rb = {
            c: i + 1
            for i, c in enumerate(sorted(hams, key=lambda c: (hams[c], c)))
        }
        scored = {}
        for c in dots:
            s = 0
            if ra[c] <= 20:
                s += 1048576 // (60 + ra[c])
            if rb[c] <= 20:
                s += 1048576 // (60 + rb[c])
            if s > 0:
                scored[c] = s
        top = sorted(scored, key=lambda c: (-scored[c], c))[:10]
        for i, c in enumerate(top, 1):
            expect[(p, c)] = (
                ra[c] if ra[c] <= 20 else None,
                rb[c] if rb[c] <= 20 else None,
                scored[c],
                i,
            )
    got = {
        (r.probe_id, r.vec_id): (r.rank_a, r.rank_b, r.rrf_q, r.fused_rank)
        for r in QUERIES["ann_rank_fusion_rrf"].spark_fn(spark, sf_dir).collect()
    }
    assert got == expect
    # fusion must reward cross-channel agreement: every fused top-10
    # member appears in at least one channel's depth-20 list
    assert all(
        ra is not None or rb is not None for ra, rb, _, _ in got.values()
    )


def test_capture_recapture_matches_python(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    per = defaultdict(lambda: [0, 0, 0, 0])  # true, n1, n2, m
    for r in docs:
        in1 = _h32(f"cap1:{r.doc_id}") % 100 < 30
        in2 = _h32(f"cap2:{r.doc_id}") % 100 < 30
        st = per[r.source]
        st[0] += 1
        st[1] += in1
        st[2] += in2
        st[3] += in1 and in2
    expect = {
        s: (t, n1, n2, m, (n1 + 1) * (n2 + 1) // (m + 1) - 1)
        for s, (t, n1, n2, m) in per.items()
    }
    got = {
        r.source: (r.n_true, r.n1, r.n2, r.m, r.est_chapman)
        for r in QUERIES["dq_capture_recapture"].spark_fn(spark, sf_dir).collect()
    }
    assert got == expect
    # the estimator must be in the right ballpark: pooled relative
    # error under 40% (independent 30% captures, m ~ 45 per source)
    t_sum = sum(v[0] for v in got.values())
    e_sum = sum(v[4] for v in got.values())
    assert abs(e_sum - t_sum) / t_sum < 0.4


def test_hits_matches_python(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    cust = {r.o_orderkey: r.o_custkey for r in orders}
    e0 = {(cust[r.l_orderkey], r.l_suppkey) for r in li}
    edges = [(c, -s) for c, s in e0]
    out_adj = defaultdict(list)
    in_adj = defaultdict(list)
    for u, v in edges:
        out_adj[u].append(v)
        in_adj[v].append(u)
    T = 1 << 20
    h = {u: T for u in out_adj}
    a = {}
    for _ in range(4):
        a_raw = {v: sum(h[u] for u in us) for v, us in in_adj.items()}
        mx = max(a_raw.values())
        a = {v: (raw * T) // mx for v, raw in a_raw.items()}
        h_raw = {u: sum(a[v] for v in vs) for u, vs in out_adj.items()}
        mx = max(h_raw.values())
        h = {u: (raw * T) // mx for u, raw in h_raw.items()}
    expect = {("hub", u): s for u, s in h.items()}
    expect.update({("auth", v): s for v, s in a.items()})
    got = {
        (r.side, r.node): r.score_q
        for r in QUERIES["graph_hits_k4"].spark_fn(spark, sf_dir).collect()
    }
    assert got == expect
    # normalization: each side's max score is exactly the grid total
    assert max(s for (sd, _), s in got.items() if sd == "hub") == T
    assert max(s for (sd, _), s in got.items() if sd == "auth") == T

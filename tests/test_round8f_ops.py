"""Round-8 sixth wave: BM25 ranking, A-ES weighted reservoir, linear
SGD step, BH-FDR, degree assortativity, Nelson-Aalen hazard — each
checked against a full independent Python recomputation (not the DuckDB
oracle, which tools/check.py already covers).
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

from automated_agro_climatic_data_warehouse_spark.plans import QUERIES


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _docs(spark, sf_dir):
    return [
        (r.doc_id, r.text, r.n_chars)
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    ]


def _tokens(text: str) -> list[str]:
    return [t for t in text.lower().split() if t]


def test_bm25_matches_python(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    tf = {d: Counter(_tokens(t)) for d, t, _ in docs}
    tf = {d: c for d, c in tf.items() if c}
    dl = {d: sum(c.values()) for d, c in tf.items()}
    df = Counter(tok for c in tf.values() for tok in c)
    n, sl = len(dl), sum(dl.values())
    idf_q = {
        tok: round(math.log(1 + ((n - v) + 0.5) / (v + 0.5)) * 65536)
        for tok, v in df.items()
    }
    expect = {}
    for d, c in tf.items():
        scored = sorted(
            (
                (
                    -(
                        (22 * idf_q[tok] * f * sl)
                        // (10 * sl * f + 3 * sl + 9 * dl[d] * n)
                    ),
                    tok,
                    f,
                )
                for tok, f in c.items()
            ),
        )[:3]
        for sq, tok, f in scored:
            expect[(d, tok)] = (f, -sq)
    got = QUERIES["ts_bm25_topk"].spark_fn(spark, sf_dir).collect()
    assert len(got) == len(expect)
    for r in got:
        f, sq = expect[(r.doc_id, r.token)]
        assert (r.tf, r.score_q) == (f, sq)
        assert r.bm25 == sq / 65536.0
    # BM25 must length-penalize: the top score of the longest doc should
    # not dominate purely by tf (sanity: scores are positive and finite)
    assert all(r.score_q > 0 for r in got)


def test_weighted_reservoir_matches_python(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    keyed = []
    for r in ev:
        if not (r.value and r.value > 0):
            continue
        u_num = _h32(f"wres:{r.event_id}") % 1048576 + 1
        lnu_q = round(math.log(u_num / 1048576.0) * 1048576)
        keyed.append((lnu_q / r.value, r.event_id, r.event_type, r.value, lnu_q))
    keyed.sort(key=lambda t: (-t[0], t[1]))
    expect = keyed[:256]
    got = QUERIES["sample_weighted_reservoir"].spark_fn(spark, sf_dir).collect()
    assert [(r.event_id, r.lnu_q) for r in got] == [
        (t[1], t[4]) for t in expect
    ]
    # heavier rows must be over-represented vs uniform: mean weight of
    # the sample strictly exceeds the population mean weight
    pop_mean = sum(t[3] for t in keyed) / len(keyed)
    samp_mean = sum(t[3] for t in expect) / len(expect)
    assert samp_mean > pop_mean


def test_sgd_step_matches_python(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    tfb: dict[int, Counter] = {}
    y = {}
    for d, t, nc in docs:
        c = Counter(_h32(f"sgd:{tok}") % 16 for tok in _tokens(t))
        if c:
            tfb[d] = c
            y[d] = nc
    w0 = {k: _h32(f"w0:{k}") % 7 - 3 for k in range(16)}
    n = len(tfb)
    grad = defaultdict(int)
    for d, c in tfb.items():
        resid = sum(f * w0[k] for k, f in c.items()) - y[d]
        for k, f in c.items():
            grad[k] += f * resid
    rows = QUERIES["pipe_sgd_linear_step"].spark_fn(spark, sf_dir).collect()
    assert {r.bucket for r in rows} == set(grad)
    for r in rows:
        g = grad[r.bucket]
        assert (r.w0, r.grad_sum, r.n_docs) == (w0[r.bucket], g, n)
        gq = g * 1024
        d_ = gq // n if gq >= 0 else -((-gq) // n)
        assert r.w1_q == w0[r.bucket] * 1048576 - d_
        assert r.w1 == r.w1_q / 1048576.0


def test_fdr_bh_matches_python(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    daily = Counter((r.event_type, r.ts.date()) for r in ev)
    by_type = defaultdict(list)
    for (et, day), x in daily.items():
        by_type[et].append((day, x))
    expect = {}
    for et, cells in by_type.items():
        m = len(cells)
        s1 = sum(x for _, x in cells)
        s2 = sum(x * x for _, x in cells)
        ps = []
        for day, x in cells:
            num = (m * x - s1) ** 2
            den = m * s2 - s1 * s1
            p_q = 1048576 if num <= den else (den * 1048576) // num
            ps.append((p_q, day))
        ps.sort()
        cutoff = 0
        for i, (p_q, _) in enumerate(ps, 1):
            if p_q * m * 20 <= i * 1048576:
                cutoff = i
        expect[et] = (
            m,
            cutoff,
            min(p for p, _ in ps),
            sum(1 for p, _ in ps if p * 20 <= 1048576),
        )
    got = {
        r.event_type: (r.m, r.n_reject, r.min_p_q, r.n_sig_raw)
        for r in QUERIES["dq_fdr_bh"].spark_fn(spark, sf_dir).collect()
    }
    assert got == expect
    # BH must never reject more than the uncorrected test at the same
    # alpha-ish scale... (step-up can only shrink vs per-cell p<=alpha
    # when all tests share alpha): n_reject <= m always
    assert all(nr <= m for (m, nr, _, _) in got.values())


def test_assortativity_matches_python(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    cust = {r.o_orderkey: r.o_custkey for r in orders}
    e0 = {(cust[r.l_orderkey], r.l_suppkey) for r in li}
    sym = [(c, -s) for c, s in e0] + [(-s, c) for c, s in e0]
    deg = Counter(src for src, _ in sym)
    m = len(sym)
    s_x = sum(deg[a] for a, _ in sym)
    s_xy = sum(deg[a] * deg[b] for a, b in sym)
    s_x2 = sum(deg[a] ** 2 for a, _ in sym)
    r = QUERIES["graph_degree_assortativity"].spark_fn(spark, sf_dir).collect()
    assert len(r) == 1
    row = r[0]
    assert (row.n_edges, row.s_x, row.s_xy, row.s_x2) == (m, s_x, s_xy, s_x2)
    assert row.r_num == m * s_xy - s_x * s_x
    assert row.r_den == m * s_x2 - s_x * s_x
    assert row.assortativity == row.r_num / row.r_den
    # bipartite hub-spoke co-purchase graphs disassort: r < 0
    assert row.assortativity < 0


def test_nelson_aalen_matches_python(spark, sf_dir):
    ev = sorted(
        (
            (r.user_id, r.ts, r.event_id)
            for r in spark.read.parquet(f"{sf_dir}/events.parquet").collect()
            if r.user_id is not None
        ),
    )
    by_user = defaultdict(list)
    for u, ts, eid in ev:
        by_user[u].append((ts, eid))
    GAP = 30 * 60 * 1_000_000
    sessions = []
    for u, rows in by_user.items():
        rows.sort()
        cur = []
        prev = None
        for ts, eid in rows:
            us = int(ts.timestamp() * 1_000_000)
            if prev is None or us - prev > GAP:
                if cur:
                    sessions.append((min(cur), max(cur)))
                cur = []
            cur.append(us)
            prev = us
        if cur:
            sessions.append((min(cur), max(cur)))
    tmax = max(t1 for _, t1 in sessions)
    byd = defaultdict(lambda: [0, 0, 0])  # leaving, churned, censored
    for t0, t1 in sessions:
        dur = (t1 - t0) // 60_000_000
        cens = t1 >= tmax - GAP
        st = byd[dur]
        st[0] += 1
        st[1] += not cens
        st[2] += cens
    durs = sorted(byd)
    n_at_risk = {}
    acc = 0
    for d in reversed(durs):
        acc += byd[d][0]
        n_at_risk[d] = acc
    na = va = 0
    expect = {}
    for d in durs:
        ch = byd[d][1]
        nr = n_at_risk[d]
        na += (ch * 1048576) // nr
        va += (ch * 1073741824) // (nr * nr)
        expect[d] = (nr, ch, byd[d][2], na, va)
    got = {
        r.dur: (r.n_risk, r.churned, r.censored_n, r.na_q, r.var_q)
        for r in QUERIES["ev_hazard_nelson_aalen"].spark_fn(spark, sf_dir).collect()
    }
    assert got == expect
    # hazard is monotone nondecreasing and NA-survival dominates KM
    km = {
        r.dur: r.surv_e6
        for r in QUERIES["ev_survival_km"].spark_fn(spark, sf_dir).collect()
    }
    for d, (_, _, _, na_q, _) in expect.items():
        s_na = math.exp(-na_q / 1048576)
        # one-sided grid slack: truncating-div terms only ever shrink H
        assert s_na * 1_000_000 >= km[d] - 2


def test_mmr_matches_python(spark, sf_dir):
    """Full greedy-MMR recompute in python over the quantized vectors:
    candidate top-8 by dot, then 4 greedy rounds of rel - max-sim."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    qv = {
        r.vec_id: [round(float(x) * 4096) for x in r.embedding] for r in emb
    }

    def dot(a, b):
        return sum(x * y for x, y in zip(qv[a], qv[b]))

    expect = {}
    for p in [v for v in qv if v < 6]:
        rel = {c: dot(p, c) for c in qv if c != p}
        c8 = sorted(rel, key=lambda c: (-rel[c], c))[:8]
        sel = []
        for rank in range(1, 5):
            pool = [c for c in c8 if c not in sel]
            if not sel:
                score = {c: rel[c] for c in pool}
            else:
                score = {
                    c: rel[c] - max(dot(c, s) for s in sel) for c in pool
                }
            pick = min(pool, key=lambda c: (-score[c], c))
            sel.append(pick)
            expect[(p, rank)] = (pick, rel[pick], score[pick])
    got = {
        (r.probe_id, r.mmr_rank): (r.vec_id, r.rel_q, r.mmr_q)
        for r in QUERIES["emb_mmr_diversified_topk"]
        .spark_fn(spark, sf_dir)
        .collect()
    }
    assert got == expect
    # diversification must actually reorder: for at least one probe the
    # MMR ranking differs from the pure-relevance ranking
    reordered = 0
    for p in {pr for pr, _ in expect}:
        mmr_order = [expect[(p, r)][0] for r in range(1, 5)]
        rel_order = sorted(
            mmr_order,
            key=lambda c: (-expect[(p, 1)][1] if c == expect[(p, 1)][0] else 0,),
        )
        # recompute pure-rel top-4 from the collected rel values
        rels = {c: dot(p, c) for c in qv if c != p}
        rel_top4 = sorted(rels, key=lambda c: (-rels[c], c))[:4]
        if mmr_order != rel_top4:
            reordered += 1
    assert reordered >= 1

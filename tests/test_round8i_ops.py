"""Round-8 tenth wave: TextRank keywords, mutual-kNN graph, token-
budget allocation — full independent Python recomputation.
"""

from __future__ import annotations

from collections import Counter, defaultdict

from automated_agro_climatic_data_warehouse_spark.plans import QUERIES

T = 1 << 20


def test_textrank_matches_python(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    toks = {r.doc_id: [t for t in r.text.lower().split() if t] for r in docs}
    wc = Counter(t for ts in toks.values() for t in ts)
    vocab = {t for t, c in wc.items() if c >= 5}
    bic = Counter()
    for ts in toks.values():
        for x, y in zip(ts, ts[1:]):
            if x != y and x in vocab and y in vocab:
                bic[(x, y)] += 1
    big = {p for p, c in bic.items() if c >= 2}
    edges = set()
    for x, y in big:
        edges.add((x, y))
        edges.add((y, x))
    out_adj = defaultdict(list)
    for u, v in edges:
        out_adj[u].append(v)
    deg = {u: len(vs) for u, vs in out_adj.items()}
    r = {u: T for u in deg}
    for _ in range(5):
        nxt = defaultdict(int)
        for u, vs in out_adj.items():
            share = r[u] // deg[u]
            for v in vs:
                nxt[v] += share
        r = {v: (s * 17) // 20 + (T * 3) // 20 for v, s in nxt.items()}
    top = sorted(r.items(), key=lambda kv: (-kv[1], kv[0]))[:30]
    got = [
        (row.token, row.rank_q)
        for row in QUERIES["ts_textrank_keywords"]
        .spark_fn(spark, sf_dir)
        .collect()
    ]
    assert sorted(got, key=lambda kv: (-kv[1], kv[0])) == top
    # graph-structural sanity: every keyword is a frequent word
    assert all(t in vocab for t, _ in got)


def test_mutual_knn_matches_python(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    qv = {
        r.vec_id: [round(float(x) * 4096) for x in r.embedding]
        for r in emb
        if r.vec_id < 500
    }
    knn = {}
    for a in qv:
        dots = {
            b: sum(x * y for x, y in zip(qv[a], qv[b]))
            for b in qv
            if b != a
        }
        knn[a] = {
            b: dots[b]
            for b in sorted(dots, key=lambda b: (-dots[b], b))[:5]
        }
    expect = {}
    for a, nb in knn.items():
        for b, d in nb.items():
            if a < b and a in knn[b]:
                expect[(a, b)] = d
    got = {
        (r.vec_id_a, r.vec_id_b): r.dot_q
        for r in QUERIES["emb_mutual_knn_graph"].spark_fn(spark, sf_dir).collect()
    }
    assert got == expect
    # mutuality prunes: strictly fewer edges than the directed 5-NN list
    assert 0 < len(got) < 5 * len(qv)


def test_budget_allocation_matches_python(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    per = defaultdict(lambda: [0, 0, 0])  # tokens, n_docs, good
    for r in docs:
        st = per[r.source]
        st[0] += len([t for t in r.text.lower().split() if t])
        st[1] += 1
        st[2] += 200 <= r.n_chars <= 2000
    stats = {
        s: (tk, nd, (g * T) // nd) for s, (tk, nd, g) in per.items()
    }
    budget = (sum(tk for tk, _, _ in stats.values()) * 2) // 5
    order = sorted(stats, key=lambda s: (-stats[s][2], s))
    expect = {}
    cum = 0
    for i, s in enumerate(order, 1):
        tk, nd, q = stats[s]
        alloc = max(0, min(tk, budget - cum))
        expect[s] = (tk, nd, q, i, alloc)
        cum += tk
    got = {
        r.source: (r.tokens, r.n_docs, r.quality_q, r.fill_order, r.allocated)
        for r in QUERIES["pipe_token_budget_allocation"]
        .spark_fn(spark, sf_dir)
        .collect()
    }
    assert got == expect
    # the budget is exactly exhausted (fractional knapsack fills to B)
    assert sum(a for _, _, _, _, a in got.values()) == budget


def test_ipw_ate_matches_python(spark, sf_dir):
    import hashlib

    def h32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    ev = [
        r
        for r in spark.read.parquet(f"{sf_dir}/events.parquet").collect()
        if r.user_id is not None
    ]
    users = defaultdict(lambda: [0, 0])  # n_ev, y
    for r in ev:
        st = users[r.user_id]
        st[0] += 1
        st[1] += r.event_type == "purchase"
    cells = defaultdict(lambda: [0, 0, 0, 0])  # n, n_treat, y1, y0
    for u, (n_ev, y) in users.items():
        s = min(9, n_ev // 5)
        t = h32(f"exp:{u}") % 2
        c = cells[s]
        c[0] += 1
        c[1] += t
        if t:
            c[2] += y
        else:
            c[3] += y
    expect = {}
    tot = [0, 0, 0, 0, 0]
    for s, (n, nt, y1, y0) in cells.items():
        if nt == 0 or n - nt == 0:
            continue
        term = (y1 * n * T) // nt - (y0 * n * T) // (n - nt)
        expect[s] = (n, nt, y1, y0, term)
        tot[0] += n
        tot[1] += nt
        tot[2] += y1
        tot[3] += y0
        tot[4] += term
    ate = tot[4] // tot[0] if tot[4] >= 0 else -((-tot[4]) // tot[0])
    expect[-1] = (tot[0], tot[1], tot[2], tot[3], ate)
    got = {
        r.stratum: (r.n, r.n_treat, r.y1_sum, r.y0_sum, r.term_q)
        for r in QUERIES["ev_ipw_ate"].spark_fn(spark, sf_dir).collect()
    }
    assert got == expect
    # structure: strata are deciles plus the overall row, and the
    # overall row pools exactly the kept strata (positivity filter)
    assert set(got) <= set(range(10)) | {-1}
    assert got[-1][0] == sum(n for s, (n, *_) in got.items() if s != -1)

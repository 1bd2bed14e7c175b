"""Round-4 operator invariants, beyond oracle parity.

Oracle parity proves Spark ≡ DuckDB on the same plan; these tests pin
the SEMANTICS against independent numpy/pandas reimplementations and the
mathematical invariants the operators promise.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from automated_agro_climatic_data_warehouse_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"

GRID20 = 1 << 20


def _round_half_away(v):
    """Spark/DuckDB round(): half away from zero — np.round is
    half-to-even and diverges on exact .5 grid hits."""
    return (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)


def test_ewma_matches_numpy_twin(spark):
    """w11_ewma must equal an independent numpy unroll: weights 2^(7-d)
    over the last 8 events (ts, event_id)-ordered, quantized values,
    normalized by the weights present."""
    got = {
        r.event_id: (r.ewma_num, r.w_sum, r.ewma)
        for r in QUERIES["w11_ewma"].spark_fn(spark, SF).collect()
    }
    pdf = pd.read_parquet(
        f"{SF}/events.parquet", columns=["event_id", "user_id", "value", "ts"]
    ).sort_values(["user_id", "ts", "event_id"])
    checked = 0
    for _, g in pdf.groupby("user_id"):
        qv = _round_half_away(g["value"].to_numpy() * GRID20)
        eids = g["event_id"].to_numpy()
        for i in range(len(g)):
            lo = max(0, i - 7)
            vals = qv[lo : i + 1][::-1]  # lag 0 first
            weights = np.array([1 << (7 - d) for d in range(len(vals))])
            num = int((weights * vals).sum())
            wsum = int(weights.sum())
            gnum, gws, gewma = got[eids[i]]
            assert (gnum, gws) == (num, wsum), (eids[i], gnum, num)
            assert gewma == num / GRID20 / wsum
            checked += 1
    assert checked == len(pdf)


def test_pq_assign_matches_numpy_argmin(spark):
    """emb_pq_assign must pick the numpy argmin codeword per subspace
    (on the same quantized grid, ties to the lower code)."""
    emb = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    }
    grid = 1 << 12
    q = {k: _round_half_away(v * grid) for k, v in emb.items()}
    codes = {c: q[c] for c in range(16)}
    out = QUERIES["emb_pq_assign"].spark_fn(spark, SF).collect()
    assert len(out) == len(emb) * 8
    for r in out:
        x = q[r.vec_id][r.subspace * 8 : (r.subspace + 1) * 8]
        dists = np.array(
            [
                ((x - codes[c][r.subspace * 8 : (r.subspace + 1) * 8]) ** 2).sum()
                for c in range(16)
            ]
        )
        best = int(dists.min())
        assert r.qdist == best
        assert r.code == int(np.flatnonzero(dists == best)[0])


def test_gram_column_matches_numpy(spark):
    """emb_gram_column must equal the first column of the quantized
    X^T X computed by numpy."""
    X = np.stack(
        [
            np.asarray(r.embedding, dtype=np.float64)
            for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
        ]
    )
    grid = 1 << 14
    Q = _round_half_away(X * grid)
    want = Q.T @ Q[:, 0]  # int64 matvec
    got = {r.pos: (r.gram_q, r.n_vectors) for r in
           QUERIES["emb_gram_column"].spark_fn(spark, SF).collect()}
    assert len(got) == X.shape[1]
    for pos0 in range(X.shape[1]):
        gq, n = got[pos0 + 1]
        assert n == X.shape[0]
        assert gq == int(want[pos0])


def test_tfidf_scores_match_formula(spark):
    """ts_tfidf_topk's integer scores must equal tf · round(ln(N/df)·2^20)
    computed independently in Python, and each doc's rows must be its
    true top-5 (ties to lexicographically smaller token)."""
    import math
    from collections import Counter

    docs = {
        r.doc_id: [t for t in r.text.lower().split() if t]
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    n_docs = len(docs)
    df = Counter()
    for toks in docs.values():
        df.update(set(toks))
    out = QUERIES["ts_tfidf_topk"].spark_fn(spark, SF).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, rows in by_doc.items():
        tf = Counter(docs[doc_id])
        scores = {
            t: tf[t] * round(math.log(n_docs / df[t]) * GRID20) for t in tf
        }
        want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        got = sorted(
            ((r.token, r.score_q) for r in rows),
            key=lambda kv: (-kv[1], kv[0]),
        )
        assert got == want, (doc_id, got, want)


def test_temperature_mix_rates(spark):
    """sample_temperature_mix keep-thresholds must equal
    floor(sqrt(min_n/n_s)·2^20) per source, and the rarest source must
    keep everything (keep_q = 2^20 > any hash residue)."""
    src_counts = (
        pd.read_parquet(f"{SF}/documents.parquet", columns=["source"])
        .value_counts()
        .to_dict()
    )
    counts = {k[0]: v for k, v in src_counts.items()}
    mn = min(counts.values())
    out = QUERIES["sample_temperature_mix"].spark_fn(spark, SF).collect()
    assert out
    seen = {}
    for r in out:
        seen[r.source] = r.keep_q
        import math

        assert r.keep_q == math.floor(math.sqrt(mn / counts[r.source]) * GRID20)
    rare = min(counts, key=counts.get)
    if rare in seen:
        assert seen[rare] == GRID20


def test_hll_weekly_rollup_accuracy_and_merge(spark):
    """The merged weekly sketch estimate must sit within HLL's error
    envelope of the exact weekly distinct count (lgK=14 → ~0.8% typical;
    assert 5% — collapse-to-garbage is what this catches), and per-week
    day counts must match the calendar."""
    from pyspark.sql import functions as F

    out = {
        (r.week, r.n_days): r.approx_weekly_users
        for r in QUERIES["ev_hll_weekly_rollup"].spark_fn(spark, SF).collect()
    }
    ev = spark.read.parquet(f"{SF}/events.parquet")
    exact = {
        (r.week, r.n_days): r.n
        for r in ev.groupBy(
            F.date_trunc("week", "ts").cast("date").alias("week")
        )
        .agg(
            F.countDistinct(F.col("ts").cast("date")).alias("n_days"),
            F.countDistinct("user_id").alias("n"),
        )
        .collect()
    }
    assert set(out) == set(exact)
    for k, est in out.items():
        rel = abs(est - exact[k]) / exact[k]
        assert rel <= 0.05, (k, est, exact[k])


def test_pagerank_step_matches_numpy_twin(spark):
    """graph_pagerank_step must equal an independent pandas/numpy
    reimplementation: distinct customer→supplier edges, equal split of
    2^20 rank mass by integer division, damping as *17 div 20."""
    got = {
        r.suppkey: r.rank_q
        for r in QUERIES["graph_pagerank_step"].spark_fn(spark, SF).collect()
    }
    li = pd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"])
    orders = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    e = li.merge(
        orders, left_on="l_orderkey", right_on="o_orderkey"
    )[["o_custkey", "l_suppkey"]].drop_duplicates()
    deg = e.groupby("o_custkey").size()
    w = (1048576 // deg.loc[e["o_custkey"]].to_numpy()).astype(np.int64)
    sums = pd.Series(w).groupby(e["l_suppkey"].to_numpy()).sum()
    want = {int(s): int((v * 17) // 20 + (1048576 * 3) // 20) for s, v in sums.items()}
    assert got == want


def test_pagerank_two_steps_resume_from_parquet(spark, tmp_path):
    """The iterative-algorithm contract (like the persisted LSH index):
    a driver loop re-runs the per-step query with the previous step's
    PERSISTED output as input, and because the arithmetic is integer-
    grid-exact the resumed chain is bit-identical to an independent
    two-step numpy unroll (no drift across write/read/restart)."""
    import pyspark.sql.functions as F

    from automated_agro_climatic_data_warehouse_spark.sources import load_table

    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, SF, "orders").select("o_orderkey", "o_custkey")
    e = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
    )

    # step 2 direction: supplier rank mass flows back to customers
    def sup_to_cust_step(ranks_df):
        degs = e.groupBy("s").agg(F.count(F.lit(1)).alias("d"))
        return (
            e.join(degs, "s")
            .join(ranks_df, "s")
            .select("c", F.expr("rank_q div d").alias("w"))
            .groupBy(F.col("c").alias("custkey"))
            .agg(
                F.expr("(sum(w) * 17) div 20 + (1048576 * 3) div 20")
                .cast("bigint")
                .alias("rank_q")
            )
        )

    step1 = QUERIES["graph_pagerank_step"].spark_fn(spark, SF)
    p = str(tmp_path / "ranks_step1")
    step1.write.parquet(p)  # simulate driver-loop checkpoint + restart
    resumed = spark.read.parquet(p).withColumnRenamed("suppkey", "s")
    got = {r.custkey: r.rank_q for r in sup_to_cust_step(resumed).collect()}

    # independent numpy twin of both steps
    li_p = pd.read_parquet(f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"])
    o_p = pd.read_parquet(f"{SF}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    ep = li_p.merge(o_p, left_on="l_orderkey", right_on="o_orderkey")[
        ["o_custkey", "l_suppkey"]
    ].drop_duplicates()
    cdeg = ep.groupby("o_custkey").size()
    w1 = (1048576 // cdeg.loc[ep["o_custkey"]].to_numpy()).astype(np.int64)
    r_s = pd.Series(w1).groupby(ep["l_suppkey"].to_numpy()).sum()
    r_s = (r_s * 17) // 20 + (1048576 * 3) // 20
    sdeg = ep.groupby("l_suppkey").size()
    w2 = (
        r_s.loc[ep["l_suppkey"]].to_numpy()
        // sdeg.loc[ep["l_suppkey"]].to_numpy()
    ).astype(np.int64)
    r_c = pd.Series(w2).groupby(ep["o_custkey"].to_numpy()).sum()
    want = {
        int(c): int((v * 17) // 20 + (1048576 * 3) // 20)
        for c, v in r_c.items()
    }
    assert got == want


def test_approx_percentile_within_sketch_error_bound(spark):
    """The 100 TB quantile path is approx_percentile (Greenwald-Khanna
    sketch, mergeable partials) — a10_exact_percentiles is the oracle
    twin, this pins the sketch against it: with accuracy parameter A,
    the returned value's RANK must be within n/A of the target rank."""
    import pyspark.sql.functions as F

    from automated_agro_climatic_data_warehouse_spark.sources import load_table

    ev = load_table(spark, "/root/testdata/sf0.01", "events")
    acc = 1000
    approx = ev.agg(
        F.percentile_approx("value", [0.5, 0.9, 0.99], acc).alias("p")
    ).collect()[0].p
    vals = sorted(r.value for r in ev.select("value").collect())
    n = len(vals)
    for q, a in zip((0.5, 0.9, 0.99), approx):
        import bisect

        lo = bisect.bisect_left(vals, a)
        hi = bisect.bisect_right(vals, a)
        target = q * n
        # rank error bound: some rank of the returned value is within n/acc
        assert lo - n / acc <= target <= hi + n / acc, (q, a, lo, hi)

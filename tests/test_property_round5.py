"""Differential property tests for the round-5 iterative/closed-form
operators — hypothesis drives adversarial inputs against independent
pure-Python replicas (beyond what the fixed-testdata oracle gate can
exercise)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from automated_agro_climatic_data_warehouse_spark.operators.graph import pagerank_loop

_EDGE = st.tuples(
    st.integers(min_value=0, max_value=5),
    st.integers(min_value=0, max_value=5),
)
_EDGES = st.lists(_EDGE, min_size=1, max_size=12)


def _pagerank_py(sym_edges, k, total=1 << 20):
    """Pure-Python replica of pagerank_loop's exact integer recursion."""
    deg: dict[int, int] = {}
    for u, _ in sym_edges:
        deg[u] = deg.get(u, 0) + 1
    ranks = {u: total for u in deg}
    teleport = total * 3 // 20
    for _ in range(k):
        nxt: dict[int, int] = {}
        for u, v in sym_edges:
            nxt[v] = nxt.get(v, 0) + ranks[u] // deg[u]
        ranks = {v: (s * 17) // 20 + teleport for v, s in nxt.items()}
    return ranks


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(_EDGES)
def test_pagerank_loop_matches_python_replica(spark, raw):
    """pagerank_loop over a symmetrized random multigraph-free edge set
    must equal the sequential integer recursion exactly (k=3)."""
    undirected = {(a, b) for a, b in raw if a != b}
    if not undirected:
        return
    sym = sorted(undirected | {(b, a) for a, b in undirected})
    df = spark.createDataFrame(sym, "src long, dst long")
    got = {
        (r.node, r.r) for r in pagerank_loop(df, k=3).collect()
    }
    want = set(_pagerank_py(sym, k=3).items())
    assert got == want


_HIST = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=12),   # value
        st.integers(min_value=1, max_value=40),   # multiplicity
    ),
    min_size=1,
    max_size=8,
    unique_by=lambda t: t[0],
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(_HIST, st.sampled_from([3, 5, 10]))
def test_weighted_ntile_closed_form_matches_native(spark, hist, n):
    """The w14 closed form (tile rank-range intersection over the value
    histogram) must reproduce native ntile's per-(value, tile) counts
    for arbitrary multiplicity profiles — including values spanning
    several tiles and tiles swallowing several values."""
    from pyspark.sql.window import Window as W

    rows = [(v, i) for v, m in hist for i in range(m)]
    df = spark.createDataFrame(rows, "v long, seq long")
    want = {
        (r.v, r.tile, r.c)
        for r in df.select(
            "v", F.ntile(n).over(W.orderBy("v", "seq")).alias("tile")
        )
        .groupBy("v", "tile")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    # the SHARED production operator (what the w14 plan runs)
    from automated_agro_climatic_data_warehouse_spark.operators.ranking import (
        weighted_ntile_histogram,
    )

    got = {
        (r.v, r.tile, r.n_rows)
        for r in weighted_ntile_histogram(
            df.select("v"), "v", n
        ).collect()
    }
    assert got == want

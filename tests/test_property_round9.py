"""Differential property tests for the round-9 exact operators —
hypothesis drives adversarial histogram/tie/degenerate patterns against
pure Python replicas (beyond the fixed-testdata oracle gate).
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from automated_agro_climatic_data_warehouse_spark.operators.survival import (
    km_curve,
    km_histogram_merge,
    na_curve,
)

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

T = 1 << 20

# subject lists: durations with heavy ties, censored tails, and the
# everyone-churns terminal step hypothesis loves to find
_SUBJECTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=8),
        st.integers(min_value=0, max_value=1),
    ),
    min_size=1,
    max_size=40,
)


def _km_py(subjects):
    byd = {}
    for dur, cen in subjects:
        ch, cn = byd.get(dur, (0, 0))
        byd[dur] = (ch + (1 - cen), cn + cen)
    out = {}
    n_after = 0
    risk = {}
    for dur in sorted(byd, reverse=True):
        ch, cn = byd[dur]
        n_after += ch + cn
        risk[dur] = n_after
    cum = 0
    hit_zero = False
    for dur in sorted(byd):
        ch, cn = byd[dur]
        n = risk[dur]
        if ch == n:
            hit_zero = True
        elif ch:
            cum += round(math.log(n - ch) * T) - round(math.log(n) * T)
        surv = 0 if hit_zero else round(math.exp(cum / T) * 1_000_000)
        out[dur] = (n, ch, cn, surv)
    return out


def _na_py(subjects):
    byd = {}
    for dur, cen in subjects:
        ch, cn = byd.get(dur, (0, 0))
        byd[dur] = (ch + (1 - cen), cn + cen)
    risk = {}
    n_after = 0
    for dur in sorted(byd, reverse=True):
        ch, cn = byd[dur]
        n_after += ch + cn
        risk[dur] = n_after
    out = {}
    h = v = 0
    for dur in sorted(byd):
        ch, cn = byd[dur]
        n = risk[dur]
        h += (ch * T) // n
        v += (ch * (1 << 30)) // (n * n)
        out[dur] = (n, ch, cn, h, v)
    return out


@settings(**_SETTINGS)
@given(_SUBJECTS)
def test_km_curve_matches_python(spark, subjects):
    df = spark.createDataFrame(subjects, "dur bigint, censored int")
    got = {
        r.dur: (r.n_risk, r.churned, r.censored_n, r.surv_e6)
        for r in km_curve(km_histogram_merge(df, None)).collect()
    }
    assert got == _km_py(subjects)
    # survival is monotone non-increasing in duration
    surv = [got[d][3] for d in sorted(got)]
    assert all(a >= b for a, b in zip(surv, surv[1:]))


@settings(**_SETTINGS)
@given(_SUBJECTS)
def test_na_curve_matches_python(spark, subjects):
    df = spark.createDataFrame(subjects, "dur bigint, censored int")
    got = {
        r.dur: (r.n_risk, r.churned, r.censored_n, r.na_q, r.var_q)
        for r in na_curve(km_histogram_merge(df, None)).collect()
    }
    assert got == _na_py(subjects)
    # cumulative hazard is monotone non-decreasing in duration
    na = [got[d][3] for d in sorted(got)]
    assert all(a <= b for a, b in zip(na, na[1:]))


# ------------------------------------------------------------- katz_loop
_EDGES = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=6),
        st.integers(min_value=0, max_value=6),
    ),
    min_size=1,
    max_size=20,
)


@settings(**_SETTINGS)
@given(_EDGES, st.integers(min_value=1, max_value=3))
def test_katz_loop_matches_python(spark, edges, k):
    from collections import Counter

    from automated_agro_climatic_data_warehouse_spark.operators.graph import (
        katz_loop,
    )

    df = spark.createDataFrame(edges, "u bigint, v bigint")
    got = {
        r.node: r.score_q
        for r in katz_loop(df, k=k, alpha_den=4).collect()
    }
    nodes = {u for u, _ in edges} | {v for _, v in edges}
    x = {n: T for n in nodes}
    for _ in range(k):
        sm = Counter()
        for u, v in edges:  # directed multiset: duplicates count twice
            sm[v] += x[u]
        x = {n: sm[n] // 4 + T for n in nodes}
    assert got == x

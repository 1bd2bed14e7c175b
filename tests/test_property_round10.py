"""Differential property tests for the round-10 exact operators —
hypothesis drives adversarial tie/degenerate/skew patterns against
pure Python replicas (beyond the fixed-testdata oracle gate). The
point: the DuckDB oracle proves cross-engine agreement, these prove
the staged arithmetic itself is the textbook statistic.
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # multi-minute suite: excluded from the default (driver) tier

import math

from hypothesis import HealthCheck, assume, given, settings
from hypothesis import strategies as st

from automated_agro_climatic_data_warehouse_spark.operators.quality import (
    kw_histogram_merge,
    kw_readout,
    mw_histogram_merge,
    mw_readout,
    srm_daily_merge,
    srm_readout,
)

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

# (cents, g1) observations: tiny value domain forces heavy ties
_MW_OBS = st.lists(
    st.tuples(
        st.integers(min_value=-5, max_value=5),
        st.integers(min_value=0, max_value=1),
    ),
    min_size=2,
    max_size=60,
)

_KW_OBS = st.lists(
    st.tuples(
        st.sampled_from(["g0", "g1", "g2"]),
        st.integers(min_value=-4, max_value=4),
    ),
    min_size=2,
    max_size=60,
)

_SRM_DAYS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=200),
        st.integers(min_value=0, max_value=200),
    ),
    min_size=1,
    max_size=8,
)


def _mw_py(obs):
    """Doubled-midrank MW over the value histogram, exact ints."""
    hist = {}
    for c, g in obs:
        t, t1 = hist.get(c, (0, 0))
        hist[c] = (t + 1, t1 + g)
    c_lt, r1x2, n1, n2, tie = 0, 0, 0, 0, 0
    for c in sorted(hist):
        t, t1 = hist[c]
        r1x2 += t1 * (2 * c_lt + t + 1)
        n1 += t1
        n2 += t - t1
        tie += t * t * t - t
        c_lt += t
    u1x2 = r1x2 - n1 * (n1 + 1)
    n = n1 + n2
    var_num = n1 * n2 * (n * (n - 1) * (n + 1) - tie)
    var_den = 12 * n * (n - 1)
    z = (u1x2 - n1 * n2) / (2.0 * math.sqrt(var_num / var_den))
    return n1, n2, u1x2, n1 * n2, tie, z


@given(obs=_MW_OBS)
@settings(**_SETTINGS)
def test_mw_readout_matches_python(spark, obs):
    n1 = sum(g for _, g in obs)
    n2 = len(obs) - n1
    assume(n1 > 0 and n2 > 0)
    assume(len({c for c, _ in obs}) >= 2)  # variance > 0
    exp = _mw_py(obs)
    df = spark.createDataFrame(obs, "cents bigint, g1 int")
    r = mw_readout(mw_histogram_merge(df, None)).collect()[0]
    assert (r.n1, r.n2, r.u1_x2, r.mu_x2, r.tie_term) == exp[:5]
    assert math.isclose(r.z_score, exp[5], rel_tol=1e-12, abs_tol=1e-12)


def _kw_py(obs):
    """Doubled-midrank KW: H and tie-corrected H, exact staging
    (r11 form: exact quotient + 2^-30-grid remainder split)."""
    vh, gh = {}, {}
    for g, c in obs:
        vh[c] = vh.get(c, 0) + 1
        gh[(g, c)] = gh.get((g, c), 0) + 1
    c_lt, rank2 = 0, {}
    tie = 0
    for c in sorted(vh):
        t = vh[c]
        rank2[c] = 2 * c_lt + t + 1
        tie += t * t * t - t
        c_lt += t
    per = {}
    for (g, c), tg in gh.items():
        ng, rx2 = per.get(g, (0, 0))
        per[g] = (ng + tg, rx2 + tg * rank2[c])
    k = len(per)
    n = sum(ng for ng, _ in per.values())
    s_q = sum((rx2 * rx2) // ng for ng, rx2 in per.values())
    s_r = sum(
        ((rx2 * rx2) % ng) * 1073741824 // ng for ng, rx2 in per.values()
    )
    h = (float(s_q) * 3.0 + float(s_r) * 3.0 / 1073741824.0) / float(
        n * (n + 1)
    ) - 3.0 * (n + 1)
    h_adj = h / (1.0 - float(tie) / float(n * n * n - n))
    return k, n, tie, h, h_adj


@given(obs=_KW_OBS)
@settings(**_SETTINGS)
def test_kw_readout_matches_python(spark, obs):
    assume(len({c for _, c in obs}) >= 2)  # tie correction < 1
    exp = _kw_py(obs)
    df = spark.createDataFrame(obs, "grp string, cents bigint")
    r = kw_readout(kw_histogram_merge(df, None)).collect()[0]
    assert (r.k, r.n, r.tie_term) == exp[:3]
    assert math.isclose(r.h_stat, exp[3], rel_tol=1e-12, abs_tol=1e-12)
    assert math.isclose(r.h_adj, exp[4], rel_tol=1e-12, abs_tol=1e-12)


@given(days=_SRM_DAYS)
@settings(**_SETTINGS)
def test_srm_readout_matches_python(spark, days):
    import datetime

    rows = []
    for d, (na, nb) in enumerate(days):
        day = datetime.date(2024, 1, 1) + datetime.timedelta(days=d)
        rows += [(day, 1)] * na + [(day, 0)] * nb
    assume(rows)
    df = spark.createDataFrame(rows, "day date, in_a int")
    got = {
        r.day: (r.n_a, r.n_b, r.chi2_e6, r.srm_flag)
        for r in srm_readout(srm_daily_merge(df, None)).collect()
    }
    for d, (na, nb) in enumerate(days):
        if na + nb == 0:
            continue
        day = datetime.date(2024, 1, 1) + datetime.timedelta(days=d)
        chi = ((na - nb) * (na - nb) * 1_000_000) // (na + nb)
        assert got[day] == (na, nb, chi, int(chi >= 3_841_459))


def _w1_py(rows):
    """The dq_wasserstein_drift arithmetic: midpoint split, per-type
    value histograms, W1 = sum |cum1*n2 - cum2*n1| * gap, e6 div."""
    mid = (min(us for _, _, us in rows) + max(us for _, _, us in rows)) // 2
    hists = {}
    for ty, c, us in rows:
        h = hists.setdefault(ty, {})
        c1, c2 = h.get(c, (0, 0))
        h[c] = (c1 + (us <= mid), c2 + (us > mid))
    out = {}
    for ty, h in hists.items():
        n1 = sum(a for a, _ in h.values())
        n2 = sum(b for _, b in h.values())
        if n1 == 0 or n2 == 0:
            continue
        cum1 = cum2 = num = 0
        cs = sorted(h)
        for v, nxt in zip(cs, cs[1:]):
            a, b = h[v]
            cum1, cum2 = cum1 + a, cum2 + b
            num += abs(cum1 * n2 - cum2 * n1) * (nxt - v)
        if len(cs) >= 2:
            out[ty] = (n1, n2, (num * 1_000_000) // (n1 * n2))
    return out


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.integers(min_value=0, max_value=12),   # cents
            st.integers(min_value=0, max_value=50),   # coarse time
        ),
        min_size=4,
        max_size=50,
    )
)
@settings(**_SETTINGS)
def test_wasserstein_query_matches_python(spark, rows, tmp_path_factory):
    """Full-query differential: stage the generated events as parquet,
    run the registered query, compare against the Python replica."""
    import datetime
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from automated_agro_climatic_data_warehouse_spark.plans import QUERIES

    t0 = datetime.datetime(2024, 1, 1)
    us_rows = [
        (ty, c, int((t0 + datetime.timedelta(hours=h)).timestamp() * 1e6))
        for ty, c, h in rows
    ]
    exp = _w1_py(us_rows)
    assume(exp)
    table = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array(
                [t0 + datetime.timedelta(hours=h) for _, _, h in rows],
                pa.timestamp("us"),
            ),
            "user_id": pa.array(range(len(rows)), pa.int64()),
            "event_type": pa.array([ty for ty, _, _ in rows], pa.string()),
            "value": pa.array([c / 100.0 for _, c, _ in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    d = str(tmp_path_factory.mktemp("w1"))
    pq.write_table(table, os.path.join(d, "events.parquet"))
    got = {
        r.event_type: (r.n1, r.n2, r.w1_e6)
        for r in QUERIES["dq_wasserstein_drift"].spark_fn(spark, d).collect()
    }
    # types with a single distinct value have no ECDF step rows: the
    # query emits no row (documented); the replica mirrors that
    assert got == exp


def _cramers_py(rows):
    """Textbook chi2/V over the full grid, mirroring the e6 staging."""
    cells, types, dows = {}, set(), set()
    for ty, d in rows:
        cells[(ty, d)] = cells.get((ty, d), 0) + 1
        types.add(ty)
        dows.add(d)
    rt = {t: sum(cells.get((t, d), 0) for d in dows) for t in types}
    ct = {d: sum(cells.get((t, d), 0) for t in types) for d in dows}
    n = sum(cells.values())
    s_q = 0
    for t in types:
        for d in dows:
            o = cells.get((t, d), 0)
            dev = o * n - rt[t] * ct[d]
            s_q += (dev * dev * 1_000_000) // (rt[t] * ct[d])
    chi2_e6 = s_q // n
    k = min(len(types), len(dows))
    v = math.sqrt((chi2_e6 / 1e6) / (n * (k - 1))) if k > 1 else 0.0
    return n, len(types), len(dows), chi2_e6, v


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.integers(min_value=0, max_value=3),
        ),
        min_size=2,
        max_size=60,
    )
)
@settings(**_SETTINGS)
def test_cramers_v_readout_matches_python(spark, rows):
    from automated_agro_climatic_data_warehouse_spark.operators.quality import (
        cramers_v_readout,
        ct_merge,
    )

    n_t = len({t for t, _ in rows})
    n_d = len({d for _, d in rows})
    assume(n_t >= 2 and n_d >= 2)  # V defined only past a 1-row/col table
    exp = _cramers_py(rows)
    df = spark.createDataFrame(rows, "event_type string, dow bigint")
    r = cramers_v_readout(ct_merge(df, None)).collect()[0]
    assert (r.n, r.k_r, r.k_c, r.chi2_e6) == exp[:4]
    assert math.isclose(r.cramers_v, exp[4], rel_tol=1e-12, abs_tol=1e-12)

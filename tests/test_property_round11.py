"""Mirrored-bug sweep of the pre-r9 staged-statistics family
(r10 verdict, next-round item 1): the DuckDB oracle gate proves
cross-engine agreement but is structurally blind to a math error
mirrored onto both engines (the dq_cramers_v chi²/N² find). Each
statistic here gets (a) a HAND FIXTURE with a closed-form textbook
answer and (b) a pure-Python differential that re-derives the
statistic independently of the shipped staging.

Covered: dq_mix_drift_chi2 (the densification fix this file pins),
dq_psi_drift, ev_cmh_test, dq_cusum_shift, ev_ab_test_lift — plus the
r10-ADVICE independent (non-staging-replica) rank cross-checks for the
Mann-Whitney and Kruskal-Wallis readouts.
"""

from __future__ import annotations

import datetime
import hashlib
import math
import os

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, assume, given, settings
from hypothesis import strategies as st

from automated_agro_climatic_data_warehouse_spark.plans import QUERIES

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

_T0 = datetime.datetime(2024, 1, 1)


def _write_events(d: str, rows: list[tuple]) -> str:
    """Stage (day_offset, user_id, event_type, value) rows as an
    events.parquet with the testdata schema; returns the sf_dir."""
    table = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array(
                [_T0 + datetime.timedelta(days=day, hours=1) for day, *_ in rows],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([u for _, u, *_ in rows], pa.int64()),
            "event_type": pa.array([t for _, _, t, _ in rows], pa.string()),
            "value": pa.array([v for *_, v in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(table, os.path.join(d, "events.parquet"))
    return d


def _arm(uid: int) -> str:
    """Python replica of the shared 'ab1:' md5 hash split."""
    h = int(hashlib.md5(f"ab1:{uid}".encode()).hexdigest()[:8], 16)
    return "A" if h % 2 == 0 else "B"


def _users_by_arm(arm: str, n: int, start: int = 0) -> list[int]:
    out, uid = [], start
    while len(out) < n:
        if _arm(uid) == arm:
            out.append(uid)
        uid += 1
    return out


# ---------------------------------------------------------------- chi2


def test_mix_drift_chi2_vanished_type_fixture(spark, tmp_path):
    """Closed-form fixture for the r10-verdict densification bug: two
    days, two types; day 2 loses type B entirely. Corpus totals
    n=40, n_A=30, n_B=10, every day n_day=20 → E_A=15, E_B=5 on both
    days. Textbook chi² is 20/3 on BOTH days (day 1: 25/15 + 25/5;
    day 2: (20−15)²/15 + (0−5)²/5 — the vanished cell contributes its
    full E=5). The pre-fix plan summed observed cells only, reading
    day 2 as 25/15 = 5/3 — a 4× understatement of the exact alarm case
    the docstring advertises."""
    rows = (
        [(0, u, "A", 1.0) for u in range(10)]
        + [(0, u, "B", 1.0) for u in range(10)]
        + [(1, u, "A", 1.0) for u in range(20)]
    )
    sf = _write_events(str(tmp_path), rows)
    got = {
        r.day.isoformat(): r.chi2
        for r in QUERIES["dq_mix_drift_chi2"].spark_fn(spark, sf).collect()
    }
    assert set(got) == {"2024-01-01", "2024-01-02"}
    for day, chi2 in got.items():
        assert math.isclose(chi2, 20.0 / 3.0, abs_tol=2e-6), (day, chi2)


def _chi2_py(rows):
    """Independent densified chi²: plain dict arithmetic, the same
    2^-20 term quantization (so the comparison is exact)."""
    cell, days, types = {}, set(), set()
    for day, _, ty, _ in rows:
        cell[(day, ty)] = cell.get((day, ty), 0) + 1
        days.add(day)
        types.add(ty)
    n_day = {d: sum(cell.get((d, t), 0) for t in types) for d in days}
    n_type = {t: sum(cell.get((d, t), 0) for d in days) for t in types}
    n = sum(cell.values())
    out = {}
    for d in days:
        q = 0
        for t in types:
            e = n_day[d] * (n_type[t] / n)
            q += round((cell.get((d, t), 0) - e) ** 2 / e * 1048576)
        out[d] = q
    return out


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),
            st.integers(min_value=0, max_value=30),
            st.sampled_from(["view", "click", "purchase"]),
            st.just(1.0),
        ),
        min_size=2,
        max_size=60,
    )
)
@settings(**_SETTINGS)
def test_mix_drift_chi2_matches_python(spark, rows, tmp_path_factory):
    exp = _chi2_py(rows)
    sf = _write_events(str(tmp_path_factory.mktemp("chi2")), rows)
    got = {
        (r.day - _T0.date()).days: r.chi2_q
        for r in QUERIES["dq_mix_drift_chi2"].spark_fn(spark, sf).collect()
    }
    assert got == exp


# ----------------------------------------------------------------- psi


def _psi_py(values_ref: list[int], values_cur: list[int]):
    """Textbook PSI with +1 Laplace smoothing over the 10 fixed
    buckets, pure floats — independent of the e6/ln-grid staging."""
    c_ref = [1] * 10
    c_cur = [1] * 10
    for v in values_ref:
        c_ref[min(9, v // 50)] += 1
    for v in values_cur:
        c_cur[min(9, v // 50)] += 1
    n_ref, n_cur = sum(c_ref), sum(c_cur)
    return sum(
        (r / n_ref - c / n_cur) * math.log((r / n_ref) / (c / n_cur))
        for r, c in zip(c_ref, c_cur)
    )


def test_psi_drift_known_shift_fixture(spark, tmp_path):
    """Hand fixture: ref period 100 values in bucket 0 + 100 in
    bucket 1; current period 50 / 150 — a pure 0→1 mass shift whose
    smoothed textbook PSI the float replica computes directly. The
    staged e6/ln-grid sum must land within quantization distance
    (each of the 10 terms carries ≤ ~2e-6 share resolution)."""
    ref = [10] * 100 + [60] * 100     # buckets 0 and 1, days 0-14
    cur = [10] * 50 + [60] * 150      # days 15+
    rows = [(0, i, "view", float(v)) for i, v in enumerate(ref)] + [
        (20, 1000 + i, "view", float(v)) for i, v in enumerate(cur)
    ]
    sf = _write_events(str(tmp_path), rows)
    out = QUERIES["dq_psi_drift"].spark_fn(spark, sf).collect()
    assert len(out) == 10
    got = sum(r.psi_term_e6 for r in out) / 1e6
    exp = _psi_py(ref, cur)
    assert math.isclose(got, exp, abs_tol=5e-4), (got, exp)
    # the two shifted buckets carry essentially all the PSI mass
    by_bucket = {r.bucket: r.psi_term_e6 for r in out}
    assert by_bucket[0] > 0 and by_bucket[1] > 0
    assert sum(v for k, v in by_bucket.items() if k >= 2) <= 2


@given(
    vals=st.lists(
        st.tuples(
            st.booleans(),                       # False=ref, True=cur
            st.integers(min_value=0, max_value=520),
        ),
        min_size=2,
        max_size=80,
    )
)
@settings(**_SETTINGS)
def test_psi_drift_matches_python(spark, vals, tmp_path_factory):
    assume(any(not c for c, _ in vals) and any(c for c, _ in vals))
    ref = [v for c, v in vals if not c]
    cur = [v for c, v in vals if c]
    rows = [(0, i, "view", float(v)) for i, v in enumerate(ref)] + [
        (25, 1000 + i, "view", float(v)) for i, v in enumerate(cur)
    ]
    sf = _write_events(str(tmp_path_factory.mktemp("psi")), rows)
    out = QUERIES["dq_psi_drift"].spark_fn(spark, sf).collect()
    got = sum(r.psi_term_e6 for r in out) / 1e6
    exp = _psi_py(ref, cur)
    assert math.isclose(got, exp, abs_tol=1e-3), (got, exp)


# ----------------------------------------------------------------- cmh


def _cmh_py(strata):
    """Textbook CMH from (a, n1, c, n2) strata tuples, pure floats."""
    sum_a = e_a = v_a = or_num = or_den = 0.0
    for a, n1, c, n2 in strata:
        b, d = n1 - a, n2 - c
        t, m1 = n1 + n2, a + c
        sum_a += a
        e_a += n1 * m1 / t
        v_a += n1 * n2 * m1 * (t - m1) / (t * t * (t - 1))
        or_num += a * d / t
        or_den += b * c / t
    chi2_cc = (abs(sum_a - e_a) - 0.5) ** 2 / v_a
    return sum_a, e_a, v_a, chi2_cc, or_num / or_den


def _cmh_rows(strata):
    """Stage CMH strata as event rows: stratum j = day j; B-arm rows
    need users whose md5 split lands in B (python-replayed)."""
    rows = []
    b_users = _users_by_arm("B", 400)
    a_users = _users_by_arm("A", 400)
    for day, (a, n1, c, n2) in enumerate(strata):
        for i in range(n1):
            rows.append(
                (day, b_users[i], "purchase" if i < a else "view", 1.0)
            )
        for i in range(n2):
            rows.append(
                (day, a_users[i], "purchase" if i < c else "view", 1.0)
            )
    return rows


def test_cmh_known_odds_ratio_fixture(spark, tmp_path):
    """Hand fixture with a closed-form Mantel-Haenszel OR: stratum 1 is
    the 2×2 (a=4, b=6, c=2, d=8) — OR 8/3; stratum 2 is the flat
    (1,1,1,1) — OR 1. Pooled: or_mh = (4·8/20 + 1·1/4)/(6·2/20 + 1·1/4)
    = 1.85/0.85, ΣE = 3+1, ΣV = 8400/7600 + 1/3, chi2_cc =
    (|5−4|−½)²/ΣV — every number checkable by hand."""
    strata = [(4, 10, 2, 10), (1, 2, 1, 2)]
    sf = _write_events(str(tmp_path), _cmh_rows(strata))
    r = QUERIES["ev_cmh_test"].spark_fn(spark, sf).collect()[0]
    assert r.n_strata == 2 and r.sum_a == 5
    assert math.isclose(r.e_a, 4.0, abs_tol=1e-8)
    assert math.isclose(r.v_a, 8400 / 7600 + 1 / 3, abs_tol=1e-8)
    assert math.isclose(r.or_mh, 1.85 / 0.85, rel_tol=1e-9)
    assert math.isclose(r.chi2_cc, 0.25 / (8400 / 7600 + 1 / 3), rel_tol=1e-9)


@given(
    strata=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),   # a ≤ n1
            st.integers(min_value=1, max_value=8),   # n1 extra
            st.integers(min_value=0, max_value=6),   # c ≤ n2
            st.integers(min_value=1, max_value=8),   # n2 extra
        ),
        min_size=1,
        max_size=4,
    )
)
@settings(**_SETTINGS)
def test_cmh_matches_python(spark, strata, tmp_path_factory):
    strata = [(a, a + dn1, c, c + dn2) for a, dn1, c, dn2 in strata]
    # textbook guards: some mixed outcome so V > 0 and or_den > 0
    exp = None
    vv = sum(
        n1 * n2 * (a + c) * ((n1 + n2) - (a + c))
        / ((n1 + n2) ** 2 * (n1 + n2 - 1))
        for a, n1, c, n2 in strata
    )
    od = sum((n1 - a) * c / (n1 + n2) for a, n1, c, n2 in strata)
    assume(vv > 0 and od > 0)
    exp = _cmh_py(strata)
    sf = _write_events(
        str(tmp_path_factory.mktemp("cmh")), _cmh_rows(strata)
    )
    r = QUERIES["ev_cmh_test"].spark_fn(spark, sf).collect()[0]
    assert r.n_strata == len(strata) and r.sum_a == exp[0]
    assert math.isclose(r.e_a, exp[1], abs_tol=1e-8)
    assert math.isclose(r.v_a, exp[2], abs_tol=1e-8)
    assert math.isclose(r.chi2_cc, exp[3], rel_tol=1e-6)
    assert math.isclose(r.or_mh, exp[4], rel_tol=1e-6)


# --------------------------------------------------------------- cusum


def _cusum_py(daily: list[int]):
    """The literal textbook recursion s_i = max(0, s_{i-1} + (x-k)),
    k = integer-mean reference — independent of the closed form."""
    k = sum(daily) // len(daily)
    s, out = 0, []
    for x in daily:
        s = max(0, s + (x - k))
        out.append(s)
    return k, out


def test_cusum_sustained_shift_fixture(spark, tmp_path):
    """Ten flat days at 4/day then five shifted days at 10/day: k =
    (40+50)//15 = 6, the flat prefix must stay clamped at 0 (each day
    adds −2) and the shifted run accumulates +4/day — s = 4, 8, …, 20,
    alarming (s > k) from shifted day 2 on. The pre-anchor bug class
    (dropping the recursion's s₀=0 clamp) would read the prefix as
    negative drift and the surge late."""
    rows = []
    uid = 0
    for day in range(10):
        for _ in range(4):
            rows.append((day, uid, "view", 1.0))
            uid += 1
    for day in range(10, 15):
        for _ in range(10):
            rows.append((day, uid, "view", 1.0))
            uid += 1
    sf = _write_events(str(tmp_path), rows)
    out = sorted(
        QUERIES["dq_cusum_shift"].spark_fn(spark, sf).collect(),
        key=lambda r: r.day,
    )
    got = [r.cusum_pos for r in out]
    assert got == [0] * 10 + [4, 8, 12, 16, 20]
    assert [r.shifted for r in out] == [False] * 11 + [True] * 4


@given(
    daily=st.lists(st.integers(min_value=1, max_value=12), min_size=2, max_size=20)
)
@settings(**_SETTINGS)
def test_cusum_matches_python_recursion(spark, daily, tmp_path_factory):
    rows = []
    uid = 0
    for day, n in enumerate(daily):
        for _ in range(n):
            rows.append((day, uid, "view", 1.0))
            uid += 1
    k, exp = _cusum_py(daily)
    sf = _write_events(str(tmp_path_factory.mktemp("cusum")), rows)
    out = sorted(
        QUERIES["dq_cusum_shift"].spark_fn(spark, sf).collect(),
        key=lambda r: r.day,
    )
    assert [r.cusum_pos for r in out] == exp
    assert [r.shifted for r in out] == [s > k for s in exp]


# ------------------------------------------------------------- ab lift


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),
            st.integers(min_value=0, max_value=40),
            st.sampled_from(["view", "click", "purchase"]),
            st.integers(min_value=0, max_value=500),
        ),
        min_size=2,
        max_size=60,
    )
)
@settings(**_SETTINGS)
def test_ab_test_lift_matches_python(spark, rows, tmp_path_factory):
    """Plain-python recompute of every ev_ab_test_lift column from raw
    rows with the hashlib arm replica — pins both the md5 split and
    the per-arm ratios end to end."""
    rows = [(d, u, t, v / 100.0) for d, u, t, v in rows]
    exp = {}
    for _, u, t, v in rows:
        arm = _arm(u)
        users, n, p, tv = exp.get(arm, (set(), 0, 0, 0.0))
        users.add(u)
        exp[arm] = (users, n + 1, p + (t == "purchase"), tv + v)
    assume(len(exp) == 2)
    sf = _write_events(str(tmp_path_factory.mktemp("ab")), rows)
    out = QUERIES["ev_ab_test_lift"].spark_fn(spark, sf).collect()
    assert len(out) == 2
    for r in out:
        users, n, p, tv = exp[r.arm]
        assert (r.n_users, r.n_events, r.n_purchases) == (len(users), n, p)
        assert math.isclose(r.total_value, tv, abs_tol=1e-9)
        assert math.isclose(r.value_per_user, tv / len(users), abs_tol=1e-9)
        assert math.isclose(
            r.purchases_per_user, p / len(users), abs_tol=1e-12
        )


# ------------------------- independent MW/KW cross-checks (r10 ADVICE)


def _avg_ranks(values: list[int]) -> dict[int, float]:
    """Average (midpoint) ranks by plain sort — the textbook route,
    independent of the doubled-midrank integer staging."""
    svals = sorted(values)
    ranks: dict[int, float] = {}
    i = 0
    while i < len(svals):
        j = i
        while j < len(svals) and svals[j] == svals[i]:
            j += 1
        ranks[svals[i]] = (i + 1 + j) / 2.0
        i = j
    return ranks


def _mw_textbook(obs):
    """scipy.stats.mannwhitneyu when available, else the float-rank
    textbook derivation (normal approx, tie-corrected, no continuity
    correction — matching the shipped readout's convention)."""
    g1 = [c for c, g in obs if g == 1]
    g2 = [c for c, g in obs if g == 0]
    n1, n2 = len(g1), len(g2)
    try:
        from scipy.stats import mannwhitneyu  # noqa: F401

        u1 = float(mannwhitneyu(g1, g2, use_continuity=False).statistic)
    except ImportError:
        ranks = _avg_ranks(g1 + g2)
        r1 = sum(ranks[c] for c in g1)
        u1 = r1 - n1 * (n1 + 1) / 2.0
    n = n1 + n2
    values = g1 + g2
    counts: dict[int, int] = {}
    for c in values:
        counts[c] = counts.get(c, 0) + 1
    tie = sum(t**3 - t for t in counts.values())
    var = n1 * n2 / 12.0 * ((n + 1) - tie / (n * (n - 1)))
    return (u1 - n1 * n2 / 2.0) / math.sqrt(var)


@given(
    obs=st.lists(
        st.tuples(
            st.integers(min_value=-5, max_value=5),
            st.integers(min_value=0, max_value=1),
        ),
        min_size=2,
        max_size=60,
    )
)
@settings(**_SETTINGS)
def test_mw_readout_matches_textbook_ranks(spark, obs):
    from automated_agro_climatic_data_warehouse_spark.operators.quality import (
        mw_histogram_merge,
        mw_readout,
    )

    n1 = sum(g for _, g in obs)
    assume(0 < n1 < len(obs))
    assume(len({c for c, _ in obs}) >= 2)
    exp_z = _mw_textbook(obs)
    df = spark.createDataFrame(obs, "cents bigint, g1 int")
    r = mw_readout(mw_histogram_merge(df, None)).collect()[0]
    assert math.isclose(r.z_score, exp_z, rel_tol=1e-9, abs_tol=1e-9)


def _kw_textbook(obs):
    """scipy.stats.kruskal when available, else float average ranks:
    H = 12/(N(N+1))·Σ R_j²/n_j − 3(N+1), tie-corrected."""
    groups: dict[str, list[int]] = {}
    for g, c in obs:
        groups.setdefault(g, []).append(c)
    try:
        from scipy.stats import kruskal  # noqa: F401

        return float(kruskal(*groups.values()).statistic)
    except ImportError:
        pass
    values = [c for _, c in obs]
    n = len(values)
    ranks = _avg_ranks(values)
    h = (
        12.0
        / (n * (n + 1))
        * sum(
            sum(ranks[c] for c in vs) ** 2 / len(vs)
            for vs in groups.values()
        )
        - 3 * (n + 1)
    )
    counts: dict[int, int] = {}
    for c in values:
        counts[c] = counts.get(c, 0) + 1
    tie = sum(t**3 - t for t in counts.values())
    return h / (1 - tie / (n**3 - n))


@given(
    obs=st.lists(
        st.tuples(
            st.sampled_from(["g0", "g1", "g2"]),
            st.integers(min_value=-4, max_value=4),
        ),
        min_size=2,
        max_size=60,
    )
)
@settings(**_SETTINGS)
def test_kw_readout_matches_textbook_ranks(spark, obs):
    from automated_agro_climatic_data_warehouse_spark.operators.quality import (
        kw_histogram_merge,
        kw_readout,
    )

    assume(len({c for _, c in obs}) >= 2)
    exp_h = _kw_textbook(obs)
    df = spark.createDataFrame(obs, "grp string, cents bigint")
    r = kw_readout(kw_histogram_merge(df, None)).collect()[0]
    assert math.isclose(r.h_adj, exp_h, rel_tol=1e-9, abs_tol=1e-9)

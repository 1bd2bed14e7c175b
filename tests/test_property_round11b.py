"""Independent TEXTBOOK cross-checks for the pre-r11 staged statistics
whose existing python tests replay the implementation's own staging
(the r10-ADVICE gap, generalized): a replica of the 2^20/e6 grid
arithmetic would pass a formula error mirrored into plan + oracle +
replica together. Each test here re-derives the statistic from its
TEXTBOOK definition on plain floats (or exact Fractions) over designed
fixtures whose population derivation is trivial by construction, and
compares within grid-quantization tolerance — loose enough to ignore
staging resolution, tight enough that a wrong term (the dq_cramers_v
N-vs-N² class) is orders of magnitude outside it.

Covered: ev_survival_logrank, ev_cuped_adjusted_lift,
dq_ks_two_sample, agro_mann_kendall, ev_ipw_ate, ev_eb_shrinkage.
"""

from __future__ import annotations

import datetime
import hashlib
import math
import os
from fractions import Fraction

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, assume, given, settings
from hypothesis import strategies as st

from automated_agro_climatic_data_warehouse_spark.plans import QUERIES

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

_T0 = datetime.datetime(2024, 1, 1)
_US_PER_MIN = 60_000_000


def _write_events_us(d: str, rows: list[tuple]) -> str:
    """(micros_offset, user_id, event_type, value) rows →
    events.parquet (micro-second control for session fixtures)."""
    table = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array(
                [
                    _T0 + datetime.timedelta(microseconds=us)
                    for us, *_ in rows
                ],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([u for _, u, *_ in rows], pa.int64()),
            "event_type": pa.array(
                [t for _, _, t, _ in rows], pa.string()
            ),
            "value": pa.array([v for *_, v in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(table, os.path.join(d, "events.parquet"))
    return d


def _write_documents_nchars(d: str, docs: list[tuple]) -> str:
    """(source, n_chars) rows → documents.parquet (n_chars is the
    designed value — the KS query reads the COLUMN, not the text)."""
    table = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(["x"] * len(docs), pa.string()),
            "lang": pa.array(["en"] * len(docs), pa.string()),
            "source": pa.array([s for s, _ in docs], pa.string()),
            "n_chars": pa.array([n for _, n in docs], pa.int64()),
        }
    )
    pq.write_table(table, os.path.join(d, "documents.parquet"))
    return d


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


# ------------------------------------------------------------- logrank


def _logrank_py(subjects: list[tuple[int, int, int]]):
    """Textbook two-group log-rank on plain floats from (dur,
    censored, grp1) subjects: O1, E1 = Σ d·n1/n over death times, V =
    Σ d·(n1/n)·(1−n1/n)·(n−d)/(n−1), chi2 = (O1−E1)²/V."""
    times = sorted({dur for dur, _, _ in subjects})
    o1 = sum(g for _, cen, g in subjects if not cen)
    e1 = v = 0.0
    for t in times:
        n = sum(1 for dur, _, _ in subjects if dur >= t)
        n1 = sum(1 for dur, _, g in subjects if dur >= t and g)
        d = sum(1 for dur, cen, _ in subjects if dur == t and not cen)
        if d == 0:
            continue
        e1 += d * n1 / n
        if n > 1:
            v += d * (n1 / n) * (1 - n1 / n) * (n - d) / (n - 1)
    chi2 = (o1 - e1) ** 2 / v if v > 0 else None
    return o1, e1, v, chi2


@given(
    subjects=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=25),   # duration minutes
            st.booleans(),                            # censored
            st.booleans(),                            # converted
        ),
        min_size=4,
        max_size=25,
    )
)
@settings(**_SETTINGS)
def test_logrank_matches_textbook(spark, subjects, tmp_path_factory):
    """Each subject becomes ONE session: two events dur minutes apart
    (< the 30-min gap, so they never split), ending day 0; a sentinel
    view 30 days later pins tmax, so a designed subject is censored
    iff we place its end within 30 min of the sentinel. The sentinel
    itself is a (0, censored, grp=0) subject and is accounted in the
    textbook replica."""
    far_us = 30 * 24 * 60 * _US_PER_MIN
    rows = []
    subs = []
    for i, (dur, cens, conv) in enumerate(subjects):
        # uncensored end early; censored end 10 min before the sentinel
        end = (
            far_us - 10 * _US_PER_MIN
            if cens
            else (40 + 60 * i) * _US_PER_MIN
        )
        start = end - dur * _US_PER_MIN
        rows.append((start, i, "view", 1.0))
        rows.append((end, i, "purchase" if conv else "view", 1.0))
        subs.append((dur, int(cens), int(conv)))
    rows.append((far_us, 10_000, "view", 1.0))
    subs.append((0, 1, 0))  # the sentinel session
    sf = _write_events_us(str(tmp_path_factory.mktemp("lr")), rows)
    out = QUERIES["ev_survival_logrank"].spark_fn(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    o1, e1, v, chi2 = _logrank_py(subs)
    assert r.o1 == o1
    assert math.isclose(r.e1_q / (1 << 20), e1, abs_tol=1e-4), (
        r.e1_q / (1 << 20),
        e1,
    )
    assert math.isclose(r.v_q / (1 << 10), v, abs_tol=0.2), (
        r.v_q / (1 << 10),
        v,
    )
    if chi2 is None or v < 2.0:
        # below ~2 the 2^-10 V grid's worst-case quantization (≤ ~0.08
        # absolute over ≤26 death times) is no longer small RELATIVE
        # to V, so the ratio comparison would flag pure staging noise
        return
    assert math.isclose(
        r.logrank_chi2_e6 / 1e6, chi2, rel_tol=0.06, abs_tol=0.05
    ), (r.logrank_chi2_e6 / 1e6, chi2)


# --------------------------------------------------------------- cuped


def _arm(uid: int) -> str:
    return "A" if _h32(f"ab1:{uid}") % 2 == 0 else "B"


def _cuped_py(users: dict[int, tuple[int, int]]):
    """Textbook CUPED on floats: θ = cov(x,y)/var(x) (population
    covariances), adjusted mean_y per arm = ȳ_arm − θ(x̄_arm − x̄)."""
    xs = [x for x, _ in users.values()]
    ys = [y for _, y in users.values()]
    n = len(xs)
    mx = sum(xs) / n
    my = sum(ys) / n
    cov = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / n
    var = sum((x - mx) ** 2 for x in xs) / n
    theta = cov / var
    out = {}
    for arm in ("A", "B"):
        sel = [(x, y) for u, (x, y) in users.items() if _arm(u) == arm]
        if not sel:
            continue
        ax = sum(x for x, _ in sel) / len(sel)
        ay = sum(y for _, y in sel) / len(sel)
        out[arm] = (len(sel), ay, ay - theta * (ax - mx))
    return theta, out


@given(
    profile=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),  # pre-period events
            st.integers(min_value=0, max_value=4),  # post purchases
        ),
        min_size=4,
        max_size=20,
    )
)
@settings(**_SETTINGS)
def test_cuped_matches_textbook(spark, profile, tmp_path_factory):
    """User u gets x 'view's on day 0 and y 'purchase's on day 10 plus
    one anchoring day-10 'view' (so every user exists post-period and
    the corpus midpoint falls on day 5, cleanly between periods)."""
    users = {u: xy for u, xy in enumerate(profile)}
    users[0] = (users[0][0] + 1, users[0][1])
    assume(len({x for x, _ in users.values()}) > 1)
    day10 = 10 * 24 * 60 * _US_PER_MIN
    rows = [(0, 0, "view", 1.0)]  # pins min(ts) at 0 exactly
    for u, (x, y) in users.items():
        extra = 1 if u == 0 else 0  # row above already gave u=0 one x
        for j in range(x - extra):
            rows.append(((j + 1) * _US_PER_MIN, u, "view", 1.0))
        for j in range(y):
            rows.append((day10 + j * _US_PER_MIN, u, "purchase", 1.0))
        rows.append((day10 + 30 * _US_PER_MIN, u, "view", 1.0))
    sf = _write_events_us(str(tmp_path_factory.mktemp("cuped")), rows)
    got = {
        r.arm: r
        for r in QUERIES["ev_cuped_adjusted_lift"]
        .spark_fn(spark, sf)
        .collect()
    }
    theta, exp = _cuped_py(users)
    assert set(got) == set(exp)
    for arm, (n_users, mean_y, adj) in exp.items():
        assert got[arm].n_users == n_users
        assert math.isclose(got[arm].mean_y, mean_y, rel_tol=1e-9)
        assert math.isclose(
            got[arm].adj_mean_y, adj, rel_tol=1e-9, abs_tol=1e-12
        ), (arm, got[arm].adj_mean_y, adj)


def test_cuped_null_lift_unbiased(spark, tmp_path):
    """Identical (x, y) profiles in both arms → adjusted lift exactly
    zero: CUPED must never manufacture a lift on a truly-null
    experiment (the estimator's core guarantee, checked on VALUES,
    not staging)."""
    ua = [u for u in range(200) if _arm(u) == "A"][:6]
    ub = [u for u in range(200) if _arm(u) == "B"][:6]
    profile = [(1, 0), (2, 1), (3, 2), (4, 0), (5, 3), (6, 1)]
    users = {}
    for us in (ua, ub):
        for u, xy in zip(us, profile):
            users[u] = xy
    day10 = 10 * 24 * 60 * _US_PER_MIN
    rows = []
    for u, (x, y) in users.items():
        for j in range(x):
            rows.append((j * _US_PER_MIN, u, "view", 1.0))
        for j in range(y):
            rows.append((day10 + j * _US_PER_MIN, u, "purchase", 1.0))
        rows.append((day10 + 30 * _US_PER_MIN, u, "view", 1.0))
    sf = _write_events_us(str(tmp_path), rows)
    got = {
        r.arm: r
        for r in QUERIES["ev_cuped_adjusted_lift"]
        .spark_fn(spark, sf)
        .collect()
    }
    assert math.isclose(
        got["A"].adj_mean_y, got["B"].adj_mean_y, abs_tol=1e-12
    )


# ------------------------------------------------------------------ ks


def _ks_py(docs: list[tuple[str, int]]):
    """Textbook per-source-vs-rest two-sample KS via exact Fractions."""
    out = {}
    values = sorted({n for _, n in docs})
    for src in {s for s, _ in docs}:
        a = sorted(n for s, n in docs if s == src)
        b = sorted(n for s, n in docs if s != src)
        if not a or not b:
            continue
        d = Fraction(0)
        for v in values:
            fa = Fraction(sum(1 for x in a if x <= v), len(a))
            fb = Fraction(sum(1 for x in b if x <= v), len(b))
            d = max(d, abs(fa - fb))
        out[src] = (len(a), len(b), d)
    return out


@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["s1", "s2", "s3"]),
            st.integers(min_value=10, max_value=40),
        ),
        min_size=4,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_ks_matches_textbook(spark, docs, tmp_path_factory):
    assume(len({s for s, _ in docs}) >= 2)
    sf = _write_documents_nchars(
        str(tmp_path_factory.mktemp("ks")), docs
    )
    got = {
        r.source: r
        for r in QUERIES["dq_ks_two_sample"].spark_fn(spark, sf).collect()
    }
    exp = _ks_py(docs)
    assert set(got) == set(exp)
    for src, (n_s, n_rest, d) in exp.items():
        r = got[src]
        assert (r.n_s, r.n_rest) == (n_s, n_rest)
        # d_num/(n_s*n_rest) IS the exact KS statistic
        assert Fraction(r.d_num, n_s * n_rest) == d, (src, r.d_num, d)
        assert math.isclose(r.ks_stat, float(d), rel_tol=1e-12)


# -------------------------------------------------------- mann-kendall


def _mk_py(series: list[int]):
    """Textbook Mann-Kendall: S over ordered pairs, tie-corrected
    variance, continuity-corrected z."""
    n = len(series)
    s = sum(
        (1 if series[j] > series[i] else -1 if series[j] < series[i] else 0)
        for i in range(n)
        for j in range(i + 1, n)
    )
    ties: dict[int, int] = {}
    for v in series:
        ties[v] = ties.get(v, 0) + 1
    var = (
        n * (n - 1) * (2 * n + 5)
        - sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
    ) / 18.0
    if var <= 0:
        return s, None
    if s > 0:
        z = (s - 1) / math.sqrt(var)
    elif s < 0:
        z = (s + 1) / math.sqrt(var)
    else:
        z = 0.0
    return s, z


@given(
    series=st.lists(
        st.integers(min_value=1, max_value=8), min_size=10, max_size=24
    )
)
@settings(**_SETTINGS)
def test_mann_kendall_matches_textbook(spark, series, tmp_path_factory):
    """Station 7 logs one event per day with value v_t (integer, so
    the daily y = round(sum(value)) is exactly v_t)."""
    rows = [
        (day * 24 * 60 * _US_PER_MIN, 7, "view", float(v))
        for day, v in enumerate(series)
    ]
    sf = _write_events_us(str(tmp_path_factory.mktemp("mk")), rows)
    out = QUERIES["agro_mann_kendall"].spark_fn(spark, sf).collect()
    s, z = _mk_py(series)
    if z is None:
        assert out == []
        return
    assert len(out) == 1
    r = out[0]
    assert (r.station_id, r.n_days, r.s_stat) == (7, len(series), s)
    assert math.isclose(r.z_score, z, rel_tol=1e-12, abs_tol=1e-15)
    exp_trend = (
        "increasing" if z > 1.96 else "decreasing" if z < -1.96 else "none"
    )
    assert r.trend == exp_trend


# ----------------------------------------------------------------- ipw


def _t_exp(uid: int) -> int:
    return _h32(f"exp:{uid}") % 2


def _ipw_py(users: dict[int, tuple[int, int]]):
    """Textbook stratified IPW ATE on floats: strata = min(9, n//5),
    strata lacking an arm dropped, ATE = Σ n_s(ȳ1_s − ȳ0_s) / Σ n_s."""
    strata: dict[int, list[tuple[int, int]]] = {}
    for u, (n_ev, y) in users.items():
        strata.setdefault(min(9, n_ev // 5), []).append((_t_exp(u), y))
    num = den = 0.0
    kept = {}
    for s, rows in strata.items():
        y1 = [y for t, y in rows if t == 1]
        y0 = [y for t, y in rows if t == 0]
        if not y1 or not y0:
            continue
        n_s = len(rows)
        term = n_s * (sum(y1) / len(y1) - sum(y0) / len(y0))
        kept[s] = (n_s, term)
        num += term
        den += n_s
    ate = num / den if den else None
    return kept, ate


@given(
    profile=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=20),  # events
            st.integers(min_value=0, max_value=3),   # purchases
        ),
        min_size=6,
        max_size=24,
    )
)
@settings(**_SETTINGS)
def test_ipw_matches_textbook(spark, profile, tmp_path_factory):
    users = {
        u: (n_ev, min(y, n_ev)) for u, (n_ev, y) in enumerate(profile)
    }
    rows = []
    for u, (n_ev, y) in users.items():
        for j in range(n_ev):
            rows.append(
                (
                    j * _US_PER_MIN,
                    u,
                    "purchase" if j < y else "view",
                    1.0,
                )
            )
    sf = _write_events_us(str(tmp_path_factory.mktemp("ipw")), rows)
    out = QUERIES["ev_ipw_ate"].spark_fn(spark, sf).collect()
    kept, ate = _ipw_py(users)
    if not kept:
        return  # positivity dropped everything; only the NULL row rides
    got = {r.stratum: r for r in out}
    assert set(got) == set(kept) | ({-1} if kept else set())
    for s, (n_s, term) in kept.items():
        assert got[s].n == n_s
        assert math.isclose(
            got[s].term_q / (1 << 20), term, abs_tol=1e-4
        ), (s, got[s].term_q / (1 << 20), term)
    if ate is not None:
        assert math.isclose(
            got[-1].term_q / (1 << 20), ate, abs_tol=1e-4
        ), (got[-1].term_q / (1 << 20), ate)


# ----------------------------------------------------------------- eb


@given(
    cohorts=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=30),  # events
            st.integers(min_value=0, max_value=30),  # purchases (capped)
        ),
        min_size=2,
        max_size=8,
    )
)
@settings(**_SETTINGS)
def test_eb_shrinkage_matches_textbook(spark, cohorts, tmp_path_factory):
    """Textbook beta-binomial posterior mean with m=200 pseudo-counts
    at the pooled rate: shrunk = (x + m·p̂)/(n + m); w = n/(n+m).
    User u carries cohort u's whole load (u < 20 → cohort = u)."""
    data = {u: (n, min(x, n)) for u, (n, x) in enumerate(cohorts)}
    rows = []
    for u, (n, x) in data.items():
        for j in range(n):
            rows.append(
                (j * _US_PER_MIN, u, "purchase" if j < x else "view", 1.0)
            )
    sf = _write_events_us(str(tmp_path_factory.mktemp("eb")), rows)
    out = {
        r.cohort: r
        for r in QUERIES["ev_eb_shrinkage"].spark_fn(spark, sf).collect()
    }
    nn = sum(n for n, _ in data.values())
    xx = sum(x for _, x in data.values())
    p_hat = xx / nn
    assert set(out) == set(data)
    for u, (n, x) in data.items():
        r = out[u]
        assert (r.n, r.x) == (n, x)
        shrunk = (x + 200 * p_hat) / (n + 200)
        w = n / (n + 200)
        assert math.isclose(r.shrunk_e6 / 1e6, shrunk, abs_tol=2e-6), (
            u,
            r.shrunk_e6 / 1e6,
            shrunk,
        )
        assert math.isclose(r.w_e6 / 1e6, w, abs_tol=2e-6)
        # shrinkage is BETWEEN the raw rate and the pooled rate
        lo, hi = sorted((x / n, p_hat))
        assert lo - 2e-6 <= shrunk <= hi + 2e-6

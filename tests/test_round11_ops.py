"""Round-11 wave-2 statistics: Welch's t, Ljung-Box, Cochran-Armitage,
MATTR. Each gets (a) a HAND FIXTURE with a closed-form textbook answer
and (b) a pure-Python differential independent of the shipped staging —
the mirrored-bug discipline (the oracle gate cannot see a math error
mirrored onto both engines; these can).
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
    """(day_offset, user_id, event_type, value) rows → events.parquet."""
    table = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array(
                [
                    _T0 + datetime.timedelta(days=day, hours=1)
                    for day, *_ in rows
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


def _write_orders(d: str, rows: list[tuple]) -> str:
    """(priority_digit, status) rows → orders.parquet."""
    table = pa.table(
        {
            "o_orderkey": pa.array(range(len(rows)), pa.int64()),
            "o_custkey": pa.array([1] * len(rows), pa.int64()),
            "o_orderstatus": pa.array(
                [s for _, s in rows], pa.string()
            ),
            "o_totalprice": pa.array([100.0] * len(rows), pa.float64()),
            "o_orderdate": pa.array(
                [_T0] * len(rows), pa.timestamp("us")
            ),
            "o_orderpriority": pa.array(
                [f"{p}-X" for p, _ in rows], pa.string()
            ),
        }
    )
    pq.write_table(table, os.path.join(d, "orders.parquet"))
    return d


def _write_documents(d: str, docs: list[tuple]) -> str:
    """(source, text) rows → documents.parquet."""
    table = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array([t for _, t in docs], pa.string()),
            "lang": pa.array(["en"] * len(docs), pa.string()),
            "source": pa.array([s for s, _ in docs], pa.string()),
            "n_chars": pa.array(
                [len(t) for _, t in docs], pa.int64()
            ),
        }
    )
    pq.write_table(table, os.path.join(d, "documents.parquet"))
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


# --------------------------------------------------------------- welch


def _welch_py(xs_a: list[int], xs_b: list[int]):
    """Textbook Welch t + Satterthwaite df on plain floats — no shared
    staging with the shipped decimal/HUGEINT readout."""
    ma = sum(xs_a) / len(xs_a)
    mb = sum(xs_b) / len(xs_b)
    va = sum((x - ma) ** 2 for x in xs_a) / (len(xs_a) - 1)
    vb = sum((x - mb) ** 2 for x in xs_b) / (len(xs_b) - 1)
    sa, sb = va / len(xs_a), vb / len(xs_b)
    t = (ma - mb) / math.sqrt(sa + sb)
    df = (sa + sb) ** 2 / (
        sa**2 / (len(xs_a) - 1) + sb**2 / (len(xs_b) - 1)
    )
    return t, df


def test_welch_hand_fixture(spark, tmp_path):
    """A = {1,2,3,4,5}, B = {2,4,6,8,10,12} cents. mean_A = 3,
    var_A = 2.5, mean_B = 7, var_B = 14: t = (3-7)/sqrt(0.5 + 7/3)
    = -4/sqrt(17/6), df = (17/6)^2 / (0.25/4 + (7/3)^2/5) — closed
    form, independently rederived here from the raw definition."""
    ua = _users_by_arm("A", 5)
    ub = _users_by_arm("B", 6)
    rows = [(0, u, "view", v / 100.0) for u, v in zip(ua, [1, 2, 3, 4, 5])]
    rows += [
        (0, u, "view", v / 100.0)
        for u, v in zip(ub, [2, 4, 6, 8, 10, 12])
    ]
    sf = _write_events(str(tmp_path), rows)
    out = QUERIES["ev_welch_ttest"].spark_fn(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_a, r.n_b) == (5, 6)
    assert math.isclose(r.mean_a_cents, 3.0)
    assert math.isclose(r.mean_b_cents, 7.0)
    t_exp = -4.0 / math.sqrt(17.0 / 6.0)
    df_exp = (17.0 / 6.0) ** 2 / (
        (0.5) ** 2 / 4.0 + (7.0 / 3.0) ** 2 / 5.0
    )
    assert math.isclose(r.t_welch, t_exp, rel_tol=1e-12), r.t_welch
    assert math.isclose(r.df_welch, df_exp, rel_tol=1e-12), r.df_welch


def test_welch_degenerate_reads_null(spark, tmp_path):
    """n < 2 in an arm, or two zero-variance arms → NULL t/df (the
    r10 NULL-not-Inf contract); the means still read."""
    ua = _users_by_arm("A", 3)
    ub = _users_by_arm("B", 1)
    rows = [(0, u, "view", 0.05) for u in ua] + [
        (0, ub[0], "view", 0.09)
    ]
    sf = _write_events(str(tmp_path), rows)
    r = QUERIES["ev_welch_ttest"].spark_fn(spark, sf).collect()[0]
    assert (r.n_a, r.n_b) == (3, 1)
    assert r.t_welch is None and r.df_welch is None
    assert math.isclose(r.mean_a_cents, 5.0)
    # both arms constant (zero pooled SE) → NULL too
    ub = _users_by_arm("B", 2)
    rows = [(0, u, "view", 0.05) for u in ua] + [
        (0, u, "view", 0.09) for u in ub
    ]
    d2 = tmp_path / "w2"
    d2.mkdir()
    sf = _write_events(str(d2), rows)
    r = QUERIES["ev_welch_ttest"].spark_fn(spark, sf).collect()[0]
    assert r.t_welch is None and r.df_welch is None


@given(
    xa=st.lists(
        st.integers(min_value=0, max_value=500), min_size=2, max_size=12
    ),
    xb=st.lists(
        st.integers(min_value=0, max_value=500), min_size=2, max_size=12
    ),
)
@settings(**_SETTINGS)
def test_welch_matches_python(spark, xa, xb, tmp_path_factory):
    assume(len(set(xa)) > 1 or len(set(xb)) > 1)
    ua = _users_by_arm("A", len(xa))
    ub = _users_by_arm("B", len(xb))
    rows = [(0, u, "view", v / 100.0) for u, v in zip(ua, xa)]
    rows += [(0, u, "view", v / 100.0) for u, v in zip(ub, xb)]
    sf = _write_events(str(tmp_path_factory.mktemp("welch")), rows)
    r = QUERIES["ev_welch_ttest"].spark_fn(spark, sf).collect()[0]
    t_exp, df_exp = _welch_py(xa, xb)
    assert math.isclose(r.t_welch, t_exp, rel_tol=1e-9), (r.t_welch, t_exp)
    assert math.isclose(r.df_welch, df_exp, rel_tol=1e-9)


# ----------------------------------------------------------- ljung-box


def _ljung_box_py(xs: list[int], max_lag: int = 7):
    """Textbook Ljung-Box on plain floats: float mean centering, float
    autocorrelations — independent of the n-scaled integer grid."""
    n = len(xs)
    mean = sum(xs) / n
    d = [x - mean for x in xs]
    den = sum(v * v for v in d)
    out = {}
    q = 0.0
    for k in range(1, max_lag + 1):
        if k >= n:
            break
        r = sum(d[t] * d[t + k] for t in range(n - k)) / den
        q += n * (n + 2) * r * r / (n - k)
        out[k] = (r, q)
    return out


def test_ljung_box_alternating_fixture(spark, tmp_path):
    """Alternating daily volumes 10,20,10,20,... over n=10 days:
    deviations alternate ±5, so r_k = (-1)^k (n-k)/n EXACTLY —
    closed form straight from the definition (every product
    d_t*d_{t+k} is (-1)^k * 25, den = 250)."""
    xs = [10, 20] * 5
    rows = []
    uid = 0
    for day, c in enumerate(xs):
        for _ in range(c):
            rows.append((day, uid, "view", 1.0))
            uid += 1
    sf = _write_events(str(tmp_path), rows)
    out = {
        r.lag_k: r
        for r in QUERIES["dq_ljung_box"].spark_fn(spark, sf).collect()
    }
    assert set(out) == set(range(1, 8))
    for k in range(1, 8):
        exp = ((-1) ** k) * (10 - k) / 10.0
        assert math.isclose(out[k].r_k, exp, rel_tol=1e-12), (k, out[k].r_k)
        assert out[k].n == 10


def test_ljung_box_constant_series_null(spark, tmp_path):
    """A constant series has zero deviation mass (den = 0) — every
    r_k and q_cum must read NULL, never NaN/Inf."""
    rows = []
    uid = 0
    for day in range(9):
        for _ in range(7):
            rows.append((day, uid, "view", 1.0))
            uid += 1
    sf = _write_events(str(tmp_path), rows)
    out = QUERIES["dq_ljung_box"].spark_fn(spark, sf).collect()
    assert len(out) == 7
    assert all(r.r_k is None and r.q_cum is None for r in out)


@given(
    xs=st.lists(
        st.integers(min_value=1, max_value=40), min_size=3, max_size=20
    )
)
@settings(**_SETTINGS)
def test_ljung_box_matches_python(spark, xs, tmp_path_factory):
    assume(len(set(xs)) > 1)
    rows = []
    uid = 0
    for day, c in enumerate(xs):
        for _ in range(c):
            rows.append((day, uid, "view", 1.0))
            uid += 1
    sf = _write_events(str(tmp_path_factory.mktemp("lb")), rows)
    got = {
        r.lag_k: (r.r_k, r.q_cum)
        for r in QUERIES["dq_ljung_box"].spark_fn(spark, sf).collect()
    }
    exp = _ljung_box_py(xs)
    assert set(got) == set(exp)
    for k, (r_e, q_e) in exp.items():
        assert math.isclose(got[k][0], r_e, rel_tol=1e-9, abs_tol=1e-12)
        assert math.isclose(got[k][1], q_e, rel_tol=1e-9, abs_tol=1e-12)


# ---------------------------------------------------- cochran-armitage


def _ca_py(groups: dict[int, tuple[int, int]]):
    """Textbook Cochran-Armitage Z^2 on plain floats (scores = doses):
    independent float rederivation of the trend statistic."""
    n = sum(ni for ni, _ in groups.values())
    r = sum(ri for _, ri in groups.values())
    if r == 0 or r == n:
        return None
    sn = sum(s * ni for s, (ni, _) in groups.items())
    s2n = sum(s * s * ni for s, (ni, _) in groups.items())
    sr = sum(s * ri for s, (_, ri) in groups.items())
    den_var = n * s2n - sn * sn
    if den_var == 0:
        return None
    t = n * sr - r * sn
    return (n * t * t) / (r * (n - r) * den_var)


def test_cochran_armitage_hand_fixture(spark, tmp_path):
    """Five doses, 10 trials each, successes 1,2,3,4,5 — a perfect
    linear trend. N=50, R=15, Σsn=150, Σs²n=550, Σsr=55:
    T = 50*55 - 15*150 = 500, Z² = 50*500² / (15*35*(50*550-150²))
    = 12500000/2625000 = 100/21 — closed form by hand."""
    rows = []
    for dose in range(1, 6):
        rows += [(dose, "F")] * dose + [(dose, "O")] * (10 - dose)
    sf = _write_orders(str(tmp_path), rows)
    out = QUERIES["dq_cochran_armitage"].spark_fn(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.k, r.n, r.r) == (5, 50, 15)
    assert (r.sum_sn, r.sum_s2n, r.sum_sr) == (150, 550, 55)
    assert math.isclose(r.z2_trend, 100.0 / 21.0, rel_tol=1e-12)


def test_cochran_armitage_degenerate_null(spark, tmp_path):
    """All-success and single-dose inputs read NULL, never Inf."""
    sf = _write_orders(str(tmp_path), [(d, "F") for d in (1, 2, 3)] * 4)
    r = QUERIES["dq_cochran_armitage"].spark_fn(spark, sf).collect()[0]
    assert r.z2_trend is None and r.r == r.n
    d2 = tmp_path / "ca2"
    d2.mkdir()
    sf = _write_orders(str(d2), [(3, "F")] * 4 + [(3, "O")] * 6)
    r = QUERIES["dq_cochran_armitage"].spark_fn(spark, sf).collect()[0]
    assert r.k == 1 and r.z2_trend is None


@given(
    cells=st.dictionaries(
        st.integers(min_value=1, max_value=5),
        st.tuples(
            st.integers(min_value=1, max_value=20),
            st.integers(min_value=0, max_value=20),
        ),
        min_size=1,
        max_size=5,
    )
)
@settings(**_SETTINGS)
def test_cochran_armitage_matches_python(spark, cells, tmp_path_factory):
    groups = {s: (ni, min(ri, ni)) for s, (ni, ri) in cells.items()}
    rows = []
    for dose, (ni, ri) in groups.items():
        rows += [(dose, "F")] * ri + [(dose, "O")] * (ni - ri)
    sf = _write_orders(str(tmp_path_factory.mktemp("ca")), rows)
    r = QUERIES["dq_cochran_armitage"].spark_fn(spark, sf).collect()[0]
    exp = _ca_py(groups)
    if exp is None:
        assert r.z2_trend is None
    else:
        assert math.isclose(r.z2_trend, exp, rel_tol=1e-9), (
            r.z2_trend,
            exp,
        )


# ----------------------------------------------------------------- mattr


def _mattr_py(tokens: list[str], w: int = 20):
    """Brute-force MATTR: materialize every window, count distinct
    types directly — the O(L*w) definition the closed-form
    contribution plan must reproduce exactly on the e6 grid."""
    n_win = len(tokens) - w + 1
    if n_win < 1:
        return None
    total = sum(
        len(set(tokens[s : s + w])) for s in range(n_win)
    )
    return total * 1000000 // (n_win * w)


def test_mattr_hand_fixtures(spark, tmp_path):
    """A 25-token all-distinct doc reads exactly 1e6; a 25-token
    single-type doc reads exactly 1e6/20 = 50000; a 19-token doc has
    no complete window and drops out of its source's n_docs."""
    docs = [
        ("uniq", " ".join(f"t{i}" for i in range(25))),
        ("mono", " ".join(["x"] * 25)),
        ("short", " ".join(f"s{i}" for i in range(19))),
    ]
    sf = _write_documents(str(tmp_path), docs)
    out = {
        r.source: r
        for r in QUERIES["ts_mattr"].spark_fn(spark, sf).collect()
    }
    assert set(out) == {"uniq", "mono"}
    assert out["uniq"].mattr_e6_avg == 1000000
    assert out["mono"].mattr_e6_avg == 50000
    assert out["uniq"].n_docs == 1 and out["mono"].n_docs == 1


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d", "e"]),
            min_size=20,
            max_size=45,
        ),
        min_size=1,
        max_size=4,
    )
)
@settings(**_SETTINGS)
def test_mattr_matches_bruteforce(spark, docs, tmp_path_factory):
    rows = [(f"s{i}", " ".join(toks)) for i, toks in enumerate(docs)]
    sf = _write_documents(str(tmp_path_factory.mktemp("mattr")), rows)
    out = {
        r.source: r
        for r in QUERIES["ts_mattr"].spark_fn(spark, sf).collect()
    }
    for i, toks in enumerate(docs):
        exp = _mattr_py(toks)
        got = out[f"s{i}"]
        assert got.n_docs == 1
        assert got.mattr_e6_avg == exp, (toks, got.mattr_e6_avg, exp)
        assert got.mattr_e6_min == exp and got.mattr_e6_max == exp


def test_bpe_state_need_merges_equivalence(spark):
    """The r11 job-count optimization (need_merges=False skips the
    per-round winner checkpoint) must not change the final encoded
    state: same (freq, syms) rows either way, and the merges frame is
    None exactly when skipped."""
    from automated_agro_climatic_data_warehouse_spark.operators.bpe import (
        bpe_train_state,
    )

    freqs = {"abab": 3, "aaaa": 2, "abc": 5, "bc": 4, "a": 7}
    words = spark.createDataFrame(list(freqs.items()), "w string, freq long")
    merges, state_ck = bpe_train_state(words, 3)
    none_merges, state_lazy = bpe_train_state(words, 3, need_merges=False)
    assert merges is not None
    assert none_merges is None
    a = sorted((r.freq, tuple(r.syms)) for r in state_ck.collect())
    b = sorted((r.freq, tuple(r.syms)) for r in state_lazy.collect())
    assert a == b

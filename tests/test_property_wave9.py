"""Differential property tests for the wave-9-11 shared operators —
hypothesis drives random corpora/vectors against pure-Python replicas,
beyond the fixed-testdata pins: PPJoin losslessness at a looser τ
(more candidate traffic than the corpus pin exercises), CMS linearity
(the exact property the streaming merge relies on), winnowing recall
on small-alphabet strings (repeated k-grams force the rightmost-min
tie-break), skyline dominance, and Hamilton quota invariants."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # multi-minute suite: excluded from the default (driver) tier

import collections
import itertools

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


# --- PPJoin: lossless at τ = 1/2 on random small sets ----------------

_VOCAB = [f"t{i}" for i in range(12)]
_SETS = st.lists(
    st.sets(st.sampled_from(_VOCAB), min_size=1, max_size=6),
    min_size=2,
    max_size=8,
)


@settings(**_SETTINGS)
@given(_SETS)
def test_ppjoin_lossless_random_sets(spark, sets):
    from automated_agro_climatic_data_warehouse_spark.operators.dedup import ppjoin_pairs

    rows = [(i, t) for i, s in enumerate(sets) for t in s]
    tok = spark.createDataFrame(rows, "doc_id long, token string")
    got = {
        (r.da, r.db): r.j_e4
        for r in ppjoin_pairs(tok, tau_num=1, tau_den=2).collect()
    }
    expected = {}
    for (ia, sa), (ib, sb) in itertools.combinations(enumerate(sets), 2):
        i = len(sa & sb)
        u = len(sa | sb)
        # exact threshold as the operator states it: (tn+td)*i >= tn*(sa+sb)
        if 3 * i >= 1 * (len(sa) + len(sb)):
            expected[(ia, ib)] = (10000 * i) // u
    assert got == expected


# --- CMS linearity: cells(a ++ b) == cellwise_sum(cells(a), cells(b)) -

_KEYS = st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=40)


@settings(**_SETTINGS)
@given(_KEYS, _KEYS)
def test_cms_cells_are_linear(spark, a, b):
    from automated_agro_climatic_data_warehouse_spark.operators.sketches import cms_cells

    def cells(keys):
        df = spark.createDataFrame([(k,) for k in keys], "user_id long")
        return {
            (r.j, r.bucket): r.cell
            for r in cms_cells(df, F.col("user_id")).collect()
        }
    ca, cb, cab = cells(a), cells(b), cells(a + b)
    merged = collections.Counter()
    for d in (ca, cb):
        for k, v in d.items():
            merged[k] += v
    assert dict(merged) == cab


# --- Winnowing: shared >= k+w-1 substring => shared fingerprint ------

_AB = st.text(alphabet="ab", min_size=0, max_size=12)
_SHARED = st.text(alphabet="abc", min_size=11, max_size=16)


@settings(**_SETTINGS)
@given(_AB, _AB, _SHARED, _AB)
def test_winnowing_recall_random_strings(spark, pre1, pre2, shared, suf):
    """Small alphabet => repeated k-grams => hash ties inside windows;
    the rightmost-min encoding must still select a common fingerprint
    from the shared run."""
    from automated_agro_climatic_data_warehouse_spark.operators.sketches import (
        winnowing_selected,
    )

    docs = spark.createDataFrame(
        [(1, pre1 + shared + suf), (2, pre2 + shared)],
        "doc_id long, text string",
    )
    sel = (
        winnowing_selected(docs, "doc_id", F.col("text"))
        .select("doc_id", F.expr("k div 65536").alias("fp"))
        .collect()
    )
    fps = collections.defaultdict(set)
    for r in sel:
        fps[r.doc_id].add(r.fp)
    assert fps[1] & fps[2]


# --- Skyline: two-window plan == brute-force dominance ---------------

_PTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=1),   # partition
        st.integers(min_value=0, max_value=6),   # x (minimize)
        st.integers(min_value=0, max_value=6),   # y (maximize)
    ),
    min_size=1,
    max_size=16,
)


@settings(**_SETTINGS)
@given(_PTS)
def test_skyline_matches_bruteforce_random(spark, pts):
    from automated_agro_climatic_data_warehouse_spark.operators.ranking import (
        pareto_skyline_2d,
    )

    df = spark.createDataFrame(
        [(i, g, x, y) for i, (g, x, y) in enumerate(pts)],
        "row_id long, grp long, x long, y long",
    )
    got = {r.row_id for r in pareto_skyline_2d(df, "grp", "x", "y").collect()}
    expected = set()
    for i, (g, x, y) in enumerate(pts):
        dominated = any(
            g2 == g and x2 <= x and y2 >= y and (x2 < x or y2 > y)
            for j, (g2, x2, y2) in enumerate(pts)
        )
        if not dominated:
            expected.add(i)
    assert got == expected


# --- Hamilton quota: exact sum, base/base+1, replica equality --------

_CNTS = st.lists(st.integers(min_value=1, max_value=50), min_size=1, max_size=8)


@settings(**_SETTINGS)
@given(_CNTS, st.integers(min_value=1, max_value=100))
def test_quota_invariants_random(spark, cnts, budget):
    from automated_agro_climatic_data_warehouse_spark.operators.ranking import (
        largest_remainder_quota,
    )

    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cnts)], "src long, cnt long"
    )
    got = {
        r.src: (r.base_quota, r.quota)
        for r in largest_remainder_quota(df, "src", "cnt", budget).collect()
    }
    total = sum(cnts)
    base = {i: budget * c // total for i, c in enumerate(cnts)}
    rems = {i: budget * c % total for i, c in enumerate(cnts)}
    k = budget - sum(base.values())
    order = sorted(range(len(cnts)), key=lambda i: (-rems[i], i))
    bonus = set(order[:k])
    expected = {
        i: (base[i], base[i] + (1 if i in bonus else 0))
        for i in range(len(cnts))
    }
    assert got == expected
    assert sum(q for _, q in got.values()) == budget


# --- CMS inner product upper-bounds the exact join size ---------------

_CNT_VECS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=25),  # key
        st.integers(min_value=1, max_value=9),   # count R
        st.integers(min_value=0, max_value=9),   # count S (0 = absent)
    ),
    min_size=1,
    max_size=20,
    unique_by=lambda t: t[0],
)


@settings(**_SETTINGS)
@given(_CNT_VECS)
def test_cms_inner_product_upper_bounds_join_size(spark, rows):
    from automated_agro_climatic_data_warehouse_spark.operators.sketches import cms_cells

    exact = sum(cr * cs for _, cr, cs in rows)
    r = spark.createDataFrame(
        [(k, cr) for k, cr, _ in rows], "user_id long, c long"
    )
    s_rows = [(k, cs) for k, _, cs in rows if cs > 0]
    if not s_rows:
        return
    s = spark.createDataFrame(s_rows, "user_id long, c long")
    rc = {
        (x.j, x.bucket): x.cell
        for x in cms_cells(r, F.col("user_id"), weight="c").collect()
    }
    sc = {
        (x.j, x.bucket): x.cell
        for x in cms_cells(s, F.col("user_id"), weight="c").collect()
    }
    dots = collections.Counter()
    for (j, b), v in rc.items():
        if (j, b) in sc:
            dots[j] += v * sc[(j, b)]
    bound = min(dots[j] for j in range(4))
    assert bound >= exact

"""Differential property tests for the round-7 exact decompositions —
hypothesis drives adversarial series/tie/degenerate patterns against
pure Python replicas (beyond the fixed-testdata oracle gate).
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # multi-minute suite: excluded from the default (driver) tier

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


# ---------------------------------------------------------------- Theil-Sen
_SERIES = st.lists(
    st.integers(min_value=1, max_value=50), min_size=2, max_size=12
)


def _theil_sen_py(counts):
    """Median of pairwise slopes over consecutive integer days, the
    query's exact selection rule (middle element(s) by rank)."""
    n = len(counts)
    slopes = sorted(
        (counts[j] - counts[i]) / (j - i)
        for i in range(n)
        for j in range(i + 1, n)
    )
    m = len(slopes)
    # odd m: both ranks coincide and the average is the middle value,
    # matching the query's sum/count over the (possibly 1-row) middle
    return round(
        (slopes[(m + 1) // 2 - 1] + slopes[(m + 2) // 2 - 1]) / 2 * 1_000_000
    )


def _theil_sen_spark(spark, counts):
    daily = spark.createDataFrame(
        [("t", f"2024-01-{d + 1:02d}", c) for d, c in enumerate(counts)],
        "event_type string, day string, c long",
    ).select("event_type", F.col("day").cast("date").alias("day"), "c")
    b = daily.select(
        F.col("event_type").alias("b_type"),
        F.col("day").alias("b_day"),
        F.col("c").alias("b_c"),
    )
    pairs = daily.join(
        b,
        (F.col("event_type") == F.col("b_type"))
        & (F.col("b_day") > F.col("day")),
    ).select(
        "event_type",
        (
            (F.col("b_c") - F.col("c")).cast("double")
            / F.datediff("b_day", "day").cast("bigint")
        ).alias("slope"),
    )
    wr = W.partitionBy("event_type").orderBy("slope")
    wm = W.partitionBy("event_type")
    ranked = pairs.select(
        "event_type",
        "slope",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wm).alias("m"),
    )
    row = (
        ranked.filter(
            (F.col("rn") == F.expr("(m + 1) div 2"))
            | (F.col("rn") == F.expr("(m + 2) div 2"))
        )
        .groupBy("event_type")
        .agg(
            F.expr(
                "cast(round(sum(slope) / count(*) * 1000000) as bigint)"
            ).alias("slope_e6")
        )
        .collect()
    )
    return row[0].slope_e6


@settings(**_SETTINGS)
@given(_SERIES)
def test_theil_sen_matches_python_median_of_slopes(spark, counts):
    """The rank-selected middle element(s) must equal Python's sorted
    median of all pairwise slopes, ties and even/odd counts included."""
    assert _theil_sen_spark(spark, counts) == _theil_sen_py(counts)


# ------------------------------------------------------------------ Lorenz
_USER_COUNTS = st.lists(
    st.integers(min_value=1, max_value=9), min_size=1, max_size=25
)


def _lorenz_py(user_counts):
    """Brute-force Lorenz points: sort users ascending by count, take
    exact bottom-u_p prefixes (ties interchangeable — prefix sums over
    the sorted multiset are tie-invariant)."""
    s = sorted(user_counts)
    n, total = len(s), sum(s)
    out = {}
    prefix = [0]
    for c in s:
        prefix.append(prefix[-1] + c)
    for p in range(10, 101, 10):
        u_p = (p * n) // 100
        out[p] = (u_p, prefix[u_p], (10000 * prefix[u_p]) // total)
    return out


def _lorenz_spark(spark, user_counts):
    peru = spark.createDataFrame(
        [(i, c) for i, c in enumerate(user_counts)], "user_id long, c long"
    )
    hist = peru.groupBy("c").agg(
        F.count(F.lit(1)).cast("bigint").alias("u"),
        (F.col("c") * F.count(F.lit(1))).cast("bigint").alias("e"),
    )
    wc = W.orderBy("c").rowsBetween(W.unboundedPreceding, W.currentRow)
    ecdf = hist.select(
        "c",
        F.sum("u").over(wc).cast("bigint").alias("cum_u"),
        F.sum("e").over(wc).cast("bigint").alias("cum_e"),
    )
    tot = hist.groupBy().agg(
        F.sum("u").cast("bigint").alias("big_n"),
        F.sum("e").cast("bigint").alias("big_e"),
    )
    spine = (
        spark.range(1, 11)
        .select((F.col("id") * 10).cast("bigint").alias("p"))
        .crossJoin(F.broadcast(tot))
        .select(
            "p",
            F.expr("cast((p * big_n) div 100 as bigint)").alias("u_p"),
            "big_e",
        )
    )
    picked = (
        spine.join(ecdf, F.col("cum_u") >= F.col("u_p"))
        .groupBy("p", "u_p", "big_e")
        .agg(
            F.min("cum_u").alias("cum_u"),
            F.min_by("c", "cum_u").alias("c"),
            F.min_by("cum_e", "cum_u").alias("cum_e"),
        )
    )
    rows = picked.select(
        "p",
        "u_p",
        F.expr("cast(cum_e - (cum_u - u_p) * c as bigint)").alias("eb"),
        F.expr(
            "cast((10000 * (cum_e - (cum_u - u_p) * c)) div big_e"
            " as bigint)"
        ).alias("share_e4"),
    ).collect()
    return {r.p: (r.u_p, r.eb, r.share_e4) for r in rows}


@settings(**_SETTINGS)
@given(_USER_COUNTS)
def test_lorenz_histogram_ecdf_matches_bruteforce_sort(spark, user_counts):
    """The histogram-ECDF partial-cell formula must equal the naive
    sorted-prefix computation on arbitrary tie structure."""
    assert _lorenz_spark(spark, user_counts) == _lorenz_py(user_counts)


# ------------------------------------------------------- Markov stationary
_TRANSITIONS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),
        st.integers(min_value=0, max_value=2),
    ),
    min_size=1,
    max_size=15,
)


def _stationary_py(pairs, rounds=8):
    from collections import Counter

    n = Counter(pairs)
    n_src = Counter(s for s, _ in pairs)
    states = sorted(n_src)
    t_e6 = {
        (s, d): (1_000_000 * n[(s, d)]) // n_src[s]
        for (s, d) in n
    }
    pi = {s: 10**12 // len(states) for s in states}
    for _ in range(rounds):
        nxt: dict[int, int] = {}
        for (s, d), t in t_e6.items():
            if s in pi:
                nxt[d] = nxt.get(d, 0) + (pi[s] * t) // 1_000_000
        pi = nxt
    return pi


def _stationary_spark(spark, pairs, rounds=8):
    pair = spark.createDataFrame(pairs, "src long, dst long")
    tot = pair.groupBy("src").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_src")
    )
    tm = (
        pair.groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
        .join(F.broadcast(tot), "src")
        .select(
            "src",
            "dst",
            F.expr("cast((1000000 * n) div n_src as bigint)").alias("t_e6"),
        )
        .localCheckpoint(eager=True)
    )
    states = tm.select(F.col("src").alias("state")).distinct()
    ns = states.groupBy().agg(F.count(F.lit(1)).cast("bigint").alias("s"))
    pi = states.crossJoin(F.broadcast(ns)).select(
        "state", F.expr("cast(1000000000000 div s as bigint)").alias("p")
    )
    for _ in range(rounds):
        contrib = tm.join(
            pi.withColumnRenamed("state", "src"), "src"
        ).select(
            "dst",
            F.expr("(p * t_e6) div 1000000").cast("bigint").alias("w"),
        )
        pi = contrib.groupBy(F.col("dst").alias("state")).agg(
            F.sum("w").cast("bigint").alias("p")
        )
    return {r.state: r.p for r in pi.collect()}


@settings(**_SETTINGS)
@given(_TRANSITIONS)
def test_markov_stationary_matches_python_replica(spark, pairs):
    """8 integer-grid power-iteration rounds must be bit-identical to
    the sequential Python replay — including chains with absorbing-ish
    states (dst never a src) whose mass legitimately drops."""
    assert _stationary_spark(spark, pairs) == _stationary_py(pairs)


# -------------------------------------------------------------- Adamic-Adar
_EDGES = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=6),
        st.integers(min_value=0, max_value=6),
    ).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=12,
)


def _aa_py(edge_list):
    adj: dict[int, set[int]] = {}
    for a, b in edge_list:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = {}
    nodes = sorted(adj)
    for i, u in enumerate(nodes):
        for v in nodes[i + 1:]:
            if v in adj[u]:
                continue
            common = adj[u] & adj[v]
            if not common:
                continue
            aa_q = sum(
                round((1 << 20) / math.log(len(adj[z]))) for z in common
            )
            out[(u, v)] = (len(common), aa_q)
    return out


def _aa_spark(spark, edge_list):
    pairs = spark.createDataFrame(
        sorted({(min(a, b), max(a, b)) for a, b in edge_list}),
        "doc_a long, doc_b long",
    )
    edges = (
        pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        .union(
            pairs.select(F.col("doc_b").alias("a"), F.col("doc_a").alias("b"))
        )
        .distinct()
    )
    deg = edges.groupBy(F.col("a").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    wdeg = deg.filter(F.col("d") >= 2).select(
        "node",
        F.expr(
            "cast(round(1048576.0 / ln(cast(d as double))) as bigint)"
        ).alias("wq"),
    )
    e1 = edges.select(F.col("a").alias("u"), F.col("b").alias("via"))
    e2 = edges.select(F.col("a").alias("via"), F.col("b").alias("v"))
    two_hop = (
        e1.join(e2, "via")
        .join(wdeg.withColumnRenamed("node", "via"), "via")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cn"),
            F.sum("wq").cast("bigint").alias("aa_q"),
        )
    )
    nonedge = two_hop.join(
        edges,
        (two_hop["u"] == edges["a"]) & (two_hop["v"] == edges["b"]),
        "left_anti",
    )
    return {
        (r.u, r.v): (r.cn, r.aa_q) for r in nonedge.collect()
    }


@settings(**_SETTINGS)
@given(_EDGES)
def test_adamic_adar_matches_python_replica(spark, edge_list):
    """The 2-hop join + grid-weight sum must equal the set-based Python
    AA score on arbitrary small graphs. Degree-1 intermediates cannot
    occur (a common neighbor touches both endpoints), so the d >= 2
    weight frame is lossless."""
    assert _aa_spark(spark, edge_list) == _aa_py(edge_list)


# ---------------------------------------------------------------- KM curve
_SUBJECTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=6),  # duration
        st.booleans(),  # censored
    ),
    min_size=1,
    max_size=30,
)


def _km_py(subjects):
    """Plain-Python KM on the identical ln-grid contract: per-step
    lnq = round(ln(n-d)*2^20) - round(ln(n)*2^20), integer cumsum,
    exp + e6 rounding; S pinned to 0 after a full-churn step."""
    from collections import Counter

    G = 1 << 20
    leaving = Counter(d for d, _ in subjects)
    churn = Counter(d for d, c in subjects if not c)
    cens = Counter(d for d, c in subjects if c)
    durs = sorted(leaving)
    n_risk, out, cum, hit_zero = {}, {}, 0, False
    remaining = len(subjects)
    for d in durs:
        n_risk[d] = remaining
        remaining -= leaving[d]
    for d in durs:
        n, dd = n_risk[d], churn[d]
        if dd == 0:
            lnq = 0
        elif dd == n:
            hit_zero = True
            lnq = None
        else:
            lnq = round(math.log(n - dd) * G) - round(math.log(n) * G)
        if lnq is not None and not hit_zero:
            cum += lnq
        s = 0 if hit_zero else round(math.exp(cum / G) * 1_000_000)
        out[d] = (n, dd, cens[d], s)
        if hit_zero:
            # once zero, stays zero for all later durations
            cum = None
    return out


def _km_spark(spark, subjects):
    subj = spark.createDataFrame(
        [(d, 1 if c else 0) for d, c in subjects],
        "dur long, censored int",
    )
    byd = subj.groupBy("dur").agg(
        F.count(F.lit(1)).cast("bigint").alias("leaving"),
        F.sum(F.lit(1) - F.col("censored")).cast("bigint").alias("churned"),
        F.sum("censored").cast("bigint").alias("censored_n"),
    )
    wrev = W.orderBy(F.desc("dur")).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    risk = byd.select(
        "dur",
        "churned",
        "censored_n",
        F.sum("leaving").over(wrev).cast("bigint").alias("n_risk"),
    )
    lnleg = risk.select(
        "dur",
        "churned",
        "censored_n",
        "n_risk",
        F.expr(
            "case when churned = 0 then cast(0 as bigint)"
            " when churned = n_risk then null"
            " else cast(round(ln(cast(n_risk - churned as double))"
            " * 1048576) as bigint)"
            " - cast(round(ln(cast(n_risk as double)) * 1048576)"
            " as bigint) end"
        ).alias("lnq"),
    )
    wfwd = W.orderBy("dur").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = lnleg.select(
        "dur",
        "churned",
        "censored_n",
        "n_risk",
        F.sum("lnq").over(wfwd).alias("cum_lnq"),
        F.sum(F.when(F.col("lnq").isNull(), 1).otherwise(0))
        .over(wfwd)
        .cast("bigint")
        .alias("hit_zero"),
    )
    rows = cum.select(
        "dur",
        "n_risk",
        "churned",
        "censored_n",
        F.expr(
            "cast(case when hit_zero > 0 then 0"
            " else round(exp(cast(cum_lnq as double) / 1048576)"
            " * 1000000) end as bigint)"
        ).alias("surv_e6"),
    ).collect()
    return {
        r.dur: (r.n_risk, r.churned, r.censored_n, r.surv_e6)
        for r in rows
    }


@settings(**_SETTINGS)
@given(_SUBJECTS)
def test_km_matches_python_replica(spark, subjects):
    """The histogram + two-window KM decomposition must equal the
    sequential Python replay on adversarial tie/censoring mixes —
    including full-churn steps that pin the curve to zero."""
    assert _km_spark(spark, subjects) == _km_py(subjects)

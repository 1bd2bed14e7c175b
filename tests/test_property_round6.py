"""Differential property tests for the round-6 exact decompositions —
hypothesis drives adversarial group/size/tie patterns against pure
Python replicas (beyond what the fixed-testdata oracle gate covers)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from automated_agro_climatic_data_warehouse_spark.operators.ranking import interleave_rank

# (group 0-3, value with heavy tie probability)
_ROW = st.tuples(
    st.integers(min_value=0, max_value=3),
    st.integers(min_value=0, max_value=4),
)
_ROWS = st.lists(_ROW, min_size=1, max_size=20)


def _interleave_py(rows):
    """Naive replica: leg = 1-based rank within group by (value, id);
    global rank = position in sort by (leg, group)."""
    legs = {}
    per_group: dict[int, list[tuple[int, int]]] = {}
    for i, (g, v) in enumerate(rows):
        per_group.setdefault(g, []).append((v, i))
    for g, items in per_group.items():
        for leg, (v, i) in enumerate(sorted(items), 1):
            legs[i] = leg
    order = sorted(range(len(rows)), key=lambda i: (legs[i], rows[i][0]))
    return {i: (legs[i], pos + 1) for pos, i in enumerate(order)}


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(_ROWS)
def test_interleave_rank_matches_naive_global_sort(spark, rows):
    """The distributed interleave decomposition must equal the naive
    whole-frame (leg, group) sort on arbitrary group-size imbalance
    and value ties (ids disambiguate)."""
    df = spark.createDataFrame(
        [(i, g, v) for i, (g, v) in enumerate(rows)],
        "row_id long, grp long, val long",
    )
    got = {
        r.row_id: (r.leg, r.interleave_rank)
        for r in interleave_rank(
            df, group_col="grp", order_cols=["val", "row_id"]
        ).collect()
    }
    assert got == _interleave_py(rows)


def _ks_py(rows):
    """Exact per-group-vs-rest KS numerators on the union value grid."""
    from collections import Counter

    n_total = len(rows)
    groups = sorted({g for g, _ in rows})
    values = sorted({v for _, v in rows})
    out = {}
    for g in groups:
        n_s = sum(1 for gg, _ in rows if gg == g)
        n_r = n_total - n_s
        cnt_s = Counter(v for gg, v in rows if gg == g)
        cnt_all = Counter(v for _, v in rows)
        cum_s = cum_all = 0
        best = 0
        for v in values:
            cum_s += cnt_s.get(v, 0)
            cum_all += cnt_all.get(v, 0)
            best = max(best, abs(cum_s * n_r - (cum_all - cum_s) * n_s))
        out[g] = (n_s, n_r, best)
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),
            st.integers(min_value=0, max_value=5),
        ),
        min_size=2,
        max_size=20,
    )
)
def test_ks_two_sample_matches_python_replica(spark, rows):
    """The union-grid ECDF KS plan (replicated over a synthetic frame
    with the same frame algebra as dq_ks_two_sample) must equal the
    sequential exact sup for every group, including groups whose
    complement is empty-valued at some grid points."""
    if len({g for g, _ in rows}) < 2:
        return
    from pyspark.sql import Window as W

    docs = spark.createDataFrame(rows, "source long, n_chars long")
    total = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    vals = docs.select("n_chars").distinct()
    srcs = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_s")
    )
    cnt = docs.groupBy("source", "n_chars").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    grid = (
        srcs.crossJoin(vals)
        .join(cnt, ["source", "n_chars"], "left")
        .select(
            "source", "n_s", "n_chars", F.coalesce("c", F.lit(0)).alias("c")
        )
    )
    tot = grid.groupBy("n_chars").agg(F.sum("c").cast("bigint").alias("call"))
    w = W.partitionBy("source").orderBy("n_chars")
    ecdf = grid.join(tot, "n_chars").select(
        "source",
        "n_s",
        F.sum("c").over(w).cast("bigint").alias("cum_s"),
        F.sum("call").over(w).cast("bigint").alias("cum_all"),
    )
    stat = (
        ecdf.crossJoin(F.broadcast(total))
        .groupBy("source", "n_s", "n_total")
        .agg(
            F.max(
                F.abs(
                    F.col("cum_s") * (F.col("n_total") - F.col("n_s"))
                    - (F.col("cum_all") - F.col("cum_s")) * F.col("n_s")
                )
            )
            .cast("bigint")
            .alias("d_num")
        )
    )
    got = {
        r.source: (r.n_s, r.n_total - r.n_s, r.d_num)
        for r in stat.collect()
    }
    assert got == _ks_py(rows)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(_ROWS)
def test_interleave_rank_multi_bucket_offsets(spark, rows):
    """Same differential, but with leg_bucket_rows=2 so the coarse-bucket
    cumsum actually forms MULTIPLE buckets and the O(buckets²)
    offset self-join contributes — the branch the default 65536-row
    bucket size never exercises at test scale."""
    df = spark.createDataFrame(
        [(i, g, v) for i, (g, v) in enumerate(rows)],
        "row_id long, grp long, val long",
    )
    got = {
        r.row_id: (r.leg, r.interleave_rank)
        for r in interleave_rank(
            df,
            group_col="grp",
            order_cols=["val", "row_id"],
            leg_bucket_rows=2,
        ).collect()
    }
    assert got == _interleave_py(rows)

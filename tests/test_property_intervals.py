"""Differential property test: the ev_merge_intervals island plan vs a
direct per-key interval-union reference.

Hypothesis drives random (key, start, length) layouts — including
touching endpoints, exact duplicates, nested intervals, and single-row
keys — and the windowed running-max island formulation must produce
exactly the merged interval set of an imperative sweep. Touching
intervals (next.start == current.end) MERGE (the strict `>` contract).

Few, small examples (each runs a Spark job); the value is hypothesis'
adversarial layouts, not volume.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

_KEYS = st.integers(min_value=0, max_value=2)
_START = st.integers(min_value=0, max_value=30)
_LEN = st.integers(min_value=1, max_value=8)

_ROWS = st.lists(st.tuples(_KEYS, _START, _LEN), min_size=1, max_size=14)


def _reference(rows):
    """Imperative sweep: per key, sort by start, merge while
    next.start <= current.end (touching merges)."""
    out = set()
    by_key: dict[int, list[tuple[int, int]]] = {}
    for k, s, ln in rows:
        by_key.setdefault(k, []).append((s, s + ln))
    for k, iv in by_key.items():
        iv.sort()
        cur_s, cur_e, n = iv[0][0], iv[0][1], 1
        for s, e in iv[1:]:
            if s > cur_e:
                out.add((k, cur_s, cur_e, n))
                cur_s, cur_e, n = s, e, 1
            else:
                cur_e = max(cur_e, e)
                n += 1
        out.add((k, cur_s, cur_e, n))
    return out


def _spark_merge(spark, rows):
    """The ev_merge_intervals plan shape on integer endpoints, with a
    row_number tiebreak standing in for event_id."""
    df = spark.createDataFrame(
        [(k, s, s + ln) for k, s, ln in rows], "k int, s int, e int"
    )
    df = df.withColumn(
        "rid", F.row_number().over(W.orderBy("k", "s", "e"))
    )
    wprev = (
        W.partitionBy("k")
        .orderBy("s", "rid")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    flagged = df.select(
        "k",
        "s",
        "e",
        "rid",
        F.when(F.col("s") > F.max("e").over(wprev), 1)
        .otherwise(0)
        .alias("ni"),
    )
    wcum = (
        W.partitionBy("k")
        .orderBy("s", "rid")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    islands = flagged.select(
        "k", "s", "e", F.sum("ni").over(wcum).alias("island")
    )
    got = (
        islands.groupBy("k", "island")
        .agg(
            F.min("s").alias("ms"),
            F.max("e").alias("me"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    return {(r.k, r.ms, r.me, r.n) for r in got}


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(_ROWS)
def test_interval_union_matches_sweep(spark, rows):
    assert _spark_merge(spark, rows) == _reference(rows)

"""Wave-9 operator guarantees: PPJoin losslessness, Count-Min bounds,
winnowing density + shared-substring recall, Mann-Kendall statistic
definition. Driver parity is the gate's job; these pin the THEOREMS
each docstring claims."""

from __future__ import annotations

import collections
import itertools

import pytest
from pyspark.sql import functions as F

from automated_agro_climatic_data_warehouse_spark.plans import QUERIES
from automated_agro_climatic_data_warehouse_spark.sources import load_table


def _token_sets(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.array_distinct(
                F.split(F.lower(F.col("text")), "\\s+")
            ).alias("toks"),
        )
        .collect()
    )
    return {r.doc_id: frozenset(r.toks) for r in rows}


def _true_pairs(sets, tau_num=19, tau_den=20):
    """Brute-force exact Jaccard >= tau_num/tau_den pairs (da < db)."""
    out = {}
    for (da, sa), (db, sb) in itertools.combinations(sorted(sets.items()), 2):
        i = len(sa & sb)
        # J >= 0.95  <=>  39*i >= 19*(|a|+|b|)
        if 39 * i >= 19 * (len(sa) + len(sb)):
            out[(da, db)] = (10000 * i) // (len(sa) + len(sb) - i)
    return out


def test_ppjoin_matches_bruteforce(spark, sf_dir):
    """The prefix+length+positional filtered plan must reproduce the
    brute-force pair set exactly (losslessness of all three prunes),
    via the per-da summary it emits."""
    sets = _token_sets(spark, sf_dir)
    truth = _true_pairs(sets)
    by_da = collections.defaultdict(list)
    for (da, db), j in truth.items():
        by_da[da].append((j, db))
    expected = {}
    for da, lst in by_da.items():
        mx = max(j for j, _ in lst)
        expected[da] = (
            len(lst),
            mx,
            min(db for j, db in lst if j == mx),
        )
    got = {
        r.da: (r.n_pairs, r.max_j_e4, r.best_db)
        for r in QUERIES["dedup_ppjoin_prefix"]
        .spark_fn(spark, sf_dir)
        .collect()
    }
    assert got == expected


def test_cms_never_undercounts(spark, sf_dir):
    """CMS guarantee: the estimate is a cell-sum that INCLUDES the key's
    own count, so overcount >= 0 for every key — checked over the full
    key space, not just the emitted top-20, by rebuilding the sketch
    plan without the top-k gate."""
    from automated_agro_climatic_data_warehouse_spark.operators.dedup import hash32

    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_cnt")
    )
    depths = spark.range(4).select(F.col("id").cast("int").alias("j"))
    bucketed = per_user.crossJoin(F.broadcast(depths)).select(
        "j",
        "user_id",
        "exact_cnt",
        (
            hash32(
                F.concat(
                    F.lit("cms"),
                    F.col("j").cast("string"),
                    F.lit(":"),
                    F.col("user_id").cast("string"),
                )
            )
            % 512
        ).alias("bucket"),
    )
    cells = bucketed.groupBy("j", "bucket").agg(
        F.sum("exact_cnt").cast("bigint").alias("cell")
    )
    est = (
        bucketed.join(F.broadcast(cells), ["j", "bucket"])
        .groupBy("user_id")
        .agg(F.min("cell").alias("cms_est"))
    )
    bad = (
        per_user.join(est, "user_id")
        .filter(F.col("cms_est") < F.col("exact_cnt"))
        .count()
    )
    assert bad == 0
    # and the emitted query agrees with this plan on the top-20
    out = {r.user_id: r.cms_est for r in
           QUERIES["ev_cms_user_counts"].spark_fn(spark, sf_dir).collect()}
    full = {r.user_id: r.cms_est for r in est.collect()}
    assert all(full[u] == c for u, c in out.items())
    assert len(out) == min(20, len(full))


def test_winnowing_density_near_theory(spark, sf_dir):
    """Expected selected-fingerprint density is 2/(w+1) = 0.4 for w=4
    on random hashes; pin the corpus-wide average within a generous
    band (the guarantee is an expectation, not per-doc)."""
    out = QUERIES["ts_winnowing_fingerprint"].spark_fn(spark, sf_dir)
    agg = out.agg(
        F.sum("n_selected").alias("sel"), F.sum("n_kgrams").alias("kg")
    ).collect()[0]
    density = agg.sel / agg.kg
    assert 0.30 <= density <= 0.50, density


def test_winnowing_shared_substring_guarantee(spark):
    """The winnowing theorem: docs sharing a substring of length
    >= k + w - 1 = 11 chars share at least one selected fingerprint.
    Built on the SAME operator the registered query uses
    (operators/sketches.winnowing_selected) so the pin cannot drift
    from the shipped algorithm."""
    from automated_agro_climatic_data_warehouse_spark.operators.sketches import (
        winnowing_selected,
    )

    common = "zqxjkvwpyhgfdsam"  # 16 chars, ~9 shared k-gram positions
    docs = spark.createDataFrame(
        [
            (1, "aaaa bbbb " + common + " cccc dddd"),
            (2, "eeee ffff gggg " + common + " hhhh"),
        ],
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
    assert fps[1] & fps[2], "shared 16-char substring must share a fingerprint"


def test_mann_kendall_matches_bruteforce(spark, sf_dir):
    """S, tie-corrected variance, and z must equal an independent pure-
    Python computation of the textbook definitions."""
    import math

    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.col("user_id").alias("station_id"),
            F.col("ts").cast("date").alias("day"),
        )
        .agg(
            F.round(F.sum(F.col("value").cast("decimal(28,6)")), 0)
            .cast("bigint")
            .alias("y")
        )
        .collect()
    )
    series = collections.defaultdict(list)
    for r in daily:
        series[r.station_id].append((r.day, r.y))
    expected = {}
    for sid, pts in series.items():
        pts.sort()
        ys = [y for _, y in pts]
        n = len(ys)
        if n < 10:
            continue
        s = sum(
            (0 if ys[j] == ys[i] else (1 if ys[j] > ys[i] else -1))
            for i in range(n)
            for j in range(i + 1, n)
        )
        ties = collections.Counter(ys)
        var18 = n * (n - 1) * (2 * n + 5) - sum(
            t * (t - 1) * (2 * t + 5) for t in ties.values()
        )
        if var18 <= 0:
            continue
        denom = math.sqrt(var18 / 18.0)
        z = (s - 1) / denom if s > 0 else ((s + 1) / denom if s < 0 else 0.0)
        expected[sid] = (n, s, var18, pytest.approx(z))
    got = {
        r.station_id: (r.n_days, r.s_stat, r.var18, r.z_score)
        for r in QUERIES["agro_mann_kendall"].spark_fn(spark, sf_dir).collect()
    }
    assert got == expected
    assert expected, "fixture must produce at least one station"

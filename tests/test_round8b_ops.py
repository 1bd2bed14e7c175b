"""Round-8 second wave: k-anonymity ladder, exact changepoint
(differential vs brute force), SCD2 rebuild invariants + consistency
with the changelog apply, JL distortion concentration, and the
Kneser-Ney vs add-one model-quality pin.
"""

from __future__ import annotations

import numpy as np

from automated_agro_climatic_data_warehouse_spark.plans import QUERIES


def test_k_anonymity_generalization_ladder(spark, sf_dir):
    """Generalizing a QI attribute away can only merge groups: group
    count shrinks, suppressed row mass shrinks, and the achieved k
    (min group size) is non-decreasing up the ladder."""
    rows = {
        r.gen_level: r
        for r in QUERIES["dq_k_anonymity"].spark_fn(spark, sf_dir).collect()
    }
    assert set(rows) == {0, 1, 2}
    for lo, hi in ((0, 1), (1, 2)):
        assert rows[hi].n_groups <= rows[lo].n_groups
        assert rows[hi].n_small_groups <= rows[lo].n_small_groups
        assert rows[hi].n_rows_suppressed <= rows[lo].n_rows_suppressed
        assert rows[hi].k_anonymity >= rows[lo].k_anonymity
    # suppressed rows live in groups smaller than k=5
    for r in rows.values():
        assert r.n_rows_suppressed <= 4 * r.n_small_groups


def test_changepoint_matches_bruteforce(spark, sf_dir):
    """Differential: the windowed argmax equals an explicit numpy scan
    over every candidate split of the daily-count series, per type."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    daily = (
        ev.groupBy("event_type", spark_to_date("ts"))
        .count()
        .collect()
    )
    series: dict[str, list] = {}
    for r in daily:
        series.setdefault(r.event_type, []).append((r[1], r["count"]))
    got = {
        r.event_type: r
        for r in QUERIES["ev_changepoint_argmax"].spark_fn(spark, sf_dir).collect()
    }
    assert set(got) == set(series)
    for et, pts in series.items():
        pts.sort()
        y = np.array([c for _, c in pts], dtype=np.int64)
        days = [d for d, _ in pts]
        best = None
        for t in range(1, len(y)):
            s1, n1 = int(y[:t].sum()), t
            s2, n2 = int(y[t:].sum()), len(y) - t
            obj = (s1 * s1 * n2 + s2 * s2 * n1) / (n1 * n2)
            if best is None or obj > best[0]:
                best = (obj, days[t - 1], s1, n1, s2, n2)
        r = got[et]
        assert (r.cp_day, r.s1, r.n1, r.s2, r.n2) == best[1:]


def spark_to_date(col):
    from pyspark.sql import functions as F

    return F.to_date(col).alias("day")


def test_scd2_rebuild_invariants_and_apply_consistency(spark, sf_dir):
    """Per key: intervals tile [0, last) with no gaps/overlaps, at most
    one current version; and the current rows reproduce EXACTLY the
    table cdc_apply_changelog materializes from the same changelog —
    the rebuild and the apply are two routes to one truth."""
    hist = QUERIES["cdc_scd2_rebuild"].spark_fn(spark, sf_dir).collect()
    by_key: dict[int, list] = {}
    for r in hist:
        by_key.setdefault(r.o_orderkey, []).append(r)
    n_current = 0
    for k, versions in by_key.items():
        versions.sort(key=lambda r: r.valid_from)
        opens = [v for v in versions if v.valid_to is None]
        assert len(opens) <= 1, k
        n_current += len(opens)
        for a, b in zip(versions, versions[1:]):
            # closed before (or exactly when) the successor opens; a
            # delete between them shows up as a gap, never an overlap
            assert a.valid_to is not None and a.valid_to <= b.valid_from, k
        assert all(
            (v.is_current == 1) == (v.valid_to is None) for v in versions
        )
    applied = QUERIES["cdc_apply_changelog"].spark_fn(spark, sf_dir).collect()
    assert n_current == len(applied)
    cur = {
        (r.o_orderkey, r.o_totalprice)
        for r in hist
        if r.is_current == 1
    }
    app = {(r.o_orderkey, r.o_totalprice) for r in applied}
    assert cur == app


def test_jl_distortion_concentrates_near_one(spark, sf_dir):
    """JL lemma, measured: shares are a distribution, and at least half
    the sampled pair mass sits within ±50% of the ideal ratio 1 (bins
    5–14 of the 0.1-wide histogram) at k=16."""
    rows = QUERIES["emb_jl_projection_audit"].spark_fn(spark, sf_dir).collect()
    total = sum(r.share for r in rows)
    assert abs(total - 1.0) < 1e-9
    near = sum(r.share for r in rows if 5 <= r.bin <= 14)
    assert near >= 0.5
    assert sum(r.n_pairs for r in rows) > 0


def test_kneser_ney_beats_add_one_at_corpus_level(spark, sf_dir):
    """The model-quality claim: summed over the corpus, the KN-smoothed
    bigram NLL is strictly below the add-one baseline's (absolute
    discounting + continuation mass beats uniform +1 over-smoothing).
    Per-source reversals are allowed — the pin is the corpus total."""
    rows = QUERIES["ts_kneser_ney_bigram"].spark_fn(spark, sf_dir).collect()
    assert sum(r.qsum_kn for r in rows) < sum(r.qsum_add1 for r in rows)
    for r in rows:
        assert r.n_bigrams > 0
        assert 0.0 < r.avg_nll_kn < 20.0

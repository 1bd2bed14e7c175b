"""Wave-10 operator guarantees: Bloom no-false-negatives, compaction
bin contiguity + assignment rule, Heaps-curve monotonicity and
endpoint exactness."""

from __future__ import annotations

import collections

from pyspark.sql import functions as F

from automated_agro_climatic_data_warehouse_spark.plans import QUERIES
from automated_agro_climatic_data_warehouse_spark.sources import load_table


def test_bloom_no_false_negatives(spark, sf_dir):
    """Every MEMBER key must probe positive (all BLOOM_DEPTH of its bit
    positions set) — the Bloom guarantee the audit query's probe side
    cannot see because it only probes non-members. Built on the SAME
    operator the query uses (operators/sketches.bloom_positions) so the
    pin cannot drift from the shipped filter geometry."""
    from automated_agro_climatic_data_warehouse_spark.operators.sketches import (
        BLOOM_BITS,
        BLOOM_DEPTH,
        bloom_positions,
    )

    ev = load_table(spark, sf_dir, "events")
    members = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
    )
    pos = bloom_positions(members, F.col("user_id"))
    bits = pos.select("bit").distinct().withColumn("set1", F.lit(1))
    neg = (
        pos.join(F.broadcast(bits), "bit", "left")
        .groupBy("key")
        .agg(F.count("set1").alias("n_set"))
        .filter(F.col("n_set") < BLOOM_DEPTH)
        .count()
    )
    assert neg == 0
    # and the audit's totals are self-consistent
    row = QUERIES["ev_bloom_fpr_audit"].spark_fn(spark, sf_dir).collect()[0]
    assert 0 <= row.n_false_pos <= row.n_probes
    assert row.n_bits_set <= min(BLOOM_BITS, BLOOM_DEPTH * row.n_members)


def test_compaction_bins_contiguous_and_rule_exact(spark, sf_dir):
    """Recompute the exclusive-cumsum bin rule in Python from the same
    fragment frame and require identical bin assignment; bins within an
    event_type must cover disjoint, ascending day ranges."""
    ev = load_table(spark, sf_dir, "events")
    frags = (
        ev.groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(
            (64 * F.count(F.lit(1)) + F.sum(F.length("props")))
            .cast("bigint")
            .alias("bytes")
        )
        .collect()
    )
    per_type = collections.defaultdict(list)
    for r in frags:
        per_type[r.event_type].append((r.day, r.bytes))
    expected = collections.defaultdict(
        lambda: [0, 0, None, None]
    )  # (et, bin) -> [n, bytes, lo, hi]
    for et, lst in per_type.items():
        lst.sort()
        cum = 0
        for day, b in lst:
            bin_id = cum // 1048576
            cum += b
            e = expected[(et, bin_id)]
            e[0] += 1
            e[1] += b
            e[2] = day if e[2] is None else min(e[2], day)
            e[3] = day if e[3] is None else max(e[3], day)
    got = {
        (r.event_type, r.bin_id): [r.n_files, r.bin_bytes, r.day_lo, r.day_hi]
        for r in QUERIES["layout_compaction_planner"]
        .spark_fn(spark, sf_dir)
        .collect()
    }
    assert got == {k: list(v) for k, v in expected.items()}
    # contiguity: consecutive bins of one event_type never overlap days
    by_et = collections.defaultdict(list)
    for (et, b), (_, _, lo, hi) in got.items():
        by_et[et].append((b, lo, hi))
    for et, bins in by_et.items():
        bins.sort()
        for (b1, _, hi1), (b2, lo2, _) in zip(bins, bins[1:]):
            assert hi1 < lo2, (et, b1, b2)


def test_heaps_curve_monotone_and_exact_endpoints(spark, sf_dir):
    out = (
        QUERIES["ts_vocab_growth_heaps"]
        .spark_fn(spark, sf_dir)
        .orderBy("cp_k")
        .collect()
    )
    assert [r.cp_k for r in out] == list(range(1, 11))
    for a, b in zip(out, out[1:]):
        assert a.vocab_cum <= b.vocab_cum
        assert a.n_docs_cum <= b.n_docs_cum
        assert a.tokens_cum <= b.tokens_cum
    docs = load_table(spark, sf_dir, "documents")
    total_docs = docs.count()
    total_vocab = (
        docs.select(
            F.explode(
                F.array_distinct(F.split(F.lower(F.col("text")), "\\s+"))
            ).alias("t")
        )
        .select("t")
        .distinct()
        .count()
    )
    assert out[-1].n_docs_cum == total_docs
    assert out[-1].vocab_cum == total_vocab


def test_pareto_skyline_matches_bruteforce(spark, sf_dir):
    """The two-window skyline must equal the all-pairs dominance
    definition exactly: every emitted point non-dominated, every
    omitted point dominated."""
    pts = (
        load_table(spark, sf_dir, "part")
        .select(
            "p_brand",
            "p_partkey",
            (F.col("p_retailprice").cast("decimal(12,2)") * 100)
            .cast("bigint")
            .alias("price_c"),
            F.col("p_size").cast("bigint").alias("size"),
        )
        .collect()
    )
    by_brand = collections.defaultdict(list)
    for r in pts:
        by_brand[r.p_brand].append((r.p_partkey, r.price_c, r.size))
    expected = set()
    for brand, rows in by_brand.items():
        for pk, pc, sz in rows:
            dominated = any(
                (pc2 <= pc and sz2 >= sz and (pc2 < pc or sz2 > sz))
                for _, pc2, sz2 in rows
            )
            if not dominated:
                expected.add((brand, pk))
    got = {
        (r.p_brand, r.p_partkey)
        for r in QUERIES["j17_pareto_skyline"].spark_fn(spark, sf_dir).collect()
    }
    assert got == expected


def test_quota_sums_exactly_and_tracks_share(spark, sf_dir):
    """Hamilton apportionment invariants: quotas are integers summing
    EXACTLY to the budget, and each quota is within 1 of the
    real-valued proportional share."""
    out = (
        QUERIES["sample_quota_largest_remainder"]
        .spark_fn(spark, sf_dir)
        .collect()
    )
    budget = 10000
    total = sum(r.cnt for r in out)
    assert sum(r.quota for r in out) == budget
    for r in out:
        share = budget * r.cnt / total
        assert r.quota in (r.base_quota, r.base_quota + 1)
        assert abs(r.quota - share) < 1


def test_watermark_lateness_matches_replay(spark, sf_dir):
    """The per-user cummax lateness buckets must equal a pure-Python
    replay of arrival order."""
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_id", F.unix_micros("ts").alias("ts_us"))
        .collect()
    )
    per_user = collections.defaultdict(list)
    for r in ev:
        per_user[r.user_id].append((r.event_id, r.ts_us))
    buckets = collections.Counter()
    max_late = collections.defaultdict(int)
    for rows in per_user.values():
        rows.sort()
        hwm = None
        for _, ts in rows:
            hwm = ts if hwm is None else max(hwm, ts)
            late = hwm - ts
            b = (
                "a_in_order" if late == 0
                else "b_lt_1h" if late <= 3_600_000_000
                else "c_lt_6h" if late <= 21_600_000_000
                else "d_lt_24h" if late <= 86_400_000_000
                else "e_ge_24h"
            )
            buckets[b] += 1
            max_late[b] = max(max_late[b], late)
    got = {
        r.bucket: (r.n_events, r.max_late_us)
        for r in QUERIES["dq_watermark_lateness"].spark_fn(spark, sf_dir).collect()
    }
    assert got == {b: (n, max_late[b]) for b, n in buckets.items()}


def test_join_size_bound_holds_on_corpus(spark, sf_dir):
    row = QUERIES["dq_join_size_estimate"].spark_fn(spark, sf_dir).collect()[0]
    assert row.overestimate >= 0
    assert row.cms_upper_bound >= row.exact_rows


def test_systematic_pps_telescopes_to_quota(spark, sf_dir):
    """Per-source Σ multiplicity must equal the Hamilton quota exactly
    (the telescoping series), the global sum must equal the budget, and
    every multiplicity must be within 1 of the real PPS share q·w/W."""
    from automated_agro_climatic_data_warehouse_spark.operators.ranking import (
        largest_remainder_quota,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.col("n_chars").cast("bigint").alias("w")
    )
    src = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum("w").cast("bigint").alias("wtot"),
    )
    quotas = {
        r.source: r.quota
        for r in largest_remainder_quota(src, "source", "cnt", 1000).collect()
    }
    wtots = {r.source: r.wtot for r in src.collect()}
    out = QUERIES["sample_systematic_pps"].spark_fn(spark, sf_dir).collect()
    per_src = collections.Counter()
    for r in out:
        per_src[r.source] += r.multiplicity
        share = quotas[r.source] * r.w / wtots[r.source]
        assert abs(r.multiplicity - share) <= 1
    assert dict(per_src) == {s: q for s, q in quotas.items() if q > 0}
    assert sum(per_src.values()) == 1000


def test_cuped_preserves_pooled_mean_and_matches_replay(spark, sf_dir):
    """CUPED invariants: the user-weighted pooled adjusted mean equals
    the pooled raw mean (the adjustment is mean-zero by construction),
    and theta/means match a pure-Python replay of the definitions."""
    out = {
        r.arm: r
        for r in QUERIES["ev_cuped_adjusted_lift"].spark_fn(spark, sf_dir).collect()
    }
    assert set(out) == {"A", "B"}
    n = sum(r.n_users for r in out.values())
    pooled_raw = sum(r.sum_y for r in out.values()) / n
    pooled_adj = sum(r.adj_mean_y * r.n_users for r in out.values()) / n
    assert abs(pooled_adj - pooled_raw) < 1e-9
    # replay theta from the same per-user frame
    from automated_agro_climatic_data_warehouse_spark.operators.dedup import hash32

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("ts_us"), "event_type"
    ).collect()
    mn = min(r.ts_us for r in ev)
    mx = max(r.ts_us for r in ev)
    mid = (mn + mx) // 2
    xs = collections.Counter()
    ys = collections.Counter()
    users = set()
    for r in ev:
        users.add(r.user_id)
        if r.ts_us < mid:
            xs[r.user_id] += 1
        elif r.event_type == "purchase":
            ys[r.user_id] += 1
    nn = len(users)
    sx = sum(xs.values())
    sy = sum(ys.values())
    sxy = sum(xs[u] * ys[u] for u in users)
    sxx = sum(x * x for x in xs.values())
    th = (nn * sxy - sx * sy) / (nn * sxx - sx * sx)
    gx = sx / nn
    for arm, r in out.items():
        mean_x = r.sum_x / r.n_users
        mean_y = r.sum_y / r.n_users
        assert abs(r.adj_mean_y - (mean_y - th * (mean_x - gx))) < 1e-9

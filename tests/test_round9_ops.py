"""Round-9 additions: full independent Python recomputation of each
new query's arithmetic from the raw parquet tables.
"""

from __future__ import annotations

import hashlib
from collections import Counter

from automated_agro_climatic_data_warehouse_spark.plans import QUERIES


def _fs_records(spark, sf_dir):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").collect()
    recs = []
    for r in cust:
        if r.c_custkey >= 2000:
            continue
        cents = round(r.c_acctbal * 100)
        recs.append(
            (r.c_custkey, r.c_nationkey, r.c_name, r.c_mktsegment, cents)
        )
        if r.c_custkey % 20 == 0:
            recs.append(
                (
                    -r.c_custkey,
                    r.c_nationkey,
                    r.c_name,
                    r.c_mktsegment,
                    cents + (1 if r.c_custkey % 40 == 0 else 0),
                )
            )
    return recs


def test_blocking_audit_matches_python(spark, sf_dir):
    recs = _fs_records(spark, sf_dir)

    def kilo(c):
        return c // 1000 if c >= 0 else -((-c) // 1000)

    schemes = {
        "nation": lambda r: str(r[1]),
        "segment": lambda r: r[3],
        "nation_segment": lambda r: f"{r[1]}|{r[3]}",
        "cents_kilo": lambda r: str(kilo(r[4])),
    }
    by_key = {r[0]: r for r in recs}
    true_pairs = [
        (by_key[-k], by_key[k]) for k in by_key if k < 0
    ]
    n_rec = len(recs)
    total = n_rec * (n_rec - 1) // 2
    expect = {}
    for name, keyf in schemes.items():
        blocks = Counter(keyf(r) for r in recs)
        cands = sum(n * (n - 1) // 2 for n in blocks.values())
        covered = sum(1 for c, o in true_pairs if keyf(c) == keyf(o))
        expect[name] = (
            len(blocks),
            cands,
            len(true_pairs),
            covered,
            (total - cands) * 1000000 // total,
            covered * 1000000 // len(true_pairs),
        )
    got = {
        r.strategy: (
            r.n_blocks,
            r.n_candidates,
            r.n_true,
            r.n_true_covered,
            r.rr_e6,
            r.pc_e6,
        )
        for r in QUERIES["dedup_blocking_audit"]
        .spark_fn(spark, sf_dir)
        .collect()
    }
    assert got == expect
    # the production nation block must be recall-complete on this
    # corpus (injected copies keep nationkey) while still pruning the
    # bulk of the comparison space
    assert got["nation"][5] == 1000000
    assert got["nation"][4] > 900000


def test_katz_matches_python(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").collect()
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    cust_of = {r.o_orderkey: r.o_custkey for r in orders}
    e0 = {(cust_of[r.l_orderkey], r.l_suppkey) for r in li}
    edges = set()
    for c, s in e0:
        edges.add((c, -(s + 1)))
        edges.add((-(s + 1), c))
    nodes = {u for u, _ in edges} | {v for _, v in edges}
    T = 1 << 20
    x = {n: T for n in nodes}
    for _ in range(4):
        sm = Counter()
        for u, v in edges:
            sm[v] += x[u]
        x = {n: sm[n] // 1024 + T for n in nodes}
    got = {
        r.node: r.score_q
        for r in QUERIES["graph_katz_k4"].spark_fn(spark, sf_dir).collect()
    }
    assert got == x
    # Katz semantics: suppliers touched by many customers outrank the
    # beta baseline; every score is at least beta
    assert min(got.values()) >= T


def test_page_hinkley_matches_python(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").collect()
    daily = Counter((r.event_type, r.ts.date()) for r in ev)
    by_type = {}
    for (et, day), x in daily.items():
        by_type.setdefault(et, []).append((day, x))
    T = 1 << 20
    expect = {}
    for et, rows in by_type.items():
        rows.sort()
        s = 0
        m = 0
        min_m = 0
        ph_series = []
        for i, (day, x) in enumerate(rows, start=1):
            s += x
            num = x * i - s
            d_q = (num * T) // i if num >= 0 else -(((-num) * T) // i)
            m += d_q - 524288
            min_m = min(min_m, m)  # running min incl. current row
            ph_series.append((day, m - min(0, min_m)))
        alarms = [(d, p) for d, p in ph_series if p > 20971520]
        expect[et] = (
            len(ph_series),
            max(p for _, p in ph_series),
            len(alarms),
            alarms[0][0] if alarms else None,
        )
    got = {
        r.event_type: (
            r.n_days,
            r.max_ph_q,
            r.n_alarm_days,
            r.first_alarm_day,
        )
        for r in QUERIES["dq_page_hinkley"].spark_fn(spark, sf_dir).collect()
    }
    assert got == expect

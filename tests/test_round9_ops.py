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

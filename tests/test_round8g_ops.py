"""Round-8 eighth wave: JSD source drift, Fellegi-Sunter linkage,
Aalen-Johansen competing-risks CIF — full independent Python
recomputation (the DuckDB oracle parity is tools/check.py's job).
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

from automated_agro_climatic_data_warehouse_spark.plans import QUERIES

GRID = 1 << 20


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _ssd(num: int, den: int) -> int:
    """sign-split truncating division (the repo's div discipline)."""
    return num // den if num >= 0 else -((-num) // den)


def test_jsd_matches_python(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    cnt = defaultdict(Counter)
    for r in docs:
        for t in r.text.lower().split():
            if t:
                cnt[r.source][t] += 1
    corpus = Counter()
    for c in cnt.values():
        corpus.update(c)
    vocab = set(
        t for t, _ in sorted(corpus.items(), key=lambda kv: (-kv[1], kv[0]))[:500]
    )
    mapped = {}
    for s, c in cnt.items():
        m = Counter()
        for t, v in c.items():
            m[t if t in vocab else "<oov>"] += v
        mapped[s] = m
    csym = Counter()
    for m in mapped.values():
        csym.update(m)
    n_all = sum(csym.values())
    expect = {}
    for s, m in mapped.items():
        n_src = sum(m.values())
        kl1 = kl2 = 0
        for sym, b in csym.items():
            a = m.get(sym, 0)
            mix = a * n_all + b * n_src
            lmix = round(math.log(mix) * GRID)
            if a > 0:
                kl1 += a * (round(math.log(2.0 * a * n_all) * GRID) - lmix)
            kl2 += b * (round(math.log(2.0 * b * n_src) * GRID) - lmix)
        jsd_q = _ssd(kl1, 2 * n_src) + _ssd(kl2, 2 * n_all)
        expect[s] = (n_src, kl1, kl2, jsd_q)
    got = {
        r.source: (r.n_src, r.kl1_num, r.kl2_num, r.jsd_q)
        for r in QUERIES["ts_jsd_source_drift"].spark_fn(spark, sf_dir).collect()
    }
    assert got == expect
    # JSD is bounded: 0 <= jsd <= ln 2 (grid slack one ulp per side)
    ln2_q = round(math.log(2.0) * GRID)
    for _, _, _, j in got.values():
        assert -2 <= j <= ln2_q + 2


def test_fellegi_sunter_matches_python(spark, sf_dir):
    cust = [
        r
        for r in spark.read.parquet(f"{sf_dir}/customer.parquet").collect()
        if r.c_custkey < 2000
    ]

    def cents(bal):
        # python round() is half-even; Spark/DuckDB round() is half-away
        # — mirror half-away explicitly
        return int(math.floor(bal * 100 + 0.5)) if bal >= 0 else -int(
            math.floor(-bal * 100 + 0.5)
        )

    rows = [
        (r.c_custkey, r.c_nationkey, r.c_name, r.c_mktsegment,
         cents(r.c_acctbal), r.c_acctbal >= 0)
        for r in cust
    ]
    rows += [
        (-r.c_custkey, r.c_nationkey, r.c_name, r.c_mktsegment,
         cents(r.c_acctbal) + (1 if r.c_custkey % 40 == 0 else 0),
         r.c_acctbal >= 0)
        for r in cust
        if r.c_custkey % 20 == 0
    ]
    by_nat = defaultdict(list)
    for t in rows:
        by_nat[t[1]].append(t)
    pairs = []
    for nat, rs in by_nat.items():
        rs.sort()
        for i, a in enumerate(rs):
            for b in rs[i + 1 :]:
                if a[0] < b[0]:
                    g = (
                        a[2] == b[2],
                        a[3] == b[3],
                        a[4] == b[4],
                        a[5] == b[5],
                    )
                    h = _h32(f"fs:{a[0]}:{b[0]}") % 100
                    pairs.append((a[0], b[0], g, a[0] == -b[0], h))
    nm = sum(1 for p in pairs if p[3])
    ms = [sum(1 for p in pairs if p[3] and p[2][i]) for i in range(4)]
    usel = [p for p in pairs if not p[3] and p[4] < 20]
    nu = len(usel)
    us = [sum(1 for p in usel if p[2][i]) for i in range(4)]

    def lnq(x):
        return round(math.log(float(x)) * GRID)

    expect = Counter()
    truth = Counter()
    for ka, kb, g, ist, _ in pairs:
        w = 0
        for i in range(4):
            if g[i]:
                w += lnq((ms[i] + 1) * (nu + 2)) - lnq((us[i] + 1) * (nm + 2))
            else:
                w += lnq((nm + 1 - ms[i]) * (nu + 2)) - lnq(
                    (nu + 1 - us[i]) * (nm + 2)
                )
        band = _ssd(w, GRID)
        expect[band] += 1
        truth[band] += ist
    got = {
        r.band: (r.n_pairs, r.n_true_match)
        for r in QUERIES["dedup_fellegi_sunter"].spark_fn(spark, sf_dir).collect()
    }
    assert got == {b: (n, truth[b]) for b, n in expect.items()}
    # separation: every true-match pair must land in a band above every
    # band that is >99% non-match mass... minimally: the top band is
    # dominated by true matches and the bottom band contains none
    top = max(got)
    bot = min(got)
    assert got[top][1] > 0 and got[top][1] >= got[top][0] // 2
    assert got[bot][1] == 0


def _sessions(spark, sf_dir):
    ev = [
        (r.user_id, r.ts, r.event_id, r.event_type)
        for r in spark.read.parquet(f"{sf_dir}/events.parquet").collect()
        if r.user_id is not None
    ]
    by_user = defaultdict(list)
    for u, ts, eid, et in ev:
        by_user[u].append((ts, eid, et))
    GAP = 30 * 60 * 1_000_000
    sessions = []
    for u, rows in by_user.items():
        rows.sort(key=lambda t: (t[0], t[1]))
        cur, conv, prev = [], 0, None
        for ts, eid, et in rows:
            us = int(ts.timestamp() * 1_000_000)
            if prev is not None and us - prev > GAP:
                sessions.append((min(cur), max(cur), conv))
                cur, conv = [], 0
            cur.append(us)
            conv = max(conv, int(et == "purchase"))
            prev = us
        if cur:
            sessions.append((min(cur), max(cur), conv))
    return sessions, GAP


def test_competing_risks_matches_python(spark, sf_dir):
    sessions, GAP = _sessions(spark, sf_dir)
    tmax = max(t1 for _, t1, _ in sessions)
    byd = defaultdict(lambda: [0, 0, 0, 0])  # leaving, d_conv, d_other, cens
    for t0, t1, conv in sessions:
        dur = (t1 - t0) // 60_000_000
        cens = t1 >= tmax - GAP
        st = byd[dur]
        st[0] += 1
        if not cens:
            st[1] += conv
            st[2] += 1 - conv
        else:
            st[3] += 1
    durs = sorted(byd)
    acc = 0
    n_risk = {}
    for d in reversed(durs):
        acc += byd[d][0]
        n_risk[d] = acc
    cum_lnq, hit_zero = 0, 0
    s_prev = 1_000_000
    cif1 = cif2 = 0
    expect = {}
    for d in durs:
        _, d1, d2, cens = byd[d]
        nr = n_risk[d]
        cif1 += s_prev * ((d1 * GRID) // nr)
        cif2 += s_prev * ((d2 * GRID) // nr)
        dd = d1 + d2
        if dd == nr:
            hit_zero = 1
        elif dd > 0:
            cum_lnq += round(math.log(nr - dd) * GRID) - round(
                math.log(nr) * GRID
            )
        s_e6 = 0 if hit_zero else round(math.exp(cum_lnq / GRID) * 1_000_000)
        expect[d] = (nr, d1, d2, cens, cif1, cif2, s_e6)
        s_prev = s_e6
    got = {
        r.dur: (r.n_risk, r.d_conv, r.d_other, r.censored_n, r.cif_conv_q,
                r.cif_other_q)
        for r in QUERIES["ev_competing_risks_cif"].spark_fn(spark, sf_dir).collect()
    }
    assert got == {d: v[:6] for d, v in expect.items()}
    # discrete identity CIF_conv + CIF_other = 1 - S(t), within grid
    # slack (truncating-div terms only shrink the left side; S carries
    # e6 rounding): check at the last duration
    last = durs[-1]
    lhs = (expect[last][4] + expect[last][5]) / (GRID * 1e6)
    rhs = 1.0 - expect[last][6] / 1e6
    assert rhs - 5e-3 <= lhs <= rhs + 5e-3
    # and each 1-KM-per-cause naive curve would overshoot: CIFs are
    # individually below the all-cause cumulative exit share
    assert expect[last][4] <= (GRID * 1e6) and expect[last][5] <= (GRID * 1e6)


def test_logrank_matches_python(spark, sf_dir):
    sessions, GAP = _sessions(spark, sf_dir)
    tmax = max(t1 for _, t1, _ in sessions)
    byd = defaultdict(lambda: [0, 0, 0, 0])  # leaving, leaving1, d, d1
    n_conv = n_other = 0
    for t0, t1, conv in sessions:
        dur = (t1 - t0) // 60_000_000
        cens = t1 >= tmax - GAP
        st = byd[dur]
        st[0] += 1
        st[1] += conv
        if not cens:
            st[2] += 1
            st[3] += conv
        n_conv += conv
        n_other += 1 - conv
    durs = sorted(byd)
    acc = acc1 = 0
    o1 = e1 = v = 0
    G, GV = 1 << 20, 1 << 10
    for d_ in reversed(durs):
        acc += byd[d_][0]
        acc1 += byd[d_][1]
        byd[d_].extend([acc, acc1])  # n, n1
    for d_ in durs:
        _, _, d, d1, n, n1 = byd[d_]
        o1 += d1
        e1 += (d * n1 * G) // n
        if n > 1:
            v += (((d * n1 * GV) // n) * (n - n1) * (n - d)) // (
                n * (n - 1)
            )
    chi2_e6 = (
        round((o1 - e1 / G) ** 2 / (v / GV) * 1_000_000) if v > 0 else 0
    )
    rows = QUERIES["ev_survival_logrank"].spark_fn(spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_converted, r.n_other, r.o1, r.e1_q, r.v_q) == (
        n_conv,
        n_other,
        o1,
        e1,
        v,
    )
    assert r.logrank_chi2_e6 == chi2_e6
    # O1 and E1 live on the same scale: |O1 - E1| bounded by total
    # churn events
    assert abs(o1 - e1 / G) <= sum(b[2] for b in byd.values())

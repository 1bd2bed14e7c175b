"""Distributed EXACT ntile — global quantile bucketing without the
single-partition global-window sort.

`ntile(n) OVER (ORDER BY value, id)` is the one analytic whose naive
plan is an instant 100 TB killer: Spark moves every row to ONE task to
sort it. The exact decomposition used here (first proven out by
w7_ntile_deciles, plans/analytics_queries.py) splits the global rank
into

    rank(row) = (# rows with a strictly smaller value)
              + (row_number among the row's value-ties, ordered by id)

The first term computes on the VALUE-AGGREGATED frame (one count per
distinct value), whose size is bounded by the value domain, not the
corpus; the second is a window partitioned by value (tie groups, never
whole-table). Cumulative offsets over the distinct-value frame are
themselves computed scalably: a cumsum window PARTITIONED by a coarse
value bucket plus an O(buckets²) broadcast self-join for bucket-level
offsets — zero unpartitioned windows anywhere (pinned in
tests/test_plans.py for every consumer).

The ntile bucket then follows from the rank in exact integer
arithmetic — the first n_total % n tiles get one extra row — matching
ANSI ntile bit-for-bit, which is what lets a DuckDB `ntile(n) OVER
(ORDER BY value, id)` serve as the oracle.

GROUPED form: pass `part_cols` and every stage keys on
(partition, value) instead of value — the result is
`ntile(n) OVER (PARTITION BY part ORDER BY value, id)`, per-group
quantile bucketing with the same no-global-sort guarantee (groups
never concentrate on one task regardless of group count or size).

Applicability: the value domain must be materially smaller than the
corpus (discrete grids — integer counts, day ages, cent amounts,
2-decimal balances). For truly continuous high-cardinality doubles the
honest scale path is approx_percentile thresholds, not exact ntile.

Skew caveat: the tie row_number window partitions by value, so ONE
value carrying a macroscopic fraction of all rows (a default/sentinel
amount) becomes a single hot window partition. The fix at that point
is not deeper rank machinery — it is recognizing the query as ntile
over a WEIGHTED value histogram: pre-aggregate to (value, count),
tile the histogram (domain-bounded by construction), and fan tile
boundaries back. Callers with sentinel-heavy metrics should take that
path; the registry's consumers (day ages, activity counts, cent sums,
unique-keyed amounts) have no such class.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def exact_ntile(
    df: DataFrame,
    value_col: str,
    id_col: str,
    n: int,
    out_col: str,
    bucket: Column | None = None,
    broadcast_offsets: bool = True,
    part_cols: list[str] | None = None,
) -> DataFrame:
    """Append `out_col` = ntile(`n`) over (PARTITION BY part_cols
    ORDER BY value_col, id_col) to `df`, computed with the distributed
    rank decomposition above (global ntile when `part_cols` is empty).

    `id_col` must be unique per row within its partition (the
    deterministic tie-break).
    PRECONDITION: `value_col` and every `part_cols` entry must be
    NON-NULL on every row — the decomposition joins rows back to their
    value-group offsets, and a NULL key row silently drops from the
    output instead of ranking NULLS LAST like ANSI ntile. Callers with
    nullable metrics must coalesce/filter first (every registry
    consumer feeds exact non-null integers).
    `bucket` optionally overrides the coarse value-bucket expression
    used for the offset cumsum (default: value div 100 on the raw
    value) — pick ~100-10k buckets over the value domain.
    `broadcast_offsets=False` joins the per-value offsets back by
    shuffle instead of broadcast — required when the value domain is
    wide (mostly-unique values make the offsets frame row-sized, and
    broadcasting a row-sized frame is its own scale hazard); the
    bucket cumsum/offset machinery stays domain-bounded either way.
    """
    part = list(part_cols or [])
    v = F.col(value_col)
    vbkt = bucket if bucket is not None else F.floor(v / 100.0)
    cnts = (
        df.groupBy(*part, value_col)
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .withColumn("_vbkt", vbkt)
    )
    w_in_bkt = (
        W.partitionBy(*part, "_vbkt")
        .orderBy(value_col)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    cnts = cnts.withColumn(
        "_cum_in_bkt", F.coalesce(F.sum("_cnt").over(w_in_bkt), F.lit(0))
    )
    btot = cnts.groupBy(*part, "_vbkt").agg(F.sum("_cnt").alias("_bcnt"))
    bcond = F.col("b._vbkt") < F.col("a._vbkt")
    for p in part:
        bcond = bcond & (F.col(f"b.{p}") == F.col(f"a.{p}"))
    bcum = (
        btot.alias("a")
        .join(F.broadcast(btot.alias("b")), bcond, "left")
        .groupBy(
            *[F.col(f"a.{p}").alias(p) for p in part],
            F.col("a._vbkt").alias("_vbkt"),
        )
        .agg(F.coalesce(F.sum("b._bcnt"), F.lit(0)).alias("_bkt_before"))
    )
    offsets = cnts.join(F.broadcast(bcum), [*part, "_vbkt"]).select(
        *part,
        value_col,
        (F.col("_bkt_before") + F.col("_cum_in_bkt")).alias("_cum_before"),
    )
    if broadcast_offsets:
        offsets = F.broadcast(offsets)
    w_ties = W.partitionBy(*part, value_col).orderBy(id_col)
    ranked = df.withColumn("_rk_in", F.row_number().over(w_ties)).join(
        offsets, [*part, value_col]
    )
    if part:
        n_df = df.groupBy(*part).agg(F.count(F.lit(1)).alias("_n_total"))
        ranked = ranked.join(F.broadcast(n_df), part)
    else:
        n_df = df.agg(F.count(F.lit(1)).alias("_n_total"))
        ranked = ranked.crossJoin(F.broadcast(n_df))
    ranked = (
        ranked.withColumn("_rank", F.col("_cum_before") + F.col("_rk_in"))
        .withColumn("_q", F.expr(f"_n_total div {n}"))
        .withColumn("_rem", F.col("_n_total") % n)
        .withColumn(
            out_col,
            F.expr(
                "CASE WHEN _rank <= _rem * (_q + 1) "
                "THEN (_rank + _q) div (_q + 1) "
                "ELSE _rem + (_rank - _rem * (_q + 1) + _q - 1) "
                "     div greatest(_q, 1) END"
            ).cast("bigint"),
        )
    )
    drop = ["_cnt", "_vbkt", "_cum_in_bkt", "_cum_before", "_rk_in",
            "_rank", "_q", "_rem", "_n_total"]
    return ranked.drop(*[c for c in drop if c in ranked.columns])

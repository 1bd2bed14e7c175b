"""Streaming CDC apply: the drained per-key-latest state must be
BIT-IDENTICAL to the batch changelog window under ANY file→micro-batch
partitioning and ANY arrival ORDER (per-key argmax-by-seq is a
semilattice), and the applied dimension must equal the batch
cdc_apply_changelog output exactly — the property that makes log-based
replication safe to parallelize and replay.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from automated_agro_climatic_data_warehouse_spark.operators.cdc import (
    changelog_latest,
)
from automated_agro_climatic_data_warehouse_spark.plans import QUERIES
from automated_agro_climatic_data_warehouse_spark.sources import load_table
from automated_agro_climatic_data_warehouse_spark.streaming.cdc_apply import (
    CHANGELOG_SCHEMA,
    cdc_apply_drain,
    cdc_apply_readout,
)

SF = "/root/testdata/sf0.001"


def _waves(spark):
    """The exact four changelog waves the batch query synthesizes
    (plans/cdc_queries.py): update, delete, insert-as-new-key, second
    update on overlapping keys."""
    o = load_table(spark, SF, "orders").select("o_orderkey", "o_totalprice")
    specs = [
        (1, "U", F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + 10.0),
        (2, "D", F.col("o_orderkey") % 500 == 0, F.lit(None).cast("double")),
        (3, "I", F.col("o_orderkey") % 500 == 0, F.col("o_totalprice")),
        (4, "U", F.col("o_orderkey") % 21 == 0, F.col("o_totalprice") + 20.0),
    ]
    out = []
    for seq, op, cond, price in specs:
        key = -(F.col("o_orderkey") + 1) if op == "I" else F.col("o_orderkey")
        out.append(
            o.filter(cond).select(
                F.lit(seq).cast("bigint").alias("seq"),
                F.lit(op).alias("op"),
                key.cast("bigint").alias("k"),
                price.cast("double").alias("price"),
            )
        )
    return out


@pytest.mark.parametrize("order", [(0, 1, 2, 3), (3, 1, 0, 2)])
def test_stream_cdc_state_and_apply_equal_batch(spark, tmp_path, order):
    """In-order AND shuffled-arrival drains must both reach the batch
    state bit-for-bit, and the applied dimension must equal the batch
    query's output exactly."""
    waves = _waves(spark)
    src = str(tmp_path / f"src{''.join(map(str, order))}")
    for slot, wi in enumerate(order):
        waves[wi].coalesce(1).write.mode("overwrite").parquet(
            f"{src}/f{slot}"
        )
    state = cdc_apply_drain(
        spark,
        f"{src}/*",
        str(tmp_path / f"state{''.join(map(str, order))}"),
        str(tmp_path / f"ckpt{''.join(map(str, order))}"),
    )
    full = waves[0]
    for w in waves[1:]:
        full = full.unionByName(w)
    batch_state = changelog_latest(full)
    got = {tuple(r) for r in state.collect()}
    want = {tuple(r) for r in batch_state.collect()}
    assert got == want and len(got) > 0
    # the applied dimension equals the registry batch query exactly
    base = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    applied = {
        tuple(r) for r in cdc_apply_readout(state, base).collect()
    }
    batch_applied = {
        tuple(r)
        for r in QUERIES["cdc_apply_changelog"].spark_fn(spark, SF).collect()
    }
    assert applied == batch_applied


def test_stream_cdc_redeliveries_collapse(spark, tmp_path):
    """At-least-once delivery: re-staging wave 1 in a later file (a
    duplicate delivery) must leave the final state unchanged —
    idempotency of the semilattice merge."""
    waves = _waves(spark)
    src = str(tmp_path / "src_dup")
    for slot, df in enumerate(waves + [waves[0]]):
        df.coalesce(1).write.mode("overwrite").parquet(f"{src}/f{slot}")
    state = cdc_apply_drain(
        spark,
        f"{src}/*",
        str(tmp_path / "state_dup"),
        str(tmp_path / "ckpt_dup"),
    )
    full = waves[0]
    for w in waves[1:]:
        full = full.unionByName(w)
    assert {tuple(r) for r in state.collect()} == {
        tuple(r) for r in changelog_latest(full).collect()
    }

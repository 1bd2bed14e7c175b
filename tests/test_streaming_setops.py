"""Streaming KMV set-operation sketch: the drained OR-merged bottom-k
membership state must be BIT-IDENTICAL to the batch-built sketch for
ANY file -> micro-batch partitioning — including partitionings that
SPLIT one logical entity's rows across micro-batches, the case that
distinguishes the flag-OR semilattice from the plain bottom-k one
(a later batch may contribute the in_b flag for an hv whose in_a
arrived earlier).
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # multi-minute suite: excluded from the default (driver) tier
from pyspark.sql import functions as F

from automated_agro_climatic_data_warehouse_spark.operators.dedup import hash32
from automated_agro_climatic_data_warehouse_spark.operators.sketches import (
    kmv_flags_bottomk,
)
from automated_agro_climatic_data_warehouse_spark.streaming.kmv_setops import (
    kmv_setops_drain,
)

SCHEMA = "uid long, kind string"
K = 16  # n distinct uids (60) > k so bottom-k genuinely selects


def _rows():
    # 60 uids; kind membership varies: a-only / b-only / both, with the
    # "both" uids emitting their a and b rows at DIFFERENT positions so
    # file-splits separate them across micro-batches
    rows = []
    for u in range(60):
        if u % 3 == 0:
            rows.append((u, "a"))
        elif u % 3 == 1:
            rows.append((u, "b"))
        else:
            rows.append((u, "a"))
    for u in range(60):
        if u % 3 == 2:
            rows.append((u, "b"))
    return rows


def _flags(df):
    return df.groupBy(
        hash32(F.concat(F.lit("so:"), F.col("uid").cast("string"))).alias(
            "hv"
        )
    ).agg(
        F.max(F.when(F.col("kind") == "a", 1).otherwise(0)).alias("in_a"),
        F.max(F.when(F.col("kind") == "b", 1).otherwise(0)).alias("in_b"),
    )


def _stage(spark, tmp_path, n_files: int):
    rows = _rows()
    src = str(tmp_path / f"src{n_files}")
    per = [[] for _ in range(n_files)]
    # contiguous slices (NOT round-robin) so a "both" uid's a-row and
    # b-row land in different files
    step = (len(rows) + n_files - 1) // n_files
    for i in range(n_files):
        per[i] = rows[i * step:(i + 1) * step]
    for i, chunk in enumerate(per):
        spark.createDataFrame(chunk, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/f{i}")
    return src, rows


def _batch_state(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return {
        (r.hv, r.in_a, r.in_b)
        for r in kmv_flags_bottomk(_flags(df), K).collect()
    }


@pytest.mark.parametrize("n_files", [1, 4])
def test_stream_state_equals_batch_any_partitioning(
    spark, tmp_path, n_files
):
    src, rows = _stage(spark, tmp_path, n_files)
    state = kmv_setops_drain(
        spark,
        f"{src}/*",
        SCHEMA,
        str(tmp_path / f"state{n_files}"),
        str(tmp_path / f"ckpt{n_files}"),
        flags_fn=_flags,
        k=K,
    )
    got = {(r.hv, r.in_a, r.in_b) for r in state.collect()}
    assert got == _batch_state(spark, rows)
    assert len(got) == K


def test_split_entity_flags_or_across_batches(spark, tmp_path):
    """With 4 contiguous files, every 'both' uid's b-row arrives in a
    LATER micro-batch than its a-row; the drained state must still
    carry in_a = in_b = 1 for those uids — the flag-OR guarantee."""
    src, rows = _stage(spark, tmp_path, 4)
    state = kmv_setops_drain(
        spark,
        f"{src}/*",
        SCHEMA,
        str(tmp_path / "state_split"),
        str(tmp_path / "ckpt_split"),
        flags_fn=_flags,
        k=K,
    )
    batch = _batch_state(spark, rows)
    both_hashes = {hv for (hv, a, b) in batch if a == 1 and b == 1}
    got_both = {
        r.hv for r in state.collect() if r.in_a == 1 and r.in_b == 1
    }
    assert got_both == both_hashes
    assert both_hashes, "corpus must contain split 'both' entities"


def test_drain_is_idempotent_per_checkpoint(spark, tmp_path):
    src, rows = _stage(spark, tmp_path, 2)
    args = (
        spark,
        f"{src}/*",
        SCHEMA,
        str(tmp_path / "state_i"),
        str(tmp_path / "ckpt_i"),
    )
    s1 = kmv_setops_drain(*args, flags_fn=_flags, k=K)
    first = {(r.hv, r.in_a, r.in_b) for r in s1.collect()}
    # second drain with the same checkpoint: no new files -> state
    # unchanged (exactly-once re-drain)
    s2 = kmv_setops_drain(*args, flags_fn=_flags, k=K)
    assert {(r.hv, r.in_a, r.in_b) for r in s2.collect()} == first

"""Streaming A-ES weighted reservoir: the drained top-k state must be
BIT-IDENTICAL to the batch-built sample for ANY file→micro-batch
partitioning (top-k under the (res_key DESC, id) total order is a
semilattice: merge = topk of the union, associative + commutative +
idempotent — kmv_quantiles' argument with the order reversed), and the
drain must be exactly-once per checkpoint.
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # multi-minute suite: excluded from the default (driver) tier

from automated_agro_climatic_data_warehouse_spark.operators.sketches import wres_state
from automated_agro_climatic_data_warehouse_spark.streaming.weighted_reservoir import (
    weighted_reservoir_drain,
)

SCHEMA = "event_id long, value double"
K = 32  # small k so top-k genuinely selects (n = 200 > k)


def _rows():
    # deterministic, heavy-tailed weights; a few nonpositive rows the
    # state must EXCLUDE (A-ES precondition enforced in wres_state)
    out = []
    for i in range(200):
        w = float((i * 53) % 97) / 4.0 + 0.25
        if i % 41 == 0:
            w = 0.0 if i % 2 == 0 else -1.5
        out.append((i, w))
    return out


def _stage(spark, tmp_path, n_files: int):
    rows = _rows()
    src = str(tmp_path / f"src{n_files}")
    per = [[] for _ in range(n_files)]
    for i, r in enumerate(rows):
        per[i % n_files].append(r)
    for i, chunk in enumerate(per):
        spark.createDataFrame(chunk, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/f{i}")
    return src, rows


def _batch_state(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return {
        (r.id, r.weight, r.lnu_q, r.res_key)
        for r in wres_state(df, "event_id", "value", K).collect()
    }


@pytest.mark.parametrize("n_files", [1, 5])
def test_stream_state_equals_batch_any_partitioning(spark, tmp_path, n_files):
    src, rows = _stage(spark, tmp_path, n_files)
    state = weighted_reservoir_drain(
        spark,
        f"{src}/*",
        SCHEMA,
        str(tmp_path / f"state{n_files}"),
        str(tmp_path / f"ckpt{n_files}"),
        id_col="event_id",
        weight_col="value",
        k=K,
    )
    got = {(r.id, r.weight, r.lnu_q, r.res_key) for r in state.collect()}
    assert got == _batch_state(spark, rows)
    assert len(got) == K
    # nonpositive-weight rows never enter the reservoir
    assert all(w > 0 for _, w, _, _ in got)


def test_registry_query_matches_operator(spark, sf_dir):
    """The registered sample_weighted_reservoir query IS the shared
    operator applied to events (one definition of 'the sample')."""
    from automated_agro_climatic_data_warehouse_spark.plans import QUERIES

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    op = {
        (r.id, r.lnu_q, r.res_key)
        for r in wres_state(ev, "event_id", "value", 256).collect()
    }
    q = {
        (r.event_id, r.lnu_q, r.res_key)
        for r in QUERIES["sample_weighted_reservoir"]
        .spark_fn(spark, sf_dir)
        .collect()
    }
    assert q == op


def test_redrain_same_checkpoint_is_noop(spark, tmp_path):
    src, _ = _stage(spark, tmp_path, 3)
    args = (
        spark,
        f"{src}/*",
        SCHEMA,
        str(tmp_path / "state_r"),
        str(tmp_path / "ckpt_r"),
    )
    kw = dict(id_col="event_id", weight_col="value", k=K)
    first = {
        (r.id, r.lnu_q)
        for r in weighted_reservoir_drain(*args, **kw).collect()
    }
    again = {
        (r.id, r.lnu_q)
        for r in weighted_reservoir_drain(*args, **kw).collect()
    }
    assert first == again

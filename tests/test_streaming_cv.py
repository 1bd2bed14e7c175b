"""Streaming Cramér's V: drained cell state bit-identical to the batch
merge for ANY file partitioning, drained readout equal to the
registered dq_cramers_v query (one definition), exactly-once redrain,
and the empty-cell densification pinned on a hand-built table.
"""

from __future__ import annotations

import math

import pytest

pytestmark = pytest.mark.slow  # multi-minute suite: excluded from the default (driver) tier

from automated_agro_climatic_data_warehouse_spark.operators.quality import (
    cramers_v_readout,
    ct_merge,
)
from automated_agro_climatic_data_warehouse_spark.plans import QUERIES
from automated_agro_climatic_data_warehouse_spark.streaming.cramers_v import (
    ct_drain,
)

SCHEMA = "event_type string, dow bigint"


def _rows(spark, sf_dir):
    from pyspark.sql import functions as F

    from automated_agro_climatic_data_warehouse_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr(
            "cast(datediff(cast(ts as date), date '1970-01-01') % 7"
            " as bigint)"
        ).alias("dow"),
    )
    return [(r.event_type, r.dow) for r in ev.collect()]


def _stage(spark, tmp_path, rows, n_files):
    src = str(tmp_path / f"src{n_files}")
    per = [[] for _ in range(n_files)]
    for i, r in enumerate(rows):
        per[i % n_files].append(r)
    for i, chunk in enumerate(per):
        spark.createDataFrame(chunk, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/f{i}")
    return src


def _v_row(df):
    r = df.collect()[0]
    return (r.n, r.k_r, r.k_c, r.chi2_e6, round(r.cramers_v, 9))


@pytest.mark.parametrize("n_files", [1, 4])
def test_stream_state_and_readout_equal_batch(spark, tmp_path, sf_dir, n_files):
    rows = _rows(spark, sf_dir)
    src = _stage(spark, tmp_path, rows, n_files)
    state = ct_drain(
        spark,
        f"{src}/*",
        str(tmp_path / f"state{n_files}"),
        str(tmp_path / f"ckpt{n_files}"),
    )
    batch = ct_merge(spark.createDataFrame(rows, SCHEMA), None)
    got = {(r.event_type, r.dow): r.o for r in state.collect()}
    exp = {(r.event_type, r.dow): r.o for r in batch.collect()}
    assert got == exp
    assert _v_row(cramers_v_readout(state)) == _v_row(
        QUERIES["dq_cramers_v"].spark_fn(spark, sf_dir)
    )


def test_perfect_association_scores_one(spark):
    """Hand-built 2x2 with perfect association (each type on its own
    dow, balanced): chi2 = N, V = 1 exactly — and an independent
    table scores ~0."""
    perfect = [("a", 0)] * 10 + [("b", 1)] * 10
    r = cramers_v_readout(
        ct_merge(spark.createDataFrame(perfect, SCHEMA), None)
    ).collect()[0]
    assert (r.n, r.k_r, r.k_c) == (20, 2, 2)
    assert math.isclose(r.cramers_v, 1.0, abs_tol=1e-9)
    indep = (
        [("a", 0)] * 5 + [("a", 1)] * 5 + [("b", 0)] * 5 + [("b", 1)] * 5
    )
    r2 = cramers_v_readout(
        ct_merge(spark.createDataFrame(indep, SCHEMA), None)
    ).collect()[0]
    assert r2.chi2_e6 == 0 and r2.cramers_v == 0.0


def test_empty_cell_densification(spark):
    """A (type, dow) combination with zero observations must still
    contribute its expected-count term: drop-the-empty-cells chi2
    would understate. 'b' never appears on dow 1."""
    rows = [("a", 0)] * 4 + [("a", 1)] * 4 + [("b", 0)] * 8
    r = cramers_v_readout(
        ct_merge(spark.createDataFrame(rows, SCHEMA), None)
    ).collect()[0]
    # margins: r_a=8, r_b=8, c_0=12, c_1=4, N=16
    # chi2 = sum (O*N - r*c)^2 / (N * r * c):
    # a0: (64-96)^2/(16*96)  a1: (64-32)^2/(16*32)
    # b0: (128-96)^2/(16*96) b1: (0-32)^2/(16*32)
    exp_chi2 = (32**2) / (16 * 96) + (32**2) / (16 * 32) * 2 + (32**2) / (
        16 * 96
    )
    assert math.isclose(r.chi2_e6 / 1e6, exp_chi2, rel_tol=1e-5)


def test_redrain_same_checkpoint_is_noop(spark, tmp_path, sf_dir):
    rows = _rows(spark, sf_dir)[:200]
    src = _stage(spark, tmp_path, rows, 3)
    args = (
        spark,
        f"{src}/*",
        str(tmp_path / "state_r"),
        str(tmp_path / "ckpt_r"),
    )
    first = {
        (r.event_type, r.dow, r.o) for r in ct_drain(*args).collect()
    }
    again = {
        (r.event_type, r.dow, r.o) for r in ct_drain(*args).collect()
    }
    assert first == again

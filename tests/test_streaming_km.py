"""Streaming Kaplan-Meier: the drained duration-histogram state must be
BIT-IDENTICAL to the batch histogram over the same subject rows for ANY
file→micro-batch partitioning (additive merge), the drained curve must
equal the registered ev_survival_km query row-for-row over the same
events (one definition), and the drain must be exactly-once per
checkpoint.
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # multi-minute suite: excluded from the default (driver) tier

from automated_agro_climatic_data_warehouse_spark.operators.survival import (
    km_curve,
    km_histogram_merge,
    km_subjects,
)
from automated_agro_climatic_data_warehouse_spark.plans import QUERIES
from automated_agro_climatic_data_warehouse_spark.streaming.survival_km import (
    survival_km_drain,
)

SCHEMA = "dur bigint, censored int"


def _rows():
    # deterministic subjects: durations with ties, a censored tail, and
    # one duration where every at-risk subject churns (curve pins to 0)
    rows = []
    for i in range(240):
        dur = (i * 7) % 40
        rows.append((dur, 1 if (dur >= 35 and i % 3 == 0) else 0))
    rows += [(60, 0), (60, 0)]  # the everyone-churns terminal step
    return rows


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


def _curve_map(df):
    return {
        r.dur: (r.n_risk, r.churned, r.censored_n, r.surv_e6)
        for r in df.collect()
    }


@pytest.mark.parametrize("n_files", [1, 4])
def test_stream_state_equals_batch_any_partitioning(spark, tmp_path, n_files):
    src, rows = _stage(spark, tmp_path, n_files)
    state = survival_km_drain(
        spark,
        f"{src}/*",
        SCHEMA,
        str(tmp_path / f"state{n_files}"),
        str(tmp_path / f"ckpt{n_files}"),
    )
    batch = km_histogram_merge(spark.createDataFrame(rows, SCHEMA), None)
    assert _curve_map(km_curve(state)) == _curve_map(km_curve(batch))
    # the terminal everyone-churns step pins the curve to exactly 0
    got = _curve_map(km_curve(state))
    assert got[60][3] == 0


def test_readout_matches_registry_query(spark, sf_dir):
    """Over the real events table, the streamed-operator pipeline IS
    the registered ev_survival_km query (one definition)."""
    from automated_agro_climatic_data_warehouse_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")
    op = _curve_map(km_curve(km_histogram_merge(km_subjects(ev), None)))
    q = _curve_map(QUERIES["ev_survival_km"].spark_fn(spark, sf_dir))
    assert op == q


def test_redrain_same_checkpoint_is_noop(spark, tmp_path):
    src, _ = _stage(spark, tmp_path, 3)
    args = (
        spark,
        f"{src}/*",
        SCHEMA,
        str(tmp_path / "state_r"),
        str(tmp_path / "ckpt_r"),
    )
    first = {
        (r.dur, r.churned, r.censored_n)
        for r in survival_km_drain(*args).collect()
    }
    again = {
        (r.dur, r.churned, r.censored_n)
        for r in survival_km_drain(*args).collect()
    }
    assert first == again


def test_na_readout_matches_registry_query(spark, sf_dir):
    """The SAME drained histogram state serves the Nelson-Aalen
    readout: na_curve over the operator pipeline IS the registered
    ev_hazard_nelson_aalen query row-for-row (one state, both
    survival readouts)."""
    from automated_agro_climatic_data_warehouse_spark.operators.survival import (
        na_curve,
    )
    from automated_agro_climatic_data_warehouse_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")
    op = {
        r.dur: (r.n_risk, r.churned, r.censored_n, r.na_q, r.cum_hazard, r.var_q)
        for r in na_curve(
            km_histogram_merge(km_subjects(ev), None)
        ).collect()
    }
    q = {
        r.dur: (r.n_risk, r.churned, r.censored_n, r.na_q, r.cum_hazard, r.var_q)
        for r in QUERIES["ev_hazard_nelson_aalen"]
        .spark_fn(spark, sf_dir)
        .collect()
    }
    assert op == q


def test_na_stream_state_equals_batch(spark, tmp_path):
    from automated_agro_climatic_data_warehouse_spark.operators.survival import (
        na_curve,
    )

    src, rows = _stage(spark, tmp_path, 4)
    state = survival_km_drain(
        spark,
        f"{src}/*",
        SCHEMA,
        str(tmp_path / "state_na"),
        str(tmp_path / "ckpt_na"),
    )
    batch = km_histogram_merge(spark.createDataFrame(rows, SCHEMA), None)
    got = {r.dur: (r.na_q, r.var_q) for r in na_curve(state).collect()}
    exp = {r.dur: (r.na_q, r.var_q) for r in na_curve(batch).collect()}
    assert got == exp

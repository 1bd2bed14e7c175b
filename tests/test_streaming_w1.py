"""Streaming Wasserstein drift: the drained live histogram must be
BIT-IDENTICAL to the batch merge for ANY file partitioning, and
w1_between(frozen early-half reference, drained late-half live) must
reproduce the registered dq_wasserstein_drift query row-for-row over
the same rows and split (one definition).
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # multi-minute suite: excluded from the default (driver) tier

from automated_agro_climatic_data_warehouse_spark.operators.quality import (
    vhist_merge,
    w1_between,
)
from automated_agro_climatic_data_warehouse_spark.plans import QUERIES
from automated_agro_climatic_data_warehouse_spark.streaming.wasserstein import (
    vhist_drain,
)

SCHEMA = "event_type string, cents bigint"


def _halves(spark, sf_dir):
    """The registered query's exact early/late observation frames."""
    from pyspark.sql import functions as F

    from automated_agro_climatic_data_warehouse_spark.sources import load_table

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
            F.unix_micros("ts").alias("us"),
        )
    )
    mid = ev.agg(F.expr("(min(us) + max(us)) div 2").alias("m")).collect()[
        0
    ].m
    early = [
        (r.event_type, r.cents)
        for r in ev.filter(F.col("us") <= mid).collect()
    ]
    late = [
        (r.event_type, r.cents)
        for r in ev.filter(F.col("us") > mid).collect()
    ]
    return early, late


def _stage(spark, tmp_path, rows, n_files, tag):
    src = str(tmp_path / f"src_{tag}{n_files}")
    per = [[] for _ in range(n_files)]
    for i, r in enumerate(rows):
        per[i % n_files].append(r)
    for i, chunk in enumerate(per):
        spark.createDataFrame(chunk, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/f{i}")
    return src


@pytest.mark.parametrize("n_files", [1, 4])
def test_stream_state_equals_batch(spark, tmp_path, sf_dir, n_files):
    _, late = _halves(spark, sf_dir)
    src = _stage(spark, tmp_path, late, n_files, "w1")
    state = vhist_drain(
        spark,
        f"{src}/*",
        str(tmp_path / f"state{n_files}"),
        str(tmp_path / f"ckpt{n_files}"),
    )
    batch = vhist_merge(spark.createDataFrame(late, SCHEMA), None)
    got = {(r.event_type, r.cents): r.n for r in state.collect()}
    exp = {(r.event_type, r.cents): r.n for r in batch.collect()}
    assert got == exp


def test_ref_vs_live_readout_matches_registry_query(spark, tmp_path, sf_dir):
    """Frozen reference = early half; drained live = late half; the
    monitor readout IS the registered query."""
    early, late = _halves(spark, sf_dir)
    ref = vhist_merge(spark.createDataFrame(early, SCHEMA), None)
    src = _stage(spark, tmp_path, late, 3, "rv")
    live = vhist_drain(
        spark,
        f"{src}/*",
        str(tmp_path / "state_rv"),
        str(tmp_path / "ckpt_rv"),
    )
    got = {
        r.event_type: (r.n1, r.n2, r.w1_e6)
        for r in w1_between(ref, live).collect()
    }
    exp = {
        r.event_type: (r.n1, r.n2, r.w1_e6)
        for r in QUERIES["dq_wasserstein_drift"]
        .spark_fn(spark, sf_dir)
        .collect()
    }
    assert got == exp


def _psi_halves(spark, sf_dir):
    """The dq_psi_drift split: first 15 OBSERVED days vs the rest,
    rows reduced to the shared (event_type, cents) observation shape
    so the SAME vhist state serves both the W1 and PSI readouts."""
    from pyspark.sql import functions as F

    from automated_agro_climatic_data_warehouse_spark.sources import load_table

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
            F.col("ts").cast("date").alias("day"),
        )
    )
    d0 = ev.agg(F.min("day").alias("d0")).collect()[0].d0
    import datetime

    cut = d0 + datetime.timedelta(days=15)
    early = [
        (r.event_type, r.cents)
        for r in ev.filter(F.col("day") < F.lit(cut)).collect()
    ]
    late = [
        (r.event_type, r.cents)
        for r in ev.filter(F.col("day") >= F.lit(cut)).collect()
    ]
    return early, late


def test_psi_second_readout_matches_registry_query(spark, tmp_path, sf_dir):
    """r10-verdict item 6: PSI served off the SAME drained vhist
    state shape as W1 — frozen first-15-days reference, drained
    remainder live — must reproduce the registered dq_psi_drift query
    row-for-row."""
    from automated_agro_climatic_data_warehouse_spark.streaming.wasserstein import (
        psi_between,
    )

    early, late = _psi_halves(spark, sf_dir)
    ref = vhist_merge(spark.createDataFrame(early, SCHEMA), None)
    src = _stage(spark, tmp_path, late, 3, "psi")
    live = vhist_drain(
        spark,
        f"{src}/*",
        str(tmp_path / "state_psi"),
        str(tmp_path / "ckpt_psi"),
    )
    got = {
        r.bucket: (r.p_e6, r.q_e6, r.psi_term_e6)
        for r in psi_between(ref, live).collect()
    }
    exp = {
        r.bucket: (r.p_e6, r.q_e6, r.psi_term_e6)
        for r in QUERIES["dq_psi_drift"].spark_fn(spark, sf_dir).collect()
    }
    assert len(got) == 10
    assert got == exp


def test_one_sided_value_steps_both_ecdfs(spark):
    """A value present only on one side must still widen the gap: ref
    all at 0, live all at 10 -> W1 = 10 cents exactly."""
    ref = vhist_merge(
        spark.createDataFrame([("t", 0)] * 5, SCHEMA), None
    )
    live = vhist_merge(
        spark.createDataFrame([("t", 10)] * 7, SCHEMA), None
    )
    r = w1_between(ref, live).collect()[0]
    assert (r.n1, r.n2, r.w1_e6) == (5, 7, 10_000_000)


def test_one_sided_type_alarms_as_null_not_silence(spark):
    """Monitor completeness (r10 review finding): a type present only
    in the live feed (brand new) or only in the reference (vanished)
    must emit a row with w1_e6 = NULL — never disappear; a two-sided
    type on a single shared value reads 0."""
    ref = vhist_merge(
        spark.createDataFrame(
            [("old", 5)] * 4 + [("both", 3)] * 2, SCHEMA
        ),
        None,
    )
    live = vhist_merge(
        spark.createDataFrame(
            [("new", 7)] * 6 + [("both", 3)] * 5, SCHEMA
        ),
        None,
    )
    got = {
        r.event_type: (r.n1, r.n2, r.w1_e6)
        for r in w1_between(ref, live).collect()
    }
    assert got["new"] == (0, 6, None)
    assert got["old"] == (4, 0, None)
    assert got["both"] == (2, 5, 0)

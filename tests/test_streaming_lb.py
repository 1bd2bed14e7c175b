"""Streaming Ljung-Box: the drained per-day volume state must be
BIT-IDENTICAL to the batch merge over the same rows for ANY
file→micro-batch partitioning (additive calendar-bounded counters),
the drained readout must equal the registered dq_ljung_box query
(one definition), and the drain must be exactly-once per checkpoint.
"""

from __future__ import annotations

import datetime

import pytest

pytestmark = pytest.mark.slow  # multi-minute suite: excluded from the default (driver) tier

from automated_agro_climatic_data_warehouse_spark.operators.quality import (
    lb_daily_merge,
    lb_readout,
)
from automated_agro_climatic_data_warehouse_spark.plans import QUERIES
from automated_agro_climatic_data_warehouse_spark.streaming.ljung_box import (
    lb_drain,
)

SCHEMA = "day date"


def _rows():
    # 14 days with a strong 2-day cadence plus drift — real serial
    # structure so r_k and Q are far from degenerate
    out = []
    for d in range(14):
        day = datetime.date(2024, 1, 1) + datetime.timedelta(days=d)
        count = 30 + (25 if d % 2 == 0 else 0) + d
        out.extend([(day,)] * count)
    return out


def _stage(spark, tmp_path, n_files):
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


def _spectrum(df):
    return [
        (r.lag_k, r.n, round(r.r_k, 12), round(r.q_cum, 9))
        for r in sorted(df.collect(), key=lambda r: r.lag_k)
    ]


@pytest.mark.parametrize("n_files", [1, 4])
def test_stream_state_equals_batch_any_partitioning(
    spark, tmp_path, n_files
):
    src, rows = _stage(spark, tmp_path, n_files)
    state = lb_drain(
        spark,
        f"{src}/*",
        str(tmp_path / f"state{n_files}"),
        str(tmp_path / f"ckpt{n_files}"),
    )
    batch = lb_daily_merge(spark.createDataFrame(rows, SCHEMA), None)
    got = {r.day: r.x for r in state.collect()}
    exp = {r.day: r.x for r in batch.collect()}
    assert got == exp
    assert _spectrum(lb_readout(state)) == _spectrum(lb_readout(batch))


def test_readout_matches_registry_query(spark, sf_dir):
    """Over the real events table, the streamed-operator pipeline IS
    the registered dq_ljung_box query (one definition)."""
    from pyspark.sql import functions as F

    from automated_agro_climatic_data_warehouse_spark.sources import load_table

    obs = load_table(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("day")
    )
    op = _spectrum(lb_readout(lb_daily_merge(obs, None)))
    q = _spectrum(QUERIES["dq_ljung_box"].spark_fn(spark, sf_dir))
    assert op == q
    assert len(q) == 7


def test_redrain_same_checkpoint_is_noop(spark, tmp_path):
    src, _ = _stage(spark, tmp_path, 3)
    args = (
        spark,
        f"{src}/*",
        str(tmp_path / "state_r"),
        str(tmp_path / "ckpt_r"),
    )
    first = {(r.day, r.x) for r in lb_drain(*args).collect()}
    again = {(r.day, r.x) for r in lb_drain(*args).collect()}
    assert first == again

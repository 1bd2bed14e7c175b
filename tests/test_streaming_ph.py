"""Streaming Page-Hinkley: the ordered-fold state drained over
day-ordered daily-rollup files must reproduce the registered batch
query's readout row-for-row, for any day-ordered file chunking, and
the drain must be exactly-once per checkpoint.
"""

from __future__ import annotations

import os
import time

import pytest

pytestmark = pytest.mark.slow  # multi-minute suite: excluded from the default (driver) tier

from automated_agro_climatic_data_warehouse_spark.plans import QUERIES
from automated_agro_climatic_data_warehouse_spark.streaming.page_hinkley import (
    page_hinkley_drain,
    ph_fold,
    ph_readout,
)

SCHEMA = "event_type string, day date, x bigint"


def _daily_rows(spark, sf_dir):
    """The registered query's daily frame, derived from the same
    events table (day-ordered)."""
    from pyspark.sql import functions as F

    from automated_agro_climatic_data_warehouse_spark.sources import load_table

    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
        .orderBy("day", "event_type")
    )
    return [(r.event_type, r.day, r.x) for r in daily.collect()]


def _stage_ordered(spark, tmp_path, rows, n_files):
    """Chunk day-ordered rows into n_files parquet files whose
    modification times preserve day order (the file source drains by
    mtime, matching a daily rollup's arrival order)."""
    src = str(tmp_path / f"src{n_files}")
    per = len(rows) // n_files + 1
    t0 = time.time() - n_files
    for i in range(n_files):
        chunk = rows[i * per : (i + 1) * per]
        if not chunk:
            continue
        path = f"{src}/f{i:03d}"
        spark.createDataFrame(chunk, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(path)
        for f in os.listdir(path):
            os.utime(os.path.join(path, f), (t0 + i, t0 + i))
    return src


def _readout_map(df):
    return {
        r.event_type: (
            r.n_days,
            r.max_ph_q,
            r.n_alarm_days,
            r.first_alarm_day,
        )
        for r in df.collect()
    }


@pytest.mark.parametrize("n_files", [1, 5])
def test_stream_readout_equals_batch_query(spark, tmp_path, sf_dir, n_files):
    rows = _daily_rows(spark, sf_dir)
    src = _stage_ordered(spark, tmp_path, rows, n_files)
    state = page_hinkley_drain(
        spark,
        f"{src}/*",
        str(tmp_path / f"state{n_files}"),
        str(tmp_path / f"ckpt{n_files}"),
    )
    got = _readout_map(ph_readout(state))
    expect = _readout_map(
        QUERIES["dq_page_hinkley"].spark_fn(spark, sf_dir)
    )
    assert got == expect


def test_single_fold_equals_batch_query(spark, sf_dir):
    """One fold over the whole daily frame IS the batch query (the
    operator and the plan share the arithmetic)."""
    rows = _daily_rows(spark, sf_dir)
    df = spark.createDataFrame(rows, SCHEMA)
    got = _readout_map(ph_readout(ph_fold(df, None)))
    expect = _readout_map(
        QUERIES["dq_page_hinkley"].spark_fn(spark, sf_dir)
    )
    assert got == expect


def test_out_of_order_file_fails_loudly(spark, tmp_path, sf_dir):
    """r9 ADVICE: a backfill file whose days precede the state's
    last-folded-day watermark must FAIL the drain (the ordered fold
    would silently corrupt the sequential statistic otherwise)."""
    rows = _daily_rows(spark, sf_dir)[:30]
    late, early = rows[15:], rows[:15]
    src = str(tmp_path / "src_ooo")
    t0 = time.time() - 10
    for i, chunk in enumerate([late, early]):  # later days arrive FIRST
        path = f"{src}/f{i:03d}"
        spark.createDataFrame(chunk, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(path)
        for f in os.listdir(path):
            os.utime(os.path.join(path, f), (t0 + i, t0 + i))
    with pytest.raises(Exception, match="non-increasing day"):
        page_hinkley_drain(
            spark,
            f"{src}/*",
            str(tmp_path / "state_ooo"),
            str(tmp_path / "ckpt_ooo"),
        )


def test_duplicate_day_in_batch_fails_loudly(spark, sf_dir):
    """A re-delivered day under a new batch (same (type, day) twice in
    one fold input) trips the within-batch leg of the same guard."""
    rows = _daily_rows(spark, sf_dir)[:10]
    df = spark.createDataFrame(rows + rows[:1], SCHEMA)
    with pytest.raises(Exception, match="non-increasing day"):
        ph_fold(df, None).collect()


def test_redrain_same_checkpoint_is_noop(spark, tmp_path, sf_dir):
    rows = _daily_rows(spark, sf_dir)[:40]
    src = _stage_ordered(spark, tmp_path, rows, 3)
    args = (
        spark,
        f"{src}/*",
        str(tmp_path / "state_r"),
        str(tmp_path / "ckpt_r"),
    )
    first = _readout_map(ph_readout(page_hinkley_drain(*args)))
    again = _readout_map(ph_readout(page_hinkley_drain(*args)))
    assert first == again

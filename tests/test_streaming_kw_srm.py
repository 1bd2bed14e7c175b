"""Streaming Kruskal-Wallis + SRM monitors: drained states must be
BIT-IDENTICAL to the batch merges for ANY file partitioning, the
drained readouts must equal the registered queries (one definition),
and both drains must be exactly-once per checkpoint.
"""

from __future__ import annotations

import datetime

import pytest

pytestmark = pytest.mark.slow  # multi-minute suite: excluded from the default (driver) tier

from automated_agro_climatic_data_warehouse_spark.operators.quality import (
    kw_histogram_merge,
    kw_readout,
    srm_daily_merge,
    srm_readout,
)
from automated_agro_climatic_data_warehouse_spark.plans import QUERIES
from automated_agro_climatic_data_warehouse_spark.streaming.kruskal_wallis import (
    kw_histogram_drain,
)
from automated_agro_climatic_data_warehouse_spark.streaming.srm import srm_drain

KW_SCHEMA = "grp string, cents bigint"
SRM_SCHEMA = "day date, in_a int"


def _kw_rows():
    # three overlapping shifted distributions with heavy ties
    return [
        (f"g{i % 3}", (i * 7) % 40 + 3 * (i % 3)) for i in range(360)
    ]


def _srm_rows():
    # 10 days; day 7 deliberately skewed (broken assignment)
    out = []
    for d in range(10):
        day = datetime.date(2024, 1, 1) + datetime.timedelta(days=d)
        for i in range(200):
            in_a = i % 2 if d != 7 else (1 if i < 170 else 0)
            out.append((day, in_a))
    return out


def _stage(spark, tmp_path, rows, schema, n_files, tag):
    src = str(tmp_path / f"src_{tag}{n_files}")
    per = [[] for _ in range(n_files)]
    for i, r in enumerate(rows):
        per[i % n_files].append(r)
    for i, chunk in enumerate(per):
        spark.createDataFrame(chunk, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/f{i}")
    return src


def _h_row(df):
    r = df.collect()[0]
    return (r.k, r.n, r.tie_term, round(r.h_stat, 9), round(r.h_adj, 9))


@pytest.mark.parametrize("n_files", [1, 4])
def test_kw_stream_state_equals_batch(spark, tmp_path, n_files):
    rows = _kw_rows()
    src = _stage(spark, tmp_path, rows, KW_SCHEMA, n_files, "kw")
    state = kw_histogram_drain(
        spark,
        f"{src}/*",
        str(tmp_path / f"kwstate{n_files}"),
        str(tmp_path / f"kwckpt{n_files}"),
    )
    batch = kw_histogram_merge(spark.createDataFrame(rows, KW_SCHEMA), None)
    got = {(r.grp, r.cents): r.tg for r in state.collect()}
    exp = {(r.grp, r.cents): r.tg for r in batch.collect()}
    assert got == exp
    assert _h_row(kw_readout(state)) == _h_row(kw_readout(batch))


def test_kw_readout_matches_registry_query(spark, sf_dir):
    from pyspark.sql import functions as F

    from automated_agro_climatic_data_warehouse_spark.sources import load_table

    obs = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.col("event_type").alias("grp"),
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        )
    )
    op = _h_row(kw_readout(kw_histogram_merge(obs, None)))
    q = _h_row(QUERIES["ev_kruskal_wallis"].spark_fn(spark, sf_dir))
    assert op == q


@pytest.mark.parametrize("n_files", [1, 5])
def test_srm_stream_state_equals_batch(spark, tmp_path, n_files):
    rows = _srm_rows()
    src = _stage(spark, tmp_path, rows, SRM_SCHEMA, n_files, "srm")
    state = srm_drain(
        spark,
        f"{src}/*",
        str(tmp_path / f"srmstate{n_files}"),
        str(tmp_path / f"srmckpt{n_files}"),
    )
    batch = srm_daily_merge(spark.createDataFrame(rows, SRM_SCHEMA), None)
    got = {r.day: (r.n_a, r.n_b) for r in state.collect()}
    exp = {r.day: (r.n_a, r.n_b) for r in batch.collect()}
    assert got == exp
    flags = {r.day: r.srm_flag for r in srm_readout(state).collect()}
    # only the deliberately broken day fires
    assert sum(flags.values()) == 1
    assert flags[datetime.date(2024, 1, 8)] == 1


def test_srm_readout_matches_registry_query(spark, sf_dir):
    from pyspark.sql import functions as F

    from automated_agro_climatic_data_warehouse_spark.operators.dedup import (
        hash32,
    )
    from automated_agro_climatic_data_warehouse_spark.sources import load_table

    assigned = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select(
            F.col("ts").cast("date").alias("day"),
            (
                hash32(
                    F.concat(F.lit("ab1:"), F.col("user_id").cast("string"))
                )
                % 2
                == 0
            ).cast("int").alias("in_a"),
        )
    )
    op = {
        r.day: (r.n_a, r.n_b, r.chi2_e6, r.srm_flag)
        for r in srm_readout(srm_daily_merge(assigned, None)).collect()
    }
    q = {
        r.day: (r.n_a, r.n_b, r.chi2_e6, r.srm_flag)
        for r in QUERIES["ev_srm_check"].spark_fn(spark, sf_dir).collect()
    }
    assert op == q


def test_redrain_same_checkpoint_is_noop(spark, tmp_path):
    src = _stage(spark, tmp_path, _srm_rows(), SRM_SCHEMA, 3, "rr")
    args = (
        spark,
        f"{src}/*",
        str(tmp_path / "state_rr"),
        str(tmp_path / "ckpt_rr"),
    )
    first = {(r.day, r.n_a, r.n_b) for r in srm_drain(*args).collect()}
    again = {(r.day, r.n_a, r.n_b) for r in srm_drain(*args).collect()}
    assert first == again

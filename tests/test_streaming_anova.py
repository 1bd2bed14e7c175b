"""Streaming ANOVA: the drained per-group moment state must be
BIT-IDENTICAL to the batch moments over the same rows for ANY
file→micro-batch partitioning (additive merge), the drained F readout
must equal the registered ev_anova_f query (one definition), and the
drain must be exactly-once per checkpoint.
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # multi-minute suite: excluded from the default (driver) tier

from automated_agro_climatic_data_warehouse_spark.operators.quality import (
    anova_f_readout,
    anova_moments_merge,
)
from automated_agro_climatic_data_warehouse_spark.plans import QUERIES
from automated_agro_climatic_data_warehouse_spark.streaming.anova import (
    anova_moments_drain,
)

SCHEMA = "group string, x bigint"


def _rows():
    # three groups with different means and heavy ties
    return [
        (f"g{i % 3}", 100 + (i % 3) * 7 + (i * 13) % 11) for i in range(300)
    ]


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


def _f_row(df):
    r = df.collect()[0]
    return (r.k, r.n, r.ssb_q, r.ssw_q, round(r.f_stat, 9))


@pytest.mark.parametrize("n_files", [1, 4])
def test_stream_state_equals_batch_any_partitioning(spark, tmp_path, n_files):
    src, rows = _stage(spark, tmp_path, n_files)
    state = anova_moments_drain(
        spark,
        f"{src}/*",
        str(tmp_path / f"state{n_files}"),
        str(tmp_path / f"ckpt{n_files}"),
    )
    batch = anova_moments_merge(spark.createDataFrame(rows, SCHEMA), None)
    got = {r.group: (r.n, r.s1, r.s2) for r in state.collect()}
    exp = {r.group: (r.n, r.s1, r.s2) for r in batch.collect()}
    assert got == exp
    assert _f_row(anova_f_readout(state)) == _f_row(anova_f_readout(batch))


def test_readout_matches_registry_query(spark, sf_dir):
    """Over the real events table, the streamed-operator pipeline IS
    the registered ev_anova_f query (one definition)."""
    from pyspark.sql import functions as F

    from automated_agro_climatic_data_warehouse_spark.sources import load_table

    obs = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            F.col("event_type").alias("group"),
            F.round(F.col("value") * 100).cast("bigint").alias("x"),
        )
    )
    op = _f_row(anova_f_readout(anova_moments_merge(obs, None)))
    q = _f_row(QUERIES["ev_anova_f"].spark_fn(spark, sf_dir))
    assert op == q


def test_redrain_same_checkpoint_is_noop(spark, tmp_path):
    src, _ = _stage(spark, tmp_path, 3)
    args = (
        spark,
        f"{src}/*",
        str(tmp_path / "state_r"),
        str(tmp_path / "ckpt_r"),
    )
    first = {
        (r.group, r.n, r.s1, r.s2)
        for r in anova_moments_drain(*args).collect()
    }
    again = {
        (r.group, r.n, r.s1, r.s2)
        for r in anova_moments_drain(*args).collect()
    }
    assert first == again


def _welch_row(df):
    r = df.collect()[0]
    return (
        r.n_a,
        r.n_b,
        round(r.mean_a_cents, 9),
        round(r.mean_b_cents, 9),
        round(r.t_welch, 9),
        round(r.df_welch, 9),
    )


def test_welch_second_readout_of_drained_state(spark, tmp_path):
    """One state, two readouts (r11): the SAME drained ANOVA moment
    state serves the pairwise Welch drill between two groups — the
    streamed Welch must equal the batch welch_readout over the same
    rows, with no new state."""
    from automated_agro_climatic_data_warehouse_spark.streaming.anova import (
        welch_readout,
    )

    src, rows = _stage(spark, tmp_path, 4)
    state = anova_moments_drain(
        spark,
        f"{src}/*",
        str(tmp_path / "state_w"),
        str(tmp_path / "ckpt_w"),
    )
    batch = anova_moments_merge(spark.createDataFrame(rows, SCHEMA), None)
    assert _welch_row(welch_readout(state, "g0", "g2")) == _welch_row(
        welch_readout(batch, "g0", "g2")
    )


def test_welch_readout_matches_registry_query(spark, sf_dir):
    """Over the real events table with the 'ab1:' arm grouping, the
    streamed-operator pipeline IS the registered ev_welch_ttest query
    (one definition)."""
    from pyspark.sql import functions as F

    from automated_agro_climatic_data_warehouse_spark.operators.dedup import (
        hash32,
    )
    from automated_agro_climatic_data_warehouse_spark.operators.quality import (
        welch_readout,
    )
    from automated_agro_climatic_data_warehouse_spark.sources import load_table

    obs = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull() & F.col("value").isNotNull())
        .select(
            F.when(
                hash32(
                    F.concat(F.lit("ab1:"), F.col("user_id").cast("string"))
                )
                % 2
                == 0,
                "A",
            )
            .otherwise("B")
            .alias("group"),
            F.round(F.col("value") * 100).cast("bigint").alias("x"),
        )
    )
    op = _welch_row(welch_readout(anova_moments_merge(obs, None), "A", "B"))
    q = _welch_row(QUERIES["ev_welch_ttest"].spark_fn(spark, sf_dir))
    assert op == q

"""Streaming Mann-Whitney: the drained value-domain histogram state
must be BIT-IDENTICAL to the batch histogram over the same rows for
ANY file→micro-batch partitioning (additive merge), the drained U/z
readout must equal the registered ev_mann_whitney query (one
definition), and the drain must be exactly-once per checkpoint.
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # multi-minute suite: excluded from the default (driver) tier

from automated_agro_climatic_data_warehouse_spark.operators.quality import (
    mw_histogram_merge,
    mw_readout,
)
from automated_agro_climatic_data_warehouse_spark.plans import QUERIES
from automated_agro_climatic_data_warehouse_spark.streaming.mann_whitney import (
    mw_histogram_drain,
)

SCHEMA = "cents bigint, g1 int"


def _rows():
    # two overlapping value distributions with heavy ties: group 1
    # shifted up by 5 cents on a 40-value domain
    return [
        ((i * 7) % 40 + 5 * (i % 2), i % 2) for i in range(400)
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


def _u_row(df):
    r = df.collect()[0]
    return (r.n1, r.n2, r.u1_x2, r.mu_x2, r.tie_term, round(r.z_score, 9))


@pytest.mark.parametrize("n_files", [1, 4])
def test_stream_state_equals_batch_any_partitioning(spark, tmp_path, n_files):
    src, rows = _stage(spark, tmp_path, n_files)
    state = mw_histogram_drain(
        spark,
        f"{src}/*",
        str(tmp_path / f"state{n_files}"),
        str(tmp_path / f"ckpt{n_files}"),
    )
    batch = mw_histogram_merge(spark.createDataFrame(rows, SCHEMA), None)
    got = {r.cents: (r.t, r.t1) for r in state.collect()}
    exp = {r.cents: (r.t, r.t1) for r in batch.collect()}
    assert got == exp
    assert _u_row(mw_readout(state)) == _u_row(mw_readout(batch))


def test_readout_matches_registry_query(spark, sf_dir):
    """Over the real events table, the streamed-operator pipeline IS
    the registered ev_mann_whitney query (one definition)."""
    from pyspark.sql import functions as F

    from automated_agro_climatic_data_warehouse_spark.sources import load_table

    obs = (
        load_table(spark, sf_dir, "events")
        .filter(
            F.col("value").isNotNull()
            & F.col("event_type").isin("purchase", "click")
        )
        .select(
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
            (F.col("event_type") == "purchase").cast("int").alias("g1"),
        )
    )
    op = _u_row(mw_readout(mw_histogram_merge(obs, None)))
    q = _u_row(QUERIES["ev_mann_whitney"].spark_fn(spark, sf_dir))
    assert op == q


def test_rank_arithmetic_tiny_exact(spark):
    """Hand-checked 6-row case: group1 = {3, 5, 5}, group0 = {1, 5, 9}.
    Sorted with midranks: 1→1, 3→2, the three 5s→(3,4,5) midrank 4,
    9→6. R1 = 2 + 4 + 4 = 10 → R1_x2 = 20; U1 = R1 - n1(n1+1)/2 =
    10 - 6 = 4 → u1_x2 = 8; mu_x2 = 2*U_mean*2 = n1*n2 = 9 (doubled
    grid: mu_x2 = n1*n2); ties: one group of 3 → 3^3-3 = 24."""
    rows = [(3, 1), (5, 1), (5, 1), (1, 0), (5, 0), (9, 0)]
    out = mw_readout(
        mw_histogram_merge(spark.createDataFrame(rows, SCHEMA), None)
    ).collect()[0]
    assert (out.n1, out.n2) == (3, 3)
    assert out.u1_x2 == 8
    assert out.mu_x2 == 9
    assert out.tie_term == 24


def test_redrain_same_checkpoint_is_noop(spark, tmp_path):
    src, _ = _stage(spark, tmp_path, 3)
    args = (
        spark,
        f"{src}/*",
        str(tmp_path / "state_r"),
        str(tmp_path / "ckpt_r"),
    )
    first = {
        (r.cents, r.t, r.t1) for r in mw_histogram_drain(*args).collect()
    }
    again = {
        (r.cents, r.t, r.t1) for r in mw_histogram_drain(*args).collect()
    }
    assert first == again

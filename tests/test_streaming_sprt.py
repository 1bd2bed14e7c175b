"""Streaming SPRT: the drained per-arm counters + boundary readout must
equal the batch trace's final day row-for-row (stream ≡ batch), for any
file→micro-batch partitioning; re-draining the same checkpoint replays
nothing (exactly-once).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from automated_agro_climatic_data_warehouse_spark.operators.dedup import hash32
from automated_agro_climatic_data_warehouse_spark.plans import QUERIES
from automated_agro_climatic_data_warehouse_spark.streaming.sprt import (
    sprt_drain,
    sprt_readout,
)

SCHEMA = "arm string, s int"


def _staged(spark, sf_dir, tmp_path, n_files: int):
    """The events table pre-assigned to arms (the ev_ab_test_lift hash)
    and reduced to (arm, success), written as n_files parquet files
    with rows round-robined so every arm straddles every micro-batch."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    rows = (
        ev.select(
            F.when(
                hash32(
                    F.concat(F.lit("ab1:"), F.col("user_id").cast("string"))
                )
                % 2
                == 0,
                "A",
            )
            .otherwise("B")
            .alias("arm"),
            F.when(F.col("event_type") == "purchase", 1)
            .otherwise(0)
            .alias("s"),
        )
        .collect()
    )
    src = str(tmp_path / f"src{n_files}")
    per = [[] for _ in range(n_files)]
    for i, r in enumerate(rows):
        per[i % n_files].append((r.arm, r.s))
    for i, chunk in enumerate(per):
        spark.createDataFrame(chunk, SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/f{i}")
    return src


def _final_batch_rows(spark, sf_dir):
    """The batch trace's last day per arm — what the stream must land on
    after draining everything."""
    trace = QUERIES["ev_sprt_boundary"].spark_fn(spark, sf_dir).collect()
    out = {}
    for r in trace:
        if r.arm not in out or r.day > out[r.arm].day:
            out[r.arm] = r
    return {
        arm: (r.n_cum, r.k_cum, r.llr_q, r.state) for arm, r in out.items()
    }


def test_stream_equals_batch_any_partitioning(spark, sf_dir, tmp_path):
    want = _final_batch_rows(spark, sf_dir)
    for n_files in (1, 4):
        src = _staged(spark, sf_dir, tmp_path, n_files)
        state = sprt_drain(
            spark,
            f"{src}/*",
            SCHEMA,
            str(tmp_path / f"state{n_files}"),
            str(tmp_path / f"ckpt{n_files}"),
            F.col("arm"),
            F.col("s"),
        )
        got = {
            r.arm: (r.n_cum, r.k_cum, r.llr_q, r.state)
            for r in sprt_readout(state).collect()
        }
        assert got == want, f"n_files={n_files}"


def test_redrain_is_exactly_once(spark, sf_dir, tmp_path):
    src = _staged(spark, sf_dir, tmp_path, 2)
    args = (
        spark,
        f"{src}/*",
        SCHEMA,
        str(tmp_path / "state_eo"),
        str(tmp_path / "ckpt_eo"),
        F.col("arm"),
        F.col("s"),
    )
    first = {(r.arm, r.n, r.k) for r in sprt_drain(*args).collect()}
    again = {(r.arm, r.n, r.k) for r in sprt_drain(*args).collect()}
    assert first == again and first

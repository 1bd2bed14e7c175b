"""foreachBatch upsert sink ≡ batch upsert, and exactly-once re-drain.

Two staged micro-batches with overlapping keys: the streamed target must
equal a single batch upsert of (batch1 then batch2), later batch wins on
conflicts; a second drain over the same checkpoint must change nothing.
"""

from __future__ import annotations

import os

import pandas as pd

from automated_agro_climatic_data_warehouse_spark.streaming.sinks import (
    upsert_sink_drain,
)


def _stage(tmp_path, frames):
    stage = tmp_path / "stage"
    stage.mkdir()
    for i, f in enumerate(frames):
        p = stage / f"b{i}.parquet"
        f.to_parquet(p, index=False)
        os.utime(p, (1_000_000 + i, 1_000_000 + i))
    return str(stage)


def test_upsert_sink_equals_batch_and_is_exactly_once(spark, tmp_path):
    b1 = pd.DataFrame(
        {"k": [1, 2, 3], "v": [10.0, 20.0, 30.0], "seq": [1, 1, 1]}
    )
    # batch 2 updates k=2,3 and inserts k=4 (two writers for k=3 within
    # the batch — last-writer-wins must pick the higher seq)
    b2 = pd.DataFrame(
        {"k": [2, 3, 3, 4], "v": [21.0, 31.0, 32.0, 40.0], "seq": [2, 2, 3, 2]}
    )
    stage = _stage(tmp_path, [b1, b2])
    target = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt")

    stream = (
        spark.readStream.schema("k long, v double, seq long")
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(stage)
    )
    out = upsert_sink_drain(
        spark, stream, target, ckpt, keys=["k"], order_by=["seq"]
    )
    got = {r.k: (r.v, r.seq) for r in out.collect()}
    assert got == {1: (10.0, 1), 2: (21.0, 2), 3: (32.0, 3), 4: (40.0, 2)}

    # re-drain with the SAME checkpoint: no new input → target unchanged
    stream2 = (
        spark.readStream.schema("k long, v double, seq long")
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(stage)
    )
    again = upsert_sink_drain(
        spark, stream2, target, ckpt, keys=["k"], order_by=["seq"]
    )
    got2 = {r.k: (r.v, r.seq) for r in again.collect()}
    assert got2 == got

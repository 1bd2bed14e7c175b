"""Custom stateful streaming operators (applyInPandasWithState) must
carry state across micro-batches: the idempotency-key dedup stream emits
each key exactly once over all batches, and the stateful sessionizer's
closed sessions equal an independent batch computation (pandas twin).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd

from automated_agro_climatic_data_warehouse_spark.streaming.stateful import (
    stateful_dedup_stream,
    stateful_sessionize_stream,
)

_GAP_US = 30 * 60 * 1_000_000


def _events_pdf(sf_dir: str) -> pd.DataFrame:
    pdf = pd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )
    # pandas 2 preserves the parquet unit (datetime64[us] for the current
    # testdata, [ns] for round-1's); force ns BEFORE the int64 view so the
    # stream's nanos-as-long contract holds under either encoding
    pdf["ts"] = pdf["ts"].astype("datetime64[ns]").astype("int64")
    return pdf


def _stage(tmp_path, frames: list[pd.DataFrame]) -> str:
    stage = tmp_path / "stage"
    stage.mkdir()
    for i, f in enumerate(frames):
        p = stage / f"b{i}.parquet"
        f.to_parquet(p, index=False)
        # FileStreamSource orders files by mtime; pin the batch order
        os.utime(p, (1_000_000 + i, 1_000_000 + i))
    return str(stage)


def test_stateful_dedup_across_batches(spark, sf_dir, tmp_path):
    pdf = _events_pdf(sf_dir)
    keys = pdf["event_id"].map(
        lambda e: hashlib.md5(f"event:{e}".encode()).hexdigest()
    )
    b1 = pd.DataFrame({"key_hash": keys, "event_id": pdf["event_id"]})
    replayed = b1[b1["event_id"] % 5 == 0]
    fresh = pd.DataFrame(
        {"key_hash": [f"fresh:{i}" for i in range(7)], "event_id": range(7)}
    )
    # batch 2 = replays (duplicated twice → also exercises within-batch
    # suppression) + brand-new keys (state must still admit first sights)
    b2 = pd.concat([replayed, replayed, fresh], ignore_index=True)
    stage = _stage(tmp_path, [b1, b2])

    out, batches = stateful_dedup_stream(spark, stage, str(tmp_path / "ckpt"))
    got = [r.key_hash for r in out.collect()]
    want = set(b1["key_hash"]) | set(fresh["key_hash"])
    assert batches >= 2
    assert len(got) == len(want)  # exactly-once: no key emitted twice
    assert set(got) == want


def test_stateful_sessionize_equals_batch_twin(spark, sf_dir, tmp_path):
    pdf = _events_pdf(sf_dir)[["user_id", "ts"]].sort_values("ts")
    half = len(pdf) // 2
    stage = _stage(tmp_path, [pdf.iloc[:half], pdf.iloc[half:]])

    out, batches = stateful_sessionize_stream(
        spark, stage, str(tmp_path / "ckpt")
    )
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in out.collect()
    }

    # independent twin: per-user gap segmentation in pandas, dropping each
    # user's LAST session (it is still open in the stream's state)
    want = set()
    for uid, g in pdf.assign(us=pdf["ts"] // 1000).groupby("user_id"):
        us = np.sort(g["us"].to_numpy())
        segs = np.split(us, np.where(np.diff(us) > _GAP_US)[0] + 1)
        for seg in segs[:-1]:
            want.add((int(uid), int(seg[0]), int(seg[-1]), int(len(seg))))

    assert batches >= 2
    assert len(want) > 0
    assert got == want


def test_watermark_drops_late_events(spark, tmp_path):
    """Events arriving after the watermark passed their window must be
    dropped. Watermark visibility lags: the value computed from batch N's
    data governs EVICTION in batch N+1 but late-row FILTERING only from
    batch N+2 (measured on 4.1; the metrics trace is in the git history).
    Hence four batches: on-time events, a watermark advancer (T+3h), a
    spacer, then the late replay — by which point the hour-0 window has
    been emitted with the on-time count and its late rows must be
    discarded (a re-emit would violate append mode downstream)."""
    from automated_agro_climatic_data_warehouse_spark.streaming.stateful import (
        watermarked_hourly_counts,
    )

    base_ns = 1_700_000_000 * 1_000_000_000  # stable epoch, ns
    hour_ns = 3_600 * 1_000_000_000
    minute_ns = 60_000_000_000
    # batch 0: 5 events in hour 0
    b0 = pd.DataFrame(
        {
            "user_id": [1, 1, 2, 2, 3],
            "ts": [base_ns + i * minute_ns for i in range(5)],
        }
    )
    # batch 1: watermark advancer at T+3h (watermark → T+2h)
    b1 = pd.DataFrame({"user_id": [9], "ts": [base_ns + 3 * hour_ns]})
    # batch 2: spacer — hour-0 evicts/emits here with count 5
    b2 = pd.DataFrame(
        {"user_id": [8], "ts": [base_ns + 3 * hour_ns + 10 * minute_ns]}
    )
    # batch 3: 4 LATE events back in hour 0 — all must be dropped
    b3 = pd.DataFrame(
        {
            "user_id": [5, 5, 6, 7],
            "ts": [base_ns + (10 + i) * minute_ns for i in range(4)],
        }
    )
    stage = _stage(tmp_path, [b0, b1, b2, b3])
    out, batches = watermarked_hourly_counts(
        spark, stage, str(tmp_path / "ckpt")
    )
    counts = [r.n_events for r in out.collect()]
    assert batches >= 4
    assert counts == [5], f"late events not dropped cleanly: {counts}"


def test_watermarked_dedup_bounded_state(spark, tmp_path):
    """dropDuplicatesWithinWatermark must (a) suppress a duplicate key
    arriving while its state is live, and (b) RE-emit the key after the
    watermark evicted its state — the bounded-state contract that lets
    an infinite stream dedup in finite memory. Same 4-batch choreography
    as the hourly-counts test (watermark visibility lags one batch for
    eviction, two for filtering)."""
    from automated_agro_climatic_data_warehouse_spark.streaming.stateful import (
        watermarked_dedup_stream,
    )

    base_ns = 1_700_000_000 * 1_000_000_000
    hour_ns = 3_600 * 1_000_000_000
    minute_ns = 60_000_000_000
    # batch 0: A, B on-time; batch 1: duplicate A (state live → dropped)
    # plus advancer C at T+3h; batch 2: spacer D (eviction applies);
    # batch 3: A again at T+3h20m — state evicted → re-emitted.
    b0 = pd.DataFrame(
        {"key": ["A", "B"], "ts": [base_ns, base_ns + minute_ns]}
    )
    b1 = pd.DataFrame(
        {
            "key": ["A", "C"],
            "ts": [base_ns + 2 * minute_ns, base_ns + 3 * hour_ns],
        }
    )
    b2 = pd.DataFrame(
        {"key": ["D"], "ts": [base_ns + 3 * hour_ns + 10 * minute_ns]}
    )
    b3 = pd.DataFrame(
        {"key": ["A"], "ts": [base_ns + 3 * hour_ns + 20 * minute_ns]}
    )
    stage = _stage(tmp_path, [b0, b1, b2, b3])
    out, batches = watermarked_dedup_stream(
        spark, stage, str(tmp_path / "ckpt")
    )
    got = sorted(r.key for r in out.collect())
    assert batches >= 4
    assert got == ["A", "A", "B", "C", "D"], got


def test_state_v2_running_spend_equals_batch(spark, sf_dir, tmp_path):
    """transformWithStateInPandas (State API v2): the per-user running
    feature aggregate, drained in 3 micro-batches, must carry its
    ValueState across batch boundaries — each user's LAST emission
    equals an independent batch aggregation of all staged rows, and a
    user split across batches must appear in multiple emissions with
    increasing counts.

    The v2 state protocol speaks protobuf between the JVM and the
    Python driver worker (pyspark/sql/streaming/proto/StateMessage_pb2);
    where the container ships no google.protobuf (this one),
    running_spend_stream drains the identical-contract
    applyInPandasWithState twin instead (streaming/state_v2.py), so
    this equivalence test runs green on BOTH paths — the operator's
    emission contract is pinned regardless of which engine API backs
    it."""
    from automated_agro_climatic_data_warehouse_spark.streaming.state_v2 import (
        running_spend_stream,
    )

    pdf = pd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "value"]
    )
    pdf["value_q"] = (
        np.sign(pdf["value"]) * np.floor(np.abs(pdf["value"]) * (1 << 20) + 0.5)
    ).astype("int64")
    pdf = pdf[["user_id", "value_q"]]
    third = len(pdf) // 3
    stage = _stage(
        tmp_path, [pdf.iloc[:third], pdf.iloc[third : 2 * third], pdf.iloc[2 * third :]]
    )
    out, batches = running_spend_stream(spark, stage, str(tmp_path / "ckpt"))
    assert batches == 3
    rows = out.toPandas()
    last = rows.sort_values("n_events").groupby("user_id").tail(1)
    got = {
        int(r.user_id): (int(r.n_events), int(r.total_q))
        for r in last.itertuples()
    }
    want = {
        int(u): (int(len(g)), int(g["value_q"].sum()))
        for u, g in pdf.groupby("user_id")
    }
    assert got == want
    # cross-batch state: at least one user was updated in several batches
    multi = rows.groupby("user_id").size()
    assert (multi > 1).any()

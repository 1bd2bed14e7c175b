"""Structured Streaming availableNow wrapper must produce exactly the
batch result (streaming-at-rest equivalence, SURVEY §2.10)."""

from __future__ import annotations

import tempfile

from automated_agro_climatic_data_warehouse_spark.plans import QUERIES
from automated_agro_climatic_data_warehouse_spark.streaming import streaming_tumbling_hourly


def test_streaming_equals_batch(spark, sf_dir):
    batch = QUERIES["ev_tumbling_hourly"].spark_fn(spark, sf_dir)
    with tempfile.TemporaryDirectory() as ckpt:
        stream = streaming_tumbling_hourly(spark, sf_dir, ckpt)
        b = {tuple(r) for r in batch.collect()}
        s = {tuple(r) for r in stream.collect()}
        assert b == s and len(b) > 0


def test_streaming_session_window_equals_batch(spark, sf_dir):
    """The native session_window operator must produce identical session
    rows in batch and availableNow-streaming execution — same physical
    operator (MergingSessions), same results."""
    import tempfile

    from automated_agro_climatic_data_warehouse_spark.plans import QUERIES
    from automated_agro_climatic_data_warehouse_spark.streaming.windows import (
        streaming_session_window,
    )

    batch = QUERIES["ev_session_window_native"].spark_fn(spark, sf_dir)
    with tempfile.TemporaryDirectory() as ckpt:
        stream = streaming_session_window(spark, sf_dir, ckpt)
        b = {tuple(r) for r in batch.collect()}
        s = {tuple(r) for r in stream.collect()}
        assert b == s and len(b) > 0


def test_streaming_sliding_equals_batch(spark, sf_dir):
    """Sliding windows (3h span / 1h slide) must produce identical rows
    in batch and availableNow-streaming execution — same F.window
    expansion, window-finalizing watermark notwithstanding (the
    at-rest drain sees all data, so no window is dropped)."""
    import tempfile

    from automated_agro_climatic_data_warehouse_spark.plans import QUERIES
    from automated_agro_climatic_data_warehouse_spark.streaming.windows import (
        streaming_sliding_3h,
    )

    batch = QUERIES["ev_sliding_3h_counts"].spark_fn(spark, sf_dir)
    with tempfile.TemporaryDirectory() as ckpt:
        stream = streaming_sliding_3h(spark, sf_dir, ckpt)
        b = {tuple(r) for r in batch.collect()}
        s = {tuple(r) for r in stream.collect()}
        assert b == s and len(b) > 0

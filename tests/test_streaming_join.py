"""Stream-stream join ≡ batch twin.

The watermarked purchase←click attribution join, drained availableNow
over the events parquet, must produce exactly the pair set of the batch
`ev_purchase_attribution` query (which itself is DuckDB-oracle-checked).
A second drain over the same checkpoint must be a no-op (exactly-once).
"""

from __future__ import annotations

import tempfile

from automated_agro_climatic_data_warehouse_spark.plans import QUERIES
from automated_agro_climatic_data_warehouse_spark.streaming.joins import (
    streaming_purchase_attribution,
)

SF = "/root/testdata/sf0.001"


def test_stream_stream_join_equals_batch(spark):
    batch = {
        tuple(r)
        for r in QUERIES["ev_purchase_attribution"].spark_fn(spark, SF).collect()
    }
    assert batch, "batch twin returned no pairs"
    with tempfile.TemporaryDirectory() as ckpt:
        stream = {
            tuple(r)
            for r in streaming_purchase_attribution(spark, SF, ckpt).collect()
        }
        assert stream == batch


def test_stream_stream_join_rerun_is_noop(spark):
    """Parquet-sink drain twice over one checkpoint: the second run must
    add zero rows (exactly-once recovery; memory sinks cannot recover)."""
    with tempfile.TemporaryDirectory() as ckpt:
        out = f"{ckpt}/out"
        first = streaming_purchase_attribution(spark, SF, ckpt, output_dir=out)
        n1 = first.count()
        assert n1 > 0
        again = streaming_purchase_attribution(spark, SF, ckpt, output_dir=out)
        assert again.count() == n1, "re-drain emitted duplicate rows"


def test_stream_stream_left_outer_emits_unmatched_after_watermark(spark):
    """Left-outer stream-stream join: purchases with no qualifying
    click emit a null-click row ONCE the watermark passes them. For
    purchases old enough that the watermark provably passed (older than
    end-of-stream minus delay+window), the emitted set must equal the
    batch left-anti complement; younger unmatched purchases may stay
    buffered (documented eviction semantics)."""
    import pyspark.sql.functions as F

    from automated_agro_climatic_data_warehouse_spark.sources import load_table
    from automated_agro_climatic_data_warehouse_spark.streaming.joins import (
        streaming_purchase_attribution_outer,
    )

    with tempfile.TemporaryDirectory() as ckpt:
        out = streaming_purchase_attribution_outer(spark, SF, ckpt)
        got_matched = {
            (r.purchase_id, r.click_id)
            for r in out.filter(F.col("click_id").isNotNull()).collect()
        }
        got_unmatched = {
            r.purchase_id
            for r in out.filter(F.col("click_id").isNull()).collect()
        }

    batch_pairs = {
        (r.purchase_id, r.click_id)
        for r in QUERIES["ev_purchase_attribution"].spark_fn(spark, SF).collect()
    }
    # inner matches must be identical to the batch twin
    assert got_matched == batch_pairs

    ev = load_table(spark, SF, "events")
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    import datetime

    horizon = max_ts - datetime.timedelta(hours=25)  # delay 1h + window 24h
    matched_ids = {p for p, _ in batch_pairs}
    old_unmatched = {
        r.event_id
        for r in ev.filter(
            (F.col("event_type") == "purchase") & (F.col("ts") < horizon)
        ).collect()
        if r.event_id not in matched_ids
    }
    # every old-enough organic purchase was emitted with a null click
    assert old_unmatched <= got_unmatched
    # and nothing emitted as unmatched actually had a match
    assert not (got_unmatched & matched_ids)

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

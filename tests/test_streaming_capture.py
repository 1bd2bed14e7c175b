"""Streaming capture-recapture: the drained per-source counter state
must be BIT-IDENTICAL to the batch query over the same rows for ANY
file→micro-batch partitioning (additive merge: commutative +
associative), and the drain must be exactly-once per checkpoint.
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # multi-minute suite: excluded from the default (driver) tier

from automated_agro_climatic_data_warehouse_spark.plans import QUERIES
from automated_agro_climatic_data_warehouse_spark.streaming.capture_recapture import (
    capture_estimate,
    capture_recapture_drain,
)

SCHEMA = "doc_id long, source string"


def _rows():
    # deterministic multi-source ids; same id space the hash gates see
    return [(i, f"src{i % 3}") for i in range(300)]


def _stage(spark, tmp_path, n_files: int):
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


@pytest.mark.parametrize("n_files", [1, 4])
def test_stream_state_equals_batch_any_partitioning(spark, tmp_path, n_files):
    src, rows = _stage(spark, tmp_path, n_files)
    state = capture_recapture_drain(
        spark,
        f"{src}/*",
        SCHEMA,
        str(tmp_path / f"state{n_files}"),
        str(tmp_path / f"ckpt{n_files}"),
    )
    got = {
        r.source: (r.n_true, r.n1, r.n2, r.m, r.est_chapman)
        for r in capture_estimate(state).collect()
    }
    # batch reference: the registered query's arithmetic applied to the
    # same staged frame via a direct batch groupBy
    from automated_agro_climatic_data_warehouse_spark.streaming.capture_recapture import (
        _capture_merge,
    )

    batch = _capture_merge(
        spark.createDataFrame(rows, SCHEMA), None, "doc_id", "source"
    )
    expect = {
        r.source: (r.n_true, r.n1, r.n2, r.m, r.est_chapman)
        for r in capture_estimate(batch).collect()
    }
    assert got == expect
    assert sum(v[0] for v in got.values()) == 300


def test_estimator_matches_registry_query(spark, sf_dir):
    """Over the real documents table, the streamed-operator arithmetic
    IS the registered dq_capture_recapture query (one definition)."""
    from automated_agro_climatic_data_warehouse_spark.streaming.capture_recapture import (
        _capture_merge,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    op = {
        r.source: (r.n_true, r.n1, r.n2, r.m, r.est_chapman)
        for r in capture_estimate(
            _capture_merge(docs, None, "doc_id", "source")
        ).collect()
    }
    q = {
        r.source: (r.n_true, r.n1, r.n2, r.m, r.est_chapman)
        for r in QUERIES["dq_capture_recapture"].spark_fn(spark, sf_dir).collect()
    }
    assert op == q


def test_redrain_same_checkpoint_is_noop(spark, tmp_path):
    src, _ = _stage(spark, tmp_path, 3)
    args = (
        spark,
        f"{src}/*",
        SCHEMA,
        str(tmp_path / "state_r"),
        str(tmp_path / "ckpt_r"),
    )
    first = {
        (r.source, r.n_true, r.m)
        for r in capture_recapture_drain(*args).collect()
    }
    again = {
        (r.source, r.n_true, r.m)
        for r in capture_recapture_drain(*args).collect()
    }
    assert first == again

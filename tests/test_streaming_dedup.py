"""Streaming ingest-dedup gate: order-independent correctness contract
plus exactly-once re-drain.

The corpus plants near-dup pairs across micro-batch boundaries (a dup
of a batch-0 doc arrives in batch 2) and within one batch. Whatever
the file→batch partitioning, the accepted set must satisfy the greedy
maximal-independent-set contract of sequential dedup:

  (a) no two accepted docs are near-dups of each other,
  (b) every rejected doc near-duplicates some accepted doc.

Both are checked with the BATCH LSH operator over the final state —
the streaming gate is validated by the batch semantics it must embed.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from automated_agro_climatic_data_warehouse_spark.operators.dedup import minhash_lsh_dedup
from automated_agro_climatic_data_warehouse_spark.streaming.ingest_dedup import (
    dedup_ingest_drain,
)

SCHEMA = "doc_id long, text string"


def _corpus():
    base = [
        "the quick brown fox jumps over the lazy dog near the river bank",
        "distributed query engines shuffle data between executors on keys",
        "minhash signatures approximate jaccard similarity of shingle sets",
        "structured streaming processes micro batches with exactly once sinks",
        "column pruning and predicate pushdown reach the parquet scan layer",
        "broadcast joins avoid shuffling the large fact table across nodes",
    ]
    rows = [(i, t) for i, t in enumerate(base)]
    # near-dups: same text + short tail marker, landing in LATER files
    rows += [
        (100, base[0] + " extra tail"),
        (101, base[1] + " extra tail"),
        (102, base[2] + " extra tail"),
        # within-batch dup pair (103 dups 104's base written same file)
        (103, base[3] + " tail one"),
    ]
    return rows


@pytest.fixture()
def staged(spark, tmp_path):
    rows = _corpus()
    src = str(tmp_path / "src")
    # three files: originals 0-2 | originals 3-5 + dup 103 | dups 100-102
    groups = [
        [r for r in rows if r[0] in (0, 1, 2)],
        [r for r in rows if r[0] in (3, 4, 5, 103)],
        [r for r in rows if r[0] in (100, 101, 102)],
    ]
    for i, g in enumerate(groups):
        spark.createDataFrame(g, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    return src, rows


def test_streaming_dedup_gate_contract(spark, tmp_path, staged):
    src, rows = staged
    accepted_dir = str(tmp_path / "accepted")
    ckpt = str(tmp_path / "ckpt")
    accepted = dedup_ingest_drain(
        spark, src, SCHEMA, accepted_dir, ckpt, max_files_per_trigger=1
    )
    acc_ids = {r.doc_id for r in accepted.select("doc_id").collect()}
    all_ids = {i for i, _ in rows}
    rej_ids = all_ids - acc_ids
    assert rej_ids, "the planted dups must reject something"
    # all six distinct base docs survive in some representative
    full = spark.createDataFrame(rows, SCHEMA)
    pairs = minhash_lsh_dedup(full, threshold=0.6).collect()
    dup_of = {}
    for p in pairs:
        dup_of.setdefault(p.doc_a, set()).add(p.doc_b)
        dup_of.setdefault(p.doc_b, set()).add(p.doc_a)
    # (a) accepted set is near-dup-free
    for a in acc_ids:
        assert not (dup_of.get(a, set()) & acc_ids), (
            f"accepted {a} near-duplicates accepted "
            f"{dup_of[a] & acc_ids}"
        )
    # (b) every rejection is justified by an accepted near-dup
    for r in rej_ids:
        assert dup_of.get(r, set()) & acc_ids, (
            f"rejected {r} has no accepted near-dup"
        )


def test_streaming_dedup_redrain_is_noop(spark, tmp_path, staged):
    src, _ = staged
    accepted_dir = str(tmp_path / "accepted")
    ckpt = str(tmp_path / "ckpt")
    first = dedup_ingest_drain(
        spark, src, SCHEMA, accepted_dir, ckpt, max_files_per_trigger=1
    )
    n1 = first.count()
    again = dedup_ingest_drain(
        spark, src, SCHEMA, accepted_dir, ckpt, max_files_per_trigger=1
    )
    assert again.count() == n1, "re-drain over the same checkpoint appended"

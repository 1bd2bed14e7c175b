"""Invariants for ts_seq_packing and ts_source_mix.

Packing must conserve tokens (every doc lands in exactly one sequence),
fill sequences to the 2048-token boundary (all but each bucket's last
sequence span the full window), and be BYTE-IDENTICAL regardless of how
the input happened to be partitioned — the property that makes the
assignment auditable and re-runnable at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from automated_agro_climatic_data_warehouse_spark.plans import QUERIES
from automated_agro_climatic_data_warehouse_spark.sources import load_table

SF = "/root/testdata/sf0.001"
SEQ = 2048


def test_packing_conserves_docs_and_tokens(spark):
    docs = load_table(spark, SF, "documents")
    wc = F.size(F.split(F.trim(F.col("text")), "\\s+"))
    want = docs.select(
        F.count(F.lit(1)).alias("n"), F.sum(wc).alias("toks")
    ).collect()[0]
    got = (
        QUERIES["ts_seq_packing"].spark_fn(spark, SF)
        .select(F.sum("n_docs").alias("n"), F.sum("n_tokens").alias("toks"))
        .collect()[0]
    )
    assert (got["n"], got["toks"]) == (want["n"], want["toks"])


def test_packing_sequences_are_dense(spark):
    """Within a bucket, sequence ids are contiguous from 0 and every
    non-final sequence's doc set spans its 2048-token window (the greedy
    stream never leaves a hole)."""
    rows = QUERIES["ts_seq_packing"].spark_fn(spark, SF).collect()
    by_bucket: dict[int, list] = {}
    for r in rows:
        by_bucket.setdefault(r["bucket"], []).append(r)
    assert by_bucket, "no output"
    for bucket, seqs in by_bucket.items():
        ids = sorted(s["seq_id"] for s in seqs)
        assert ids == list(range(len(ids))), f"bucket {bucket} gaps: {ids}"
        # all but the last sequence must carry >= one full window of
        # tokens minus what the next doc straddles — i.e. each non-final
        # sequence ends only because the boundary was crossed, so its
        # cumulative span reaches the window edge
        total = sum(s["n_tokens"] for s in seqs)
        assert total >= SEQ * (len(ids) - 1), f"bucket {bucket} underfilled"


def test_packing_stable_under_repartition(spark):
    """The same corpus under a different physical layout (different
    shuffle-partition count → different task boundaries for the window)
    must produce the identical (bucket, seq_id, n_docs, n_tokens) set."""
    base = {
        tuple(r) for r in QUERIES["ts_seq_packing"].spark_fn(spark, SF).collect()
    }
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        again = {
            tuple(r)
            for r in QUERIES["ts_seq_packing"].spark_fn(spark, SF).collect()
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert base == again


def test_source_mix_rates_bounded(spark):
    rows = QUERIES["ts_source_mix"].spark_fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["dup_rate"] < 1.0
        assert r["n_distinct_texts"] <= r["n_docs"]
        assert r["n_tokens"] > 0

"""Streaming quantiles via an EXACTLY-mergeable fixed-grid histogram.

Percentile monitoring on a stream (p50/p99 latency, value
distributions) cannot keep history; the classic answer is a mergeable
sketch. This module uses the simplest sketch whose merge is EXACT
rather than approximate: a fixed-resolution value-grid histogram —
state is one count per occupied bin (bin = floor(value / width)),
and merging any partitioning of the stream is a groupBy-sum, so the
final state is bit-identical to the batch histogram of the whole data
REGARDLESS of micro-batch boundaries (pinned stream ≡ batch in
tests/test_streaming_quantiles.py — a determinism guarantee stronger
than KLL/t-digest, whose state depends on arrival order).

Quantile readout from the histogram brackets the true quantile within
one bin width: for quantile q over n values, find the first bin whose
cumulative count reaches ceil(q·n); the true q-quantile lies in
[bin·width, (bin+1)·width). The readout emits both bounds — honest
about grid error rather than reporting a point estimate, which is the
right contract for an alerting pipeline (alert when the LOWER bound
crosses the SLO).

State discipline is streaming/heavy_hitters.py's committed-chain:
each micro-batch merges against the newest committed predecessor and
commits to a `state-<token>-<batch_id>` _SUCCESS-marked subdir
(skip-if-committed, overwrite-on-crash-replay) — structurally
exactly-once under foreachBatch's at-least-once replays.

Scale: state is bounded by the OCCUPIED value domain / width, never by
the stream (pick width so domain/width ≈ 10³-10⁶ bins; bins are
uniform shuffle keys). At 100 TB/day the same body rides Kafka; the
readout is a bins-sized sort-free cumulative window over a tiny frame.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def _committed_states(state_dir: str) -> list[tuple[int, str]]:
    if not os.path.isdir(state_dir):
        return []
    out: list[tuple[int, str]] = []
    for name in os.listdir(state_dir):
        p = os.path.join(state_dir, name)
        if (
            os.path.isdir(p)
            and name.startswith("state-")
            and os.path.isfile(os.path.join(p, "_SUCCESS"))
        ):
            out.append((int(name.rsplit("-", 1)[1]), p))
    return sorted(out)


def grid_histogram(df: DataFrame, value_col: str, width: float) -> DataFrame:
    """(bin, c): exact fixed-grid histogram of `value_col` — the batch
    form of the streaming state, and the merge target (groupBy-sum)."""
    return (
        df.select(
            F.floor(F.col(value_col) / F.lit(width)).cast("bigint").alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )


def grid_merge_batch(
    batch: DataFrame,
    state_dir: str,
    value_col: str,
    width: float,
    batch_id: int,
    token: str,
) -> None:
    """Merge one micro-batch's histogram into the committed state chain.
    Idempotent per (token, batch_id); merge = groupBy-sum, exact under
    any partitioning."""
    out_dir = os.path.join(state_dir, f"state-{token}-{batch_id:06d}")
    if os.path.isfile(os.path.join(out_dir, "_SUCCESS")):
        return
    s = batch.sparkSession
    hist = grid_histogram(batch, value_col, width)
    prev = [(b, p) for b, p in _committed_states(state_dir) if b < batch_id]
    if prev:
        hist = (
            hist.unionByName(s.read.parquet(prev[-1][1]))
            .groupBy("bin")
            .agg(F.sum("c").cast("bigint").alias("c"))
        )
    hist.write.mode("overwrite").parquet(out_dir)


def quantile_bounds(hist: DataFrame, width: float, qs: list[float]) -> DataFrame:
    """(q, lo, hi) per requested quantile: the true q-quantile of the
    sketched data lies in [lo, hi) — one bin width apart. Runs on the
    bins-sized frame: a cumulative window over bins (the state, never
    the data) + one broadcast of the 1-row total."""
    spark = hist.sparkSession
    tot = hist.agg(F.sum("c").cast("bigint").alias("n"))
    cum = hist.withColumn(
        "cum",
        F.sum("c").over(
            W.orderBy("bin").rowsBetween(W.unboundedPreceding, W.currentRow)
        ),
    )
    qdf = spark.createDataFrame([(float(q),) for q in qs], "q double")
    hit = (
        cum.crossJoin(F.broadcast(tot))
        .join(
            F.broadcast(qdf),
            F.col("cum") >= F.ceil(F.col("q") * F.col("n")),
        )
        .groupBy("q")
        .agg(F.min("bin").alias("bin"))
    )
    return hit.select(
        "q",
        (F.col("bin") * F.lit(width)).alias("lo"),
        ((F.col("bin") + 1) * F.lit(width)).alias("hi"),
    )


def grid_quantiles_drain(
    spark: SparkSession,
    src_dir: str,
    schema: str,
    state_dir: str,
    checkpoint_dir: str,
    value_col: str,
    width: float = 1.0,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Drain `src_dir` parquet as an availableNow stream into the grid
    histogram; returns the final (bin, c) state — bit-identical to the
    batch histogram of all drained rows, any partitioning. Feed to
    `quantile_bounds` for the percentile readout."""
    token = hashlib.md5(
        os.path.abspath(checkpoint_dir).encode()
    ).hexdigest()[:8]
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        grid_merge_batch(batch, state_dir, value_col, width, batch_id, token)

    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    states = _committed_states(state_dir)
    if not states:
        return spark.createDataFrame([], "bin long, c long")
    return spark.read.parquet(states[-1][1])

"""Streaming heavy hitters: foreachBatch + mergeable Misra-Gries state.

The batch heavy-hitter query (ts_heavy_hitters) runs MG per partition
and re-verifies candidates exactly; the STREAMING form cannot re-scan
history, so it maintains one durable bounded summary across
micro-batches instead: each batch's exact key counts merge into the
persisted k-counter summary, and when the merged table exceeds k
entries every counter is decremented by the (k+1)-th largest and the
non-positive are dropped — the standard mergeable-summaries MG merge
(Agarwal et al., "Mergeable Summaries", PODS'12), which preserves the
MG guarantee across any batch partitioning:

  every key with true frequency > N/(k+1) survives in the summary,
  and each surviving counter UNDERESTIMATES its true count by at most
  the total decrement (≤ N/(k+1)).

The summary is therefore a candidate set + lower bounds, never exact
counts — exactly the contract of the batch operator's sketch stage
(operators/sketches.mg_candidates); a final exact count of just the
surviving keys upgrades it to exact, same as the batch path.

State discipline mirrors streaming/ingest_dedup.py: each micro-batch
commits its post-merge summary to a `state-<drain-token>-<batch_id>`
subdir (_SUCCESS-marked, overwrite-on-replay, skip-if-committed), and
a batch always merges against the newest COMMITTED state with a
smaller batch id — so foreachBatch's at-least-once replay can neither
double-merge a batch nor read a half-written summary. States are k-row
frames; keeping the whole chain is bytes and doubles as an audit
trail of the sketch's evolution.

Every per-batch step is bounded: the merge frame is ≤ k + |batch
distinct keys| rows, so the top-(k+1) threshold window runs on a
bounded frame by construction (this is the ONE place a single-key
window is legitimate — the input is the sketch, not the stream). At
100 TB/day the same foreachBatch body rides a Kafka source unchanged.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def _committed_states(state_dir: str) -> list[tuple[int, str]]:
    """(batch_id, path) of every _SUCCESS-committed state, ascending."""
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


def mg_merge_batch(
    batch: DataFrame,
    state_dir: str,
    key_col: str,
    k: int,
    batch_id: int,
    token: str,
) -> None:
    """Merge one micro-batch's exact key counts into the persisted MG
    summary and commit the result as this batch's state. Idempotent per
    (token, batch_id): replays of a committed id return untouched;
    replays over a crashed half-write recompute from the predecessor
    state and overwrite."""
    out_dir = os.path.join(state_dir, f"state-{token}-{batch_id:06d}")
    if os.path.isfile(os.path.join(out_dir, "_SUCCESS")):
        return
    s = batch.sparkSession
    counts = batch.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    prev = [(bid, p) for bid, p in _committed_states(state_dir) if bid < batch_id]
    if prev:
        state = s.read.parquet(prev[-1][1])
        counts = (
            counts.unionByName(state)
            .groupBy("key")
            .agg(F.sum("c").cast("bigint").alias("c"))
        )
    # MG merge step: subtract the (k+1)-th largest counter (0 if the
    # merged table already fits) from all, keep the strictly positive.
    # The ranking window is unpartitioned BY DESIGN: its input is the
    # bounded sketch frame (≤ k + batch keys), never stream data.
    ranked = counts.withColumn(
        "__rn",
        F.row_number().over(W.orderBy(F.desc("c"), F.asc("key"))),
    )
    m = ranked.filter(F.col("__rn") == k + 1).agg(
        F.coalesce(F.max("c"), F.lit(0)).cast("bigint").alias("m")
    )
    merged = (
        ranked.crossJoin(F.broadcast(m))
        .filter(F.col("c") > F.col("m"))
        .select("key", (F.col("c") - F.col("m")).cast("bigint").alias("c"))
    )
    merged.write.mode("overwrite").parquet(out_dir)


def heavy_hitters_drain(
    spark: SparkSession,
    src_dir: str,
    schema: str,
    state_dir: str,
    checkpoint_dir: str,
    key_col: str,
    k: int = 32,
    max_files_per_trigger: int = 1,
    key_type: str = "long",
) -> DataFrame:
    """Drain `src_dir`'s parquet files as an availableNow stream through
    the MG merge; returns the final summary (key, c) — a guaranteed
    superset of every key with true frequency > N/(k+1), with
    lower-bound counters. Exactly-once per checkpoint: re-draining the
    same checkpoint replays nothing, crash-replays are absorbed by the
    per-batch committed-state chain."""
    token = hashlib.md5(
        os.path.abspath(checkpoint_dir).encode()
    ).hexdigest()[:8]
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )

    def apply_batch(batch: DataFrame, batch_id: int) -> None:
        mg_merge_batch(batch, state_dir, key_col, k, batch_id, token)

    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    states = _committed_states(state_dir)
    if not states:
        return spark.createDataFrame([], f"key {key_type}, c long")
    return spark.read.parquet(states[-1][1])

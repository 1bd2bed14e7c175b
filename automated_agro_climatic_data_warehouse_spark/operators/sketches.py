"""Bounded-state frequency sketches (candidate generation for exact
heavy hitters).

The scale problem: "which tokens exceed x% of a 100 TB corpus" cannot
afford a full groupBy over the vocabulary — the shuffle carries every
distinct token, and web-scale vocabularies are corpus-sized (typos,
numbers, hashes). The classical fix is a two-phase plan: a Misra-Gries
summary per partition (k counters of bounded state, streamed in one
pass, no shuffle) emits a small candidate set with a *superset
guarantee*, and an exact count restricted to candidates (a semi-join
prefilter, so the shuffle carries only candidate occurrences) makes the
final answer exact and partitioning-independent.

Guarantee (standard MG analysis + an averaging argument over
partitions): every decrement event subtracts some m from all counters
while at least k+1 counters are >= m, so the cumulative decrement any
item can absorb in partition p is <= n_p/(k+1); an item with partition
frequency > n_p/(k+1) therefore survives partition p's sketch. If an
item's GLOBAL frequency exceeds total/(k+1), then by averaging some
partition has freq_p > n_p/(k+1), so the union of per-partition sketches
contains every global heavy hitter above that threshold.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StringType, StructField, StructType


def mg_candidates(df: DataFrame, col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries candidate values of ``df[col]``.

    Returns one column ``col``: the union of each partition's surviving
    counters (<= k rows per partition, so <= k * n_partitions total —
    broadcastable). Contains every value whose global frequency exceeds
    ``total/(k+1)``. The sketch contents below that threshold are
    partition-dependent — callers MUST re-verify with an exact count
    (the candidate set is a prefilter, never the answer).

    Arrow-batched: each batch folds in via a vectorized value_counts;
    the decrement step subtracts the (k+1)-th largest counter from all
    and drops the non-positive (the batched form of MG's one-at-a-time
    decrement; same invariant, since the top k+1 counters each absorb
    the full subtraction).
    """
    schema = StructType([StructField(col, StringType())])

    def sketch(batches):
        counters: dict[str, int] = {}
        for pdf in batches:
            for tok, c in pdf[col].value_counts().items():
                counters[tok] = counters.get(tok, 0) + int(c)
            if len(counters) > k:
                m = sorted(counters.values(), reverse=True)[k]
                counters = {t: c - m for t, c in counters.items() if c > m}
        yield pd.DataFrame({col: list(counters.keys())}, dtype=object)

    return df.mapInPandas(sketch, schema)


# --- Count-Min sketch (the point-frequency complement to MG) ---------
#
# CMS is LINEAR in the count vector: cells built from per-key
# aggregates equal cells built row-at-a-time, and two sketches merge by
# cell-wise addition. One definition serves the batch audit
# (plans/events_queries.ev_cms_user_counts) and the streaming drain
# (streaming/cms_state.py) so streamed and batch sketches are
# interchangeable. Hashing is the portable md5 backend
# (operators/dedup.hash32 ↔ the oracle's '0x'||substr(md5) cast).

CMS_DEPTH = 4
CMS_WIDTH = 512


def cms_bucket(key, j):
    """Depth-j bucket of a key (Column in, Column out)."""
    from pyspark.sql import functions as F

    from .dedup import hash32

    return (
        hash32(
            F.concat(
                F.lit("cms"), j.cast("string"), F.lit(":"), key.cast("string")
            )
        )
        % CMS_WIDTH
    )


def cms_cells(df: DataFrame, key) -> DataFrame:
    """The (j, bucket, cell) table of one frame's CMS over ``key`` —
    a fixed <= DEPTH x WIDTH integer relation however large the frame."""
    from pyspark.sql import functions as F

    spark = df.sparkSession
    depths = spark.range(CMS_DEPTH).select(
        F.col("id").cast("int").alias("j")
    )
    per_key = df.groupBy(key.alias("key")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    return (
        per_key.crossJoin(F.broadcast(depths))
        .select(
            "j", cms_bucket(F.col("key"), F.col("j")).alias("bucket"), "c"
        )
        .groupBy("j", "bucket")
        .agg(F.sum("c").cast("bigint").alias("cell"))
    )


def cms_estimate(cells: DataFrame, keys: DataFrame, key_col: str) -> DataFrame:
    """Point estimates for ``keys[key_col]`` against a cell table:
    min over depths of the key's bucket cells (missing cells are 0 —
    an empty cell proves count 0). The cell table broadcasts by
    construction (<= DEPTH x WIDTH rows)."""
    from pyspark.sql import functions as F

    spark = cells.sparkSession
    depths = spark.range(CMS_DEPTH).select(
        F.col("id").cast("int").alias("j")
    )
    probes = (
        keys.select(F.col(key_col).alias("key"))
        .crossJoin(F.broadcast(depths))
        .select(
            "key", "j", cms_bucket(F.col("key"), F.col("j")).alias("bucket")
        )
    )
    return (
        probes.join(F.broadcast(cells), ["j", "bucket"], "left")
        .groupBy("key")
        .agg(
            F.min(F.coalesce(F.col("cell"), F.lit(0)))
            .cast("bigint")
            .alias("cms_est")
        )
    )

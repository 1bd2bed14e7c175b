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

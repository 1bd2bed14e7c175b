"""Pure-Spark upsert emulation (SURVEY §2.1 S11-S13, §2.3 J7).

The reference upserts with `INSERT … ON CONFLICT (keys) DO UPDATE`
(etl/load/postgres_loader.py:65-176) in 1000-row pages over a per-statement
connection. Spark-native: one set-based plan —

    result = resolved_updates ∪ (target ⟕anti updates)

Partial-update semantics (the reference updates only a *subset* of columns
on conflict, e.g. soil updates texture/ph/metadata only,
postgres_loader.py:77-80) are honored via `update_cols`.

Scale notes: both joins shuffle on the upsert key — at 100 TB the target
should be bucketed/partitioned on that key so the anti-join co-locates; the
updates side is typically ≪ target and broadcastable. No per-row RPCs, no
driver-side loops; last-writer-wins within a batch is a window function,
not an ordering assumption.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def _dedupe_last_writer(updates: DataFrame, keys: list[str], order_by: list) -> DataFrame:
    """Within-batch last-writer-wins (reference relies on statement order;
    we make it explicit and deterministic)."""
    w = W.partitionBy(*keys).orderBy(*[F.col(c).desc() if isinstance(c, str) else c for c in order_by])
    return (
        updates.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def upsert(
    target: DataFrame,
    updates: DataFrame,
    keys: list[str],
    update_cols: list[str] | None = None,
    order_by: list | None = None,
) -> DataFrame:
    """ON CONFLICT (keys) DO UPDATE semantics.

    update_cols=None → the whole updates row replaces the target row
    (weather/crop sinks, postgres_loader.py:118-123,154-159).
    update_cols=[...] → only those columns take the update's value; the
    rest keep the target's (soil sink, postgres_loader.py:77-80).
    """
    if order_by:
        updates = _dedupe_last_writer(updates, keys, order_by)
    if update_cols is None:
        untouched = target.join(updates.select(*keys), keys, "left_anti")
        return updates.unionByName(untouched)
    # column-selective merge: matched rows mix update + target columns
    upd = updates.select(
        *[F.col(k).alias(f"__k_{k}") for k in keys],
        *[F.col(c).alias(f"__u_{c}") for c in updates.columns if c not in keys],
    )
    cond = [target[k] == upd[f"__k_{k}"] for k in keys]
    joined = target.join(F.broadcast(upd), cond, "left")
    merged = joined.select(
        *[
            (
                F.coalesce(F.col(f"__u_{c}"), F.col(c)).alias(c)
                if c in update_cols
                else F.col(c)
            )
            for c in target.columns
        ]
    )
    new_rows = updates.join(target.select(*keys), keys, "left_anti")
    return merged.unionByName(new_rows, allowMissingColumns=False)


def insert_if_absent(
    existing_keys: DataFrame, incoming: DataFrame, key_col: str
) -> DataFrame:
    """INSERT … ON CONFLICT DO NOTHING (reference idempotency gate,
    etl/utils/database.py:49-63): rows of `incoming` whose key is not
    already present. The caller appends the result."""
    return incoming.join(
        existing_keys.select(key_col), [key_col], "left_anti"
    )

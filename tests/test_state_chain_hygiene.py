"""State-chain hygiene pins (round-7 ADVICE fixes).

1. commit_state prunes superseded committed states: on-disk usage is
   O(state size), not O(batches × state size), and the prune never
   breaks replay (a committed id is skipped; a crashed later id needs
   only the NEWEST committed predecessor, which the prune keeps).
2. drain_token is 64 bits (16 hex chars) so two drains sharing a
   state_dir cannot plausibly collide and merge chains.
3. hll_distinct_drain's empty-drain frame carries the caller's key
   type (key_type param), matching what a non-empty drain returns.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from automated_agro_climatic_data_warehouse_spark.streaming.state_chain import (
    commit_state,
    committed_states,
    drain_token,
)


def _state_dirs(state_dir: str, token: str) -> list[str]:
    if not os.path.isdir(state_dir):
        return []
    return sorted(
        n for n in os.listdir(state_dir) if n.startswith(f"state-{token}-")
    )


def test_commit_prunes_superseded_states(spark, tmp_path):
    state_dir = str(tmp_path / "state")
    tok = "tokp"

    def build_const(v):
        def build(prev):
            base = spark.createDataFrame([(v,)], "v long")
            if prev is None:
                return base
            return base.unionByName(prev).groupBy().agg(
                F.sum("v").alias("v")
            )

        return build

    commit_state(state_dir, tok, 0, build_const(1), spark)
    commit_state(state_dir, tok, 1, build_const(2), spark)
    commit_state(state_dir, tok, 2, build_const(4), spark)
    # only the newest committed state remains on disk
    assert _state_dirs(state_dir, tok) == [f"state-{tok}-000002"]
    committed = committed_states(state_dir, tok)
    assert [b for b, _ in committed] == [2]
    # and the chain value is the full fold: ((1)+2)+4
    assert spark.read.parquet(committed[-1][1]).collect()[0].v == 7
    # replay of a pruned-predecessor id is still a committed-id skip
    # for ITS OWN id only if that id survives; a replay of batch 1
    # (pruned) recomputes from the newest predecessor < 1 — none left,
    # so it starts fresh, which is fine: foreachBatch never replays a
    # batch older than the last checkpoint-committed one. Pin the real
    # contract instead: replaying the NEWEST id is a no-op.
    commit_state(state_dir, tok, 2, build_const(999), spark)
    assert spark.read.parquet(
        committed_states(state_dir, tok)[-1][1]
    ).collect()[0].v == 7


def test_prune_is_token_scoped(spark, tmp_path):
    state_dir = str(tmp_path / "state2")

    def build(prev):
        return spark.createDataFrame([(1,)], "v long")

    commit_state(state_dir, "tokA", 0, build, spark)
    commit_state(state_dir, "tokB", 5, build, spark)
    commit_state(state_dir, "tokA", 1, build, spark)
    # tokA pruned down to its newest; tokB untouched
    assert _state_dirs(state_dir, "tokA") == ["state-tokA-000001"]
    assert _state_dirs(state_dir, "tokB") == ["state-tokB-000005"]


def test_drain_token_is_64_bits(tmp_path):
    t = drain_token(str(tmp_path / "ckpt"))
    assert len(t) == 16
    int(t, 16)  # hex
    assert t != drain_token(str(tmp_path / "ckpt2"))


def test_hll_empty_drain_carries_key_type(spark, tmp_path):
    from automated_agro_climatic_data_warehouse_spark.streaming.hll_distinct import (
        hll_distinct_drain,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)  # empty source dir -> zero committed batches
    out = hll_distinct_drain(
        spark,
        f"{src}/*",
        "event_id long, user_id long, week bigint",
        str(tmp_path / "state"),
        str(tmp_path / "ckpt"),
        key_col=F.col("week"),
        item_col="user_id",
        key_type="bigint",
    )
    assert dict(out.dtypes)["key"] == "bigint"
    assert out.count() == 0

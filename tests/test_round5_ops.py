"""Round-5 operator pins: the k-step PageRank loop's resumability and
the int8-quantize scale hoist."""

from __future__ import annotations

from pyspark.sql import functions as F

from automated_agro_climatic_data_warehouse_spark.operators.graph import pagerank_loop
from automated_agro_climatic_data_warehouse_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def _edges(spark):
    rows = [(1, -1), (1, -2), (2, -1), (3, -3)]
    sym = rows + [(b, a) for a, b in rows]
    return spark.createDataFrame(sym, "src long, dst long")


def test_pagerank_loop_resumes_bit_identical(spark):
    """k=6 in one run must equal k=3 resumed with 3 more rounds from the
    intermediate (node, r) state — the checkpoint/restart contract that
    makes a long chain operable (any round's output is a valid restart
    state; exact integer arithmetic means no drift)."""
    e = _edges(spark)
    full = {
        (r.node, r.r) for r in pagerank_loop(e, k=6).collect()
    }
    half = pagerank_loop(e, k=3)
    resumed = {
        (r.node, r.r)
        for r in pagerank_loop(e, k=3, init_ranks=half).collect()
    }
    assert full == resumed


def test_pagerank_loop_conserves_teleport_floor(spark):
    """Every rank must stay >= the teleport floor and the total mass must
    stay within the floor-division loss bound of n_nodes * total."""
    e = _edges(spark)
    total = 1 << 20
    out = pagerank_loop(e, k=10, total=total).collect()
    teleport = total * 3 // 20
    assert all(r.r >= teleport for r in out)
    n = len(out)
    mass = sum(r.r for r in out)
    assert mass <= n * total
    # per-round loss is < 1 unit per edge-share + 1 per node; after 10
    # rounds mass cannot collapse below half the teleport-renewed floor
    assert mass > n * teleport


def test_pagerank_k10_plan_has_no_cartesian(spark):
    plan = (
        QUERIES["graph_pagerank_k10"]
        .spark_fn(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

"""Connected components over a pair graph — the last step of the near-dup
dedup family (north-star extension; BASELINE.json: dedup for training-data
pipelines).

MinHash/SimHash emit near-dup PAIRS; an actual dedup purge needs CLUSTERS
(duplicate groups are transitive: A~B, B~C → {A,B,C} is one group keeping
one canonical doc). Components are computed by iterative min-label
propagation:

  label(v) ← min over N(v) ∪ {v} of label(u)

which converges in O(graph diameter) rounds. Near-dup graphs are
shallow — clusters are small cliques/chains — so 3-5 rounds typically
suffice; the loop stops at fixpoint (zero labels changed, a cheap count
aggregate, never a collect of the data itself).

Scale notes (100 TB shape):
- Each round is one shuffle join (adjacency × labels on `nbr`) + one
  groupBy min on `node` — both on uniform id keys, no skew for
  non-pathological dup graphs. A mega-cluster (e.g. an empty-document
  class colliding everywhere) shows up as a hot `nbr` key; exact-dup
  pre-collapse (d2) removes that class before LSH ever runs.
- `localCheckpoint` per round truncates the lineage — without it round k
  replays rounds 1..k-1 (and the plan grows exponentially).
- For adversarial diameters (long chains), swap the propagation loop for
  the alternating large-star/small-star variant, which converges in
  O(log n) rounds; the per-round plan shape (join + min-agg) is identical,
  so the swap is local to this function.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Component label per node: (node, component) where component is the
    smallest node id reachable from `node`. Edges are undirected (either
    orientation accepted); isolated nodes never appear in `edges` and are
    their own components by definition (callers treat absence as identity).
    """
    fwd = edges.select(F.col(src).alias("node"), F.col(dst).alias("nbr"))
    rev = edges.select(F.col(dst).alias("node"), F.col(src).alias("nbr"))
    nodes = fwd.select("node").unionByName(rev.select("node")).distinct()
    self_loops = nodes.select("node", F.col("node").alias("nbr"))
    adj = (
        fwd.unionByName(rev)
        .unionByName(self_loops)
        .distinct()
        .localCheckpoint(eager=True)
    )

    labels = adj.groupBy("node").agg(F.min("nbr").alias("component"))
    labels = labels.localCheckpoint(eager=True)
    for _ in range(max_iter):
        propagated = (
            adj.join(
                labels.select(
                    F.col("node").alias("nbr"), F.col("component").alias("nbr_comp")
                ),
                "nbr",
            )
            .groupBy("node")
            .agg(F.min("nbr_comp").alias("component"))
        )
        propagated = propagated.localCheckpoint(eager=True)
        changed = (
            labels.select("node", F.col("component").alias("old"))
            .join(propagated, "node")
            .filter(F.col("old") != F.col("component"))
            .count()
        )
        labels = propagated
        if changed == 0:
            break
    return labels

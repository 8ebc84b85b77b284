"""Connected components over an edge list — the step that turns
near-duplicate PAIRS into dedup CLUSTERS (keep one doc per component).

Algorithm: iterative min-label propagation (a DataFrame rendering of
the classic large-star/small-star idea). Each node starts labeled
with itself; every round each node takes the minimum label among
itself and its neighbors; converged when no label changes. Rounds
needed = graph diameter (near-dup clusters are tiny and dense, so
2-4 rounds in practice; ``max_iter`` bounds pathological chains).

Scale posture:
- state is one (node, label) row per node; each round is one join
  edges><labels + one min-agg — both keyed shuffles, no collect().
- the convergence check is an AGGREGATE (count of changed labels),
  i.e. one tiny action per round on an intermediate the round already
  computed — not a full result comparison.
- labels are localCheckpoint'ed per round: truncates the lineage that
  would otherwise double per iteration (the classic iterative-Spark
  trap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 10,
) -> DataFrame:
    """(node, component) — component = min node id reachable via
    undirected edges. Nodes appearing only in edges are covered; pass
    isolated nodes separately if they must appear.

    Raises RuntimeError if labels are still changing after
    ``max_iter`` rounds (propagation distance exceeded the budget,
    e.g. a chain longer than max_iter+1 nodes): silently returning
    partially-propagated labels would be WRONG data with no signal —
    callers should raise max_iter for high-diameter graphs."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy(F.col("a").alias("node"))
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("nbr_min", F.col("component"))
                ).alias("component"),
                (
                    F.least(
                        F.col("component"),
                        F.coalesce("nbr_min", F.col("component")),
                    )
                    != F.col("component")
                ).alias("__changed"),
            )
            .localCheckpoint(eager=False)
        )
        changed = new_labels.filter(F.col("__changed")).limit(1).count()
        labels = new_labels.drop("__changed")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge within max_iter={max_iter} "
        f"rounds; the graph's propagation distance exceeds the budget — "
        f"raise max_iter"
    )

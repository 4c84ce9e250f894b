"""Iterative graph operators on DataFrames: connected components.

A dedup pipeline's last step turns near-duplicate PAIRS into CLUSTERS
(keep one representative per component). Spark has no built-in
connected components on DataFrames, so this is the canonical iterative
algorithm: min-label propagation to fixpoint.

Scale notes:
- each iteration is one equi-join + one aggregation (shuffle on node
  id) — no driver-side graph materialization ever;
- ``localCheckpoint()`` truncates the lineage each round, otherwise the
  plan doubles per iteration and the optimizer chokes by iteration ~10;
- convergence needs O(diameter) rounds; near-dup graphs are
  short-diameter (clusters are cliques-ish), so this converges in a
  handful of rounds. For adversarially long chains, swap in the
  large-star/small-star variant — same join/agg building blocks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """Label every node of the undirected graph ``edges`` with the
    minimum node id reachable from it. Returns (node, component)."""
    # materialize the symmetric edge list ONCE — it feeds every
    # iteration's join, and without the checkpoint the full upstream
    # plan (e.g. a Jaccard inverted-index join) re-executes per round
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("u").alias("node")).distinct().withColumn("label", F.col("node"))
    ).localCheckpoint(eager=True)
    for _ in range(max_iter):
        # each node proposes its label to every neighbor; a node's new
        # label is the min of its own and all proposals
        proposals = (
            sym.join(labels, sym.v == labels.node)
            .select(F.col("u").alias("node"), "label")
            .groupBy("node")
            .agg(F.min("label").alias("nbr_min"))
        )
        new_labels = (
            labels.join(proposals, "node", "left_outer")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nbr_min", F.col("label"))).alias(
                    "label"
                ),
            )
        ).localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select("node", F.col("label").alias("component"))

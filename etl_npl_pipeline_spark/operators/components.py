"""Connected components over an edge DataFrame — duplicate-cluster
formation for dedup pipelines (pairs → clusters → keep-one).

Reference parity: the reference's dedup stage emits pairwise
matches; grouping them into clusters is the canonical follow-up
(union-find in a single-node engine). On Spark, union-find's
pointer-chasing doesn't distribute; the equivalent is iterative
hash-min label propagation:

    label(v) <- min(label(v), min over neighbors u of label(u))

repeated until fixpoint. Each round is one shuffle join (edges x
labels) + one shuffle agg (min per node), and converges in
O(component diameter) rounds — near-dup clusters are shallow (a
handful of hops), so 3-6 rounds in practice. ``localCheckpoint``
truncates the plan each round; without it the lineage doubles per
iteration and the driver OOMs planning round ~15 long before the
executors feel anything.

At 1000-executor scale the known failure mode is a giant skewed
component (one hub node in most edges). The GraphFrames/GoogleCC
answer is large-star/small-star rewriting; for dedup clusters
(bounded by LSH candidate caps upstream, see dedup.jaccard_pairs's
max_shingle_freq) hash-min with a round cap is the right
cost/robustness tradeoff — document-similarity graphs here cannot
form deep chains.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """Label every node of the undirected graph with the minimum
    node id reachable from it: ``(node, component)``.

    ``edges`` is consumed as undirected; only nodes appearing in at
    least one edge are labeled (isolated nodes never enter).
    """
    und = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    # One materialization of the edge list reused every round.
    und = und.localCheckpoint(eager=True)
    labels = (
        und.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # neighbor labels flow along edges; min with own label
        msgs = und.join(
            labels, und.v == labels.node
        ).select(F.col("u").alias("node"), "component")
        relaxed = (
            labels.select("node", "component")
            .union(msgs)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        # pointer jump (path halving): component ids are themselves
        # node ids, so chase one hop — label <- label(label). Edge
        # relaxation alone moves the min ONE hop per round (O(diameter)
        # rounds: a 40-node chain would exceed any sane cap); with the
        # jump, convergence is O(log diameter).
        ptr = relaxed.select(
            F.col("node").alias("c_node"), F.col("component").alias("c_comp")
        )
        new_labels = (
            relaxed.join(ptr, relaxed.component == ptr.c_node, "left")
            .select(
                "node",
                F.coalesce("c_comp", "component").alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels

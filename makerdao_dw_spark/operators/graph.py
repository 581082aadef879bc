"""Iterative graph operator: connected components by min-label
propagation (the transitive-closure step of near-dup clustering: LSH
emits PAIRS, but a dup cluster is a component — {a~b, b~c} must elect
ONE canonical doc for {a,b,c}).

Algorithm (large-star/small-star simplified to label propagation):
every node starts labeled with its own id; each round, every node takes
the min label in its neighborhood (including itself); converges in
O(diameter) rounds — O(log n) expected on clustered graphs. Each round
is one join + one groupBy (two shuffles on uniform keys); lineage is cut
with localCheckpoint so the plan doesn't grow across iterations — the
standard Spark pattern for iterative algorithms (same as PageRank).

At 100 TB: candidate-pair graphs are sparse (LSH bounds degree), rounds
are data-parallel, and the loop is driver-side control flow only — no
data ever reaches the driver except the 1-row convergence count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 20
) -> DataFrame:
    """Return (node, component) with component = min node id reachable.

    `edges` is an undirected edge list (each pair once is enough).
    Isolated nodes absent from `edges` are absent from the result —
    left-join the node table afterwards and coalesce to the node id.
    """
    sym = edges.selectExpr(f"{src} AS a", f"{dst} AS b").unionByName(
        edges.selectExpr(f"{dst} AS a", f"{src} AS b")
    )
    sym = sym.distinct().localCheckpoint(eager=True)

    # One-hop min initialization: label = min(self, neighbors). LSH dup
    # clusters are near-cliques, so most components converge here and the
    # loop's first iteration is just the convergence proof.
    labels = (
        sym.groupBy(F.col("a").alias("node"))
        .agg(F.min("b").alias("mn"))
        .select("node", F.least("node", "mn").alias("component"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        # neighbor labels: for each edge (a,b), b's current label offers
        # itself to a; plus every node keeps its own label
        offered = (
            sym.join(labels.withColumnRenamed("node", "b"), "b")
            .select(F.col("a").alias("node"), "component")
            .unionByName(labels)
        )
        new_labels = offered.groupBy("node").agg(F.min("component").alias("component"))
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels

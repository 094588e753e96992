"""Distributed PageRank by message-passing joins — the iterative graph
shape (edge join → per-destination aggregation) that complements
``components.py``'s label propagation and the k-means centroid loop.

Each round: every node sends ``rank/out_degree`` along its edges; a
destination's new rank is ``(1-d)/N + d·(incoming sum)``. The caller
supplies an edge list; for undirected semantics pass both directions.

Scale: one shuffle per iteration (edges join ranks on ``src``, aggregate
on ``dst``). The rank table (O(nodes)) is the iterated state,
``localCheckpoint``-ed each round so iteration i+1's plan does not
replay i — the same lineage-truncation discipline as
``components.py``/k-means. Degrees are computed once. Dangling nodes
(no out-edges) contribute their mass nowhere — standard simplified PR;
pass a symmetrized edge list to avoid them entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iters: int = 3,
) -> DataFrame:
    """(node, rank) after ``iters`` rounds from a uniform start.

    ``edges`` needs columns ``src`` and ``dst``; node ids are whatever
    integral type the caller uses. Nodes = distinct src ∪ dst.
    """
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    n_nodes = nodes.count()  # driver scalar: one number, sizes the teleport
    base = (1.0 - damping) / n_nodes

    ranks = nodes.withColumn("r", F.lit(1.0 / n_nodes)).localCheckpoint(eager=True)
    for _ in range(iters):
        # each edge's message is gridded to the 10⁻¹² lattice and SUMMED
        # AS int64 (r9, the grid-before-argmax discipline applied to an
        # exact-sum): per-message ints are ≤ 10¹² and Σranks ≈ 1, so the
        # int64 fold is exact at ANY scale and partition-order-free —
        # which is what makes the whole iteration engine-portable and
        # lets q103 carry a recursive-CTE oracle. The 0.5·10⁻¹²
        # per-message perturbation is far below PageRank's own
        # iteration tolerance.
        m_int = F.floor(
            F.col("r") / F.col("deg") * F.lit(1e12) + F.lit(0.5)
        ).cast("bigint")
        contribs = (
            edges.join(ranks, edges["src"] == ranks["node"])
            .join(outdeg, "src")
            .select("dst", m_int.alias("m"))
            .groupBy("dst")
            .agg(F.sum("m").alias("msum"))
        )
        ranks = (
            nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce("msum", F.lit(0)).cast("double")
                        / F.lit(1e12)
                    )
                ).alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks

"""k-core decomposition of an undirected edge set — iterative peeling
(Seidman 1983, "Network structure and minimum degree"): repeatedly drop
every vertex whose degree is below k until none remains; what survives
is the k-core, the densest "everyone has ≥ k neighbours" backbone.

On the near-dup graph this separates the dense duplication core (mirror
farms, boilerplate families — every member tied to many others) from
peripheral one-off matches, refining what q44's connected components
(which merge through ANY single edge) and q135's triangles (local
density) each see alone.

Spark shape — the ``operators/components.py`` iteration pattern: each
round is one degree aggregate (map-side combined) + an anti-join of the
edge set against the below-k vertex list, with ``localCheckpoint`` every
round to truncate lineage (edges are O(E); labels-per-round is exactly
what the CC engine already pays). Rounds are bounded by the peel depth
(the degeneracy ordering's layer count — small for dup graphs); a hard
cap raises instead of running away. Nothing is collected: the per-round
convergence probe is a LIMIT-1 emptiness check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kcore(edges: DataFrame, k: int, max_rounds: int = 100) -> DataFrame:
    """Vertices of the k-core of the undirected graph ``edges``
    (columns ``src``, ``dst``; self-loops ignored; duplicate edges
    collapse): returns ``(id, core_degree)`` — each surviving vertex
    with its degree INSIDE the core.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    e = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(max_rounds):
        deg = (
            e.select(F.col("src").alias("id"))
            .unionAll(e.select(F.col("dst").alias("id")))
            .groupBy("id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
        )
        weak = deg.filter(F.col("deg") < k).select("id")
        if weak.limit(1).isEmpty():
            return deg.select("id", F.col("deg").alias("core_degree"))
        e = (
            e.join(weak.withColumnRenamed("id", "src"), "src", "anti")
            .join(weak.withColumnRenamed("id", "dst"), "dst", "anti")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
        if e.limit(1).isEmpty():
            # the k-core is empty — every vertex peeled away
            return e.select(
                F.col("src").alias("id"),
                F.lit(0).cast("bigint").alias("core_degree"),
            )
    raise RuntimeError(
        f"kcore did not converge within {max_rounds} peel rounds "
        "(pathological layering; raise max_rounds)"
    )

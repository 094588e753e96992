"""Greedy k-center coreset selection — the farthest-point data-curation
primitive (Gonzalez 1985, "Clustering to minimize the maximum intercluster
distance": the classic 2-approximation for the k-center objective).

Where SemDeDup (``operators/semdedup.py``) removes the most REDUNDANT
vectors, k-center keeps the most COVERING ones: the greedy sequence
(start point, then repeatedly the vector farthest from everything chosen
so far) is the standard seed for coreset subsampling, active-learning
batch selection, and diverse eval-panel construction.

Spark shape — the repo's iterative-state pattern (kmeans / BPE / logreg):
the ONLY state is the selected-center table (≤ k rows, localCheckpoint
per round to truncate lineage); each round recomputes every vector's
distance-to-nearest-center with one scan over a broadcast of the ≤ k
centers and takes a 1-row argmax (``max_by`` with a (d2, vec_id)
tie-break — deterministic under any partitioning). Nothing corpus-sized
is ever collected, checkpointed, or shuffled: the k rounds cost k scans,
O(k²·n) distance evaluations total — the same budget FAISS spends, just
distributed.

Rows-only for the driver (iterative float refinement, like k-means);
pinned against a numpy mirror with identical start and tie-breaks in
``tests/test_pipeline_ops.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark_streaming_base_spark.functions.vectorops import l2sq
from pyspark_streaming_base_spark.queries._exact import dround


def kcenter_select(emb: DataFrame, k: int) -> DataFrame:
    """The greedy k-center sequence over ``emb`` (vec_id, v):
    ``(rank, vec_id, d2_covered)`` — rank 1..k in selection order;
    ``d2_covered`` is the squared distance that forced the pick (the
    coverage radius² of the first ``rank − 1`` centers; 0 for rank 1).

    Start: the lowest vec_id (seedless, rerun-stable — the quantizer-init
    convention). Ties at equal farthest-distance resolve to the LOWEST
    vec_id via the ``max_by`` struct order ``(d2, −…)`` trick below,
    among NOT-yet-selected vectors only (so exact-duplicate vectors —
    everything at d2 = 0 — are still emitted once each, by id order,
    never as a repeated vec_id). Raises when ``k`` exceeds the corpus
    size rather than padding with repeats.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    first = (
        emb.orderBy("vec_id")
        .limit(1)
        .select(
            F.lit(1).cast("bigint").alias("rank"),
            F.col("vec_id"),
            F.lit(0.0).alias("d2_covered"),
        )
        .localCheckpoint(eager=True)
    )
    centers = first
    for r in range(2, k + 1):
        cent_v = centers.join(emb, "vec_id").select(
            F.col("vec_id").alias("cid"), F.col("v").alias("cv")
        )
        # distance to the NEAREST selected center, then the farthest
        # vector overall; max_by on (d2, -vec_id) makes equal-distance
        # ties pick the lowest id (struct comparison is lexicographic)
        d2min = (
            emb.join(F.broadcast(cent_v))
            # every PAIRWISE distance on the 10⁻⁶ grid before the min/
            # argmax (r9, the mmr_rerank convention): selection then
            # compares bit-identical doubles on every engine, which is
            # what lets q164 carry a recursive-CTE oracle (min of
            # gridded == gridded min — the grid is monotone)
            .select("vec_id", dround(l2sq(F.col("v"), F.col("cv")), 6).alias("d2"))
            .groupBy("vec_id")
            .agg(F.min("d2").alias("d2min"))
            # NEVER re-pick a selected center: once the remaining geometry
            # is exhausted (exact-duplicate vectors, or k > distinct
            # points) every candidate ties at d2min = 0 and the lowest-id
            # tie-break would otherwise resolve to an ALREADY-selected
            # vec_id. Anti-joining the ≤ k selected ids keeps d2=0 picks
            # legal (duplicate VECTORS are distinct rows worth keeping)
            # while making duplicate vec_ids impossible.
            .join(F.broadcast(centers.select("vec_id")), "vec_id", "anti")
        )
        nxt = (
            d2min.agg(
                F.max_by(
                    F.struct("vec_id", "d2min"),
                    F.struct(F.col("d2min"), (-F.col("vec_id")).alias("nid")),
                ).alias("pick")
            )
            .select(
                F.lit(r).cast("bigint").alias("rank"),
                F.col("pick.vec_id").alias("vec_id"),
                F.col("pick.d2min").alias("d2_covered"),
            )
            .localCheckpoint(eager=True)
        )
        pick = nxt.first()
        if pick is None or pick["vec_id"] is None:
            raise ValueError(
                f"k={k} exceeds the corpus size: only {r - 1} vectors available"
            )
        centers = centers.unionByName(nxt).localCheckpoint(eager=True)
    return centers

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

from typing import Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: The message grid shared with q103's oracle: every edge message is
#: floor(r/deg · 1e12 + 0.5) and per-node folds sum those int64s, so a
#: round is bit-deterministic under any partitioning on both engines.
GRID = 1e12

#: Finer message grid for the CONVERGED variant (no DuckDB oracle to
#: match, so it can afford 10⁻¹⁵): per-message rounding noise reaches a
#: node as up to ±0.5·in_degree grid units per round, so the achievable
#: step floor scales with the hub degree — at 10⁻¹² the floor sits ABOVE
#: any tight stop threshold on realistic graphs (measured: the r11 test
#: graph never got below ~10 units), while at 10⁻¹⁵ a 2·10⁻¹² stop is
#: reachable for hub degrees into the hundreds of thousands. Still exact
#: int64: messages ≤ 10¹⁵ and their global sum ≈ 10¹⁵ ≪ 2⁶³.
CONV_GRID = 1e15


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
    for _ in range(iters):  # fixed-round form: q103's oracle replays this
        # each edge's message is gridded to the 10⁻¹² lattice and SUMMED
        # AS int64 (r9, the grid-before-argmax discipline applied to an
        # exact-sum): per-message ints are ≤ 10¹² and Σranks ≈ 1, so the
        # int64 fold is exact at ANY scale and partition-order-free —
        # which is what makes the whole iteration engine-portable and
        # lets q103 carry a recursive-CTE oracle. The 0.5·10⁻¹²
        # per-message perturbation is far below PageRank's own
        # iteration tolerance.
        ranks = _one_round(
            edges, ranks, outdeg, nodes, base, damping
        ).localCheckpoint(eager=True)
    return ranks


def _one_round(
    edges: DataFrame,
    ranks: DataFrame,
    outdeg: DataFrame,
    nodes: DataFrame,
    base: float,
    damping: float,
    grid: float = GRID,
) -> DataFrame:
    """One gridded message-passing round (the q103 arithmetic): gridded
    int64 messages along edges, exact per-destination fold, teleport."""
    m_int = F.floor(F.col("r") / F.col("deg") * F.lit(grid) + F.lit(0.5)).cast(
        "bigint"
    )
    contribs = (
        edges.join(ranks, edges["src"] == ranks["node"])
        .join(outdeg, "src")
        .select("dst", m_int.alias("m"))
        .groupBy("dst")
        .agg(F.sum("m").alias("msum"))
    )
    return nodes.join(
        contribs, nodes["node"] == contribs["dst"], "left"
    ).select(
        "node",
        (
            F.lit(base)
            + F.lit(damping)
            * (F.coalesce("msum", F.lit(0)).cast("double") / F.lit(grid))
        ).alias("r"),
    )


def pagerank_converged(
    edges: DataFrame,
    damping: float = 0.85,
    max_iters: int = 200,
    stop_units: int = 2,
    start: Optional[DataFrame] = None,
) -> Tuple[DataFrame, int]:
    """PageRank to CONVERGENCE on the exact message lattice, optionally
    WARM-STARTED from a prior rank vector — the fixpoint form behind
    :func:`merge_pagerank` (the fixed-round :func:`pagerank` is q103's
    oracle-replayable shape; this one trades replayability for a
    start-independent answer). Rounds run on ``CONV_GRID`` (10⁻¹⁵)
    messages — same exact-int64 discipline, finer lattice, because the
    per-round rounding noise a node sees is ±0.5·in_degree grid units
    and the stop threshold must sit ABOVE that floor (the 10⁻¹² lattice
    stalls: measured on the r11 test graph, the step plateaued near
    10 units and the loop hit max_iters).

    Stops when the largest per-node step is ≤ ``stop_units`` units of
    the 10⁻¹² ORACLE grid (i.e. ``stop_units·10³`` CONV_GRID units; the
    step is measured on the exact int64 lattice, so the stopping rule
    is bit-deterministic). Returns ``(ranks, rounds_run)``.
    Start-independence bound: the gridded round map is a ``damping``-
    contraction up to per-node rounding noise, so any two runs that
    stop at ≤ s land within ``(2·s + in_degree_max·10⁻³ + 1)·10⁻¹² /
    (1 − damping)`` of each other in max-norm — ~2·10⁻¹¹ at the
    defaults for hub degrees up to ~10³, far inside q103's 10⁻⁹ output
    grid (pinned in ``test_pagerank_merge.py``). ``start`` rows are
    matched by node id; nodes absent from ``start`` (a batch's new
    nodes) begin at 1/N, extra rows in ``start`` (deleted nodes) are
    dropped, and the assembled start is NORMALIZED to unit mass — the
    fixpoint is start-independent regardless (the teleport pins the
    stationary total), but excess start mass rides the slowest
    (uniform) eigenmode and costs rounds, which defeats the warm
    start's whole point.

    Scale: per round — ONE O(E) edge shuffle + an O(nodes) step-size
    fold; ranks localCheckpoint-ed per round (the module's lineage
    discipline). Warm starts buy fewer ROUNDS, never a cheaper round:
    messages flow along every edge each round, which is why
    :func:`merge_pagerank` takes the UNION edge set.
    """
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    n_nodes = nodes.count()  # driver scalar: one number, sizes the teleport
    base = (1.0 - damping) / n_nodes

    uniform = F.lit(1.0 / n_nodes)
    if start is None:
        ranks = nodes.withColumn("r", uniform)
    else:
        ranks = nodes.join(
            start.select("node", F.col("r").alias("r0")), "node", "left"
        ).select("node", F.coalesce("r0", uniform).alias("r"))
        # Normalize the start to UNIT MASS: a warm start after node
        # appends sums to ~1 + new/N, and that excess rides the slowest
        # eigenmode (uniform), decaying only as dᵏ — unnormalized warm
        # starts measurably LOST to cold on a node-adding batch (41 vs
        # 36 rounds, r11). One nodes-sized fold; the fixpoint itself is
        # start-independent either way.
        total = ranks.agg(F.sum("r").alias("t")).collect()[0]["t"]
        if not total or total <= 0:
            raise ValueError(f"start vector has non-positive mass {total}")
        ranks = ranks.select("node", (F.col("r") / F.lit(float(total))).alias("r"))
    ranks = ranks.localCheckpoint(eager=True)

    g = lambda c: F.floor(c * F.lit(CONV_GRID) + F.lit(0.5)).cast("bigint")  # noqa: E731
    stop_conv = int(stop_units) * int(CONV_GRID / GRID)
    rounds = 0
    for rounds in range(1, max_iters + 1):
        nxt = _one_round(
            edges, ranks, outdeg, nodes, base, damping, grid=CONV_GRID
        )
        nxt = nxt.localCheckpoint(eager=True)
        step = (
            nxt.join(ranks.select("node", F.col("r").alias("rp")), "node")
            .agg(F.max(F.abs(g(F.col("r")) - g(F.col("rp")))).alias("s"))
            .collect()[0]["s"]  # one number — the convergence probe
        )
        ranks = nxt
        if step is not None and step <= stop_conv:
            return ranks, rounds
    raise RuntimeError(
        f"pagerank did not converge in {max_iters} rounds (last step "
        f"{step} CONV_GRID units, threshold {stop_conv})"
    )


def merge_pagerank(
    edges: DataFrame,
    prior_ranks: DataFrame,
    new_edges: Optional[DataFrame] = None,
    damping: float = 0.85,
    max_iters: int = 200,
    stop_units: int = 2,
    local_rounds: int = 12,
) -> Tuple[DataFrame, int]:
    """Fold an edge-batch append into a persisted rank vector — the
    PageRank analogue of ``components.merge_components``/
    ``semdedup.merge_semdedup_removed`` with the honest caveat those two
    don't need: PageRank is a GLOBAL fixpoint, so a merge still touches
    every edge each GLOBAL round; what the merge buys is ROUNDS.

    Two stages (Desikan-style incremental PR, public):

    1. **Frozen-boundary local solve** (when ``new_edges`` is supplied):
       the batch's endpoint nodes iterate ``local_rounds`` updates with
       every OTHER node frozen at its prior rank. A naive warm start
       measurably does NOT pay under the max-norm stop — the new/changed
       nodes enter at 1/N-grade error, the same order as a cold uniform
       start, and the worst node alone dictates the round count (r11:
       warm 36 = cold 36 on the test graph). The local solve drives the
       affected region to near-stationary at batch-subgraph cost — each
       local round joins only the in-edges OF AFFECTED NODES (an
       equi-join against the broadcast batch-endpoint set) plus a
       nodes-sized patch — so the affected region itself starts
       near-stationary. Measured honestly (r11, test graph, damping
       0.6): cold 36 rounds, naive warm 36, local-solve warm 33 — the
       savings are REAL but modest under the max-norm stop on dense
       hub graphs, because first-order spillover onto the affected
       set's out-neighbors stays unsolved and one bad node dictates
       the count (expanding the solve by a hop covered 77% of this
       graph for 3 more rounds — locality just doesn't exist on dense
       bipartite hubs; the smoke records the sf0.1 numbers).
    2. **Global polish**: :func:`pagerank_converged` warm-started from
       the patched vector (which normalizes mass — excess start mass
       rides the slowest eigenmode; normalization alone was worth 5
       rounds: unnormalized warm LOST to cold 41 vs 36).

    ``edges`` is the post-append UNION edge set; ``prior_ranks`` the
    persisted ``(node, r)`` table; ``new_edges`` the appended batch
    (pass the symmetrized form, like ``edges``). Returns ``(ranks,
    rounds_run)`` — global rounds only — with ranks equal to a cold run
    on the union within the documented start-independence band (same
    top-k, same 10⁻⁹-gridded values — pinned in
    ``test_pagerank_merge.py``)."""
    start = prior_ranks
    if new_edges is not None and local_rounds > 0:
        nodes = (
            edges.select(F.col("src").alias("node"))
            .unionByName(edges.select(F.col("dst").alias("node")))
            .distinct()
        )
        outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
        n_nodes = nodes.count()
        base = (1.0 - damping) / n_nodes
        aff = (
            new_edges.select(F.col("src").alias("node"))
            .unionByName(new_edges.select(F.col("dst").alias("node")))
            .distinct()
            .localCheckpoint(eager=True)  # batch-sized by construction
        )
        r = nodes.join(
            prior_ranks.select("node", F.col("r").alias("r0")), "node", "left"
        ).select("node", F.coalesce("r0", F.lit(1.0 / n_nodes)).alias("r"))
        total = r.agg(F.sum("r").alias("t")).collect()[0]["t"]
        r = r.select(
            "node", (F.col("r") / F.lit(float(total))).alias("r")
        ).localCheckpoint(eager=True)
        # in-edges of affected nodes only: equi-join on the broadcast set
        in_aff = edges.join(
            F.broadcast(aff.select(F.col("node").alias("dst"))), "dst"
        ).localCheckpoint(eager=True)
        m_int = F.floor(
            F.col("r") / F.col("deg") * F.lit(CONV_GRID) + F.lit(0.5)
        ).cast("bigint")
        for _ in range(local_rounds):
            msum = (
                in_aff.join(r, in_aff["src"] == r["node"])
                .join(outdeg, "src")
                .select("dst", m_int.alias("m"))
                .groupBy("dst")
                .agg(F.sum("m").alias("msum"))
            )
            patch = F.broadcast(aff).join(
                msum, aff["node"] == msum["dst"], "left"
            ).select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce("msum", F.lit(0)).cast("double")
                        / F.lit(CONV_GRID)
                    )
                ).alias("r"),
            )
            r = (
                r.join(aff, "node", "left_anti")
                .unionByName(patch)
                .localCheckpoint(eager=True)
            )
        start = r
    return pagerank_converged(
        edges,
        damping=damping,
        max_iters=max_iters,
        stop_units=stop_units,
        start=start,
    )

"""Connected components over an edge list — the clustering step a real
dedup pipeline needs between "near-dup pairs" and "keep one canonical doc
per group" (pairs are not transitive: A~B and B~C must land A,B,C in one
group even when A~C was never emitted).

Algorithm: iterative min-label propagation WITH pointer jumping. Every
vertex starts labeled with itself; each round, every vertex takes the
minimum of its own label, the labels in its neighborhood, and its
label's label (label(label(v)) — the path-halving shortcut from the
published pointer-jumping/CC-in-MapReduce literature), all read from
the SAME round-start snapshot and folded through one aggregation
(r14: one localCheckpoint per round, not two). Neighborhood minima
alone need O(diameter) rounds — a chain-shaped component (HTML
boilerplate picked up page-by-page builds exactly that) of length 100
would blow the round budget; the jump halves the remaining label-tree
depth each round, so convergence is O(log diameter) with one extra
self-join per round (on the LABEL table, which is vertex-sized — cheap
next to the edge shuffle). Near-dup graphs are typically unions of
small dense clusters (diameter 2-3); the ``max_iter`` guard turns a
truly pathological structure into an explicit error instead of a
runaway job.

Scale notes:

* each round is one groupBy shuffle on vertex id over the edge list —
  O(E) rows; no vertex ever sees more than its neighborhood;
* ``localCheckpoint`` truncates the lineage each round — without it,
  the plan doubles per iteration and the driver OOMs planning round ~20
  long before data size matters;
* convergence check is an existence probe (``isEmpty`` = take-1) over
  the changed labels — one short-circuiting action per round that stops
  at the first changed row; only the final (converged) round pays a
  full scan of the checkpointed label partitions.

Reference design: the "large-star/small-star" formulation (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) halves round
count on high-diameter graphs; for dedup-shaped graphs plain min-label
does fewer total shuffles.
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
    """Return (id, component) where component = min vertex id reachable.

    ``edges`` is an undirected edge list (each pair once is enough);
    isolated vertices don't appear (callers union them back if needed).
    Raises RuntimeError if not converged within ``max_iter`` rounds.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    # symmetrize once and MATERIALIZE: every round joins against sym, and
    # without the checkpoint the full upstream edge computation (often an
    # expensive pair join) re-executes per iteration — measured 6× the
    # total runtime on a 5k-doc near-dup graph
    sym = (
        e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .filter(F.col("a") != F.col("b"))
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # r14 round fusing: the neighbor minimum AND the pointer jump
        # read the SAME label snapshot and fold through ONE aggregation —
        # new(v) = min(label(v), min_{b∈N(v)} label(b), label(label(v))).
        # The r13 shape materialized an intermediate "stepped" table
        # (neighbor-min first, jump on the stepped labels) — two
        # localCheckpoints and ~2 job waves per round; this is one. The
        # jump now reads the round-START labels (a snapshot-synchronous
        # path-halving step, the standard pointer-jumping formulation):
        # per round it shortcuts one hop less than the sequenced variant,
        # but depth still halves (jump) while the neighbor min still
        # propagates one hop, so convergence stays O(log diameter) and
        # the fixpoint is unchanged — labels only ever move DOWN to
        # reachable ids, and a fixpoint forces labels constant across
        # every edge and idempotent (label(label)=label), i.e. the
        # component minimum (pinned by the same tests/q44 oracle).
        parent = labels.select(
            F.col("id").alias("_pid"), F.col("label").alias("_plabel")
        )
        contrib = (
            # neighbor labels: the smallest label adjacent to each vertex
            sym.join(labels, sym["b"] == labels["id"])
            .select(F.col("a").alias("id"), F.col("label").alias("lab"))
            .unionByName(
                # pointer jump: label(label(v)) — the label's own label
                # (row always exists: every label value is a vertex id)
                labels.join(parent, labels["label"] == parent["_pid"])
                .select("id", F.col("_plabel").alias("lab"))
            )
        )
        mins = contrib.groupBy("id").agg(F.min("lab").alias("_mn"))
        new_labels = (
            labels.join(mins, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("_mn"), F.col("label"))
                ).alias("label"),
                F.col("label").alias("_old"),
            )
            .withColumn("changed", F.col("label") < F.col("_old"))
            .localCheckpoint(eager=True)  # truncate lineage every round
        )
        # r13: the convergence test only needs EXISTENCE of a changed
        # row — isEmpty (take-1 over the just-checkpointed partitions,
        # short-circuiting on the first hit) replaces the full count
        # scan; one fewer all-partition pass per round, same decision.
        converged = new_labels.filter(F.col("changed")).isEmpty()
        labels = new_labels.select("id", "label")
        if converged:
            return labels.select("id", F.col("label").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "component diameter exceeds the bound; raise max_iter or switch to "
        "the large-star/small-star variant"
    )


def merge_components(
    existing: DataFrame,
    new_edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """Fold a batch of new edges into a persisted (id, component) table
    WITHOUT relabeling the whole corpus — the maintenance operation a
    daily-crawl dedup pipeline needs (the MinHash index already supports
    incremental candidate probes; this closes the loop so canonical/
    cluster state is also incremental).

    ``existing`` is a prior :func:`connected_components` result (or a
    previous merge): (id, component) with component = min reachable id.
    ``new_edges`` is the fresh candidate-pair batch (e.g.
    ``operators/minhash.py::query_minhash_index`` output after verify) —
    its endpoints may be brand-new ids, already-clustered ids, or both.

    Only AFFECTED components are touched: a component is affected iff
    one of its members is an endpoint of a new edge (a new edge is the
    only way anything can change — components with no new endpoint
    cannot gain or lose members or change their minimum). The label
    propagation then runs on the affected SUBGRAPH only — existing
    affected components enter as (id → component) star edges, so their
    internal pair structure is never revisited — and the untouched rows
    pass through by anti-join. Returns the full updated (id, component)
    table, equal to a from-scratch run on the union graph (pinned in
    ``tests/test_components_merge.py``).

    Scale: two shuffles of the existing table (semi/anti join on
    component) + CC iteration sized to the batch's neighborhood — a
    daily batch touches O(batch) components, not O(corpus). Isolated
    vertices follow the same contract as :func:`connected_components`
    (absent from the table; callers union singletons back if needed).
    """
    e = new_edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    ends = (
        e.select(F.col("a").alias("id"))
        .union(e.select(F.col("b").alias("id")))
        .distinct()
    )
    affected = (
        existing.join(ends, "id", "semi").select("component").distinct()
    )
    touched = existing.join(affected, "component", "semi")
    untouched = existing.join(affected, "component", "anti")

    # affected members enter as star edges to their old component label:
    # O(members) rows that reproduce the old connectivity exactly (every
    # member is reachable from the old minimum, which is itself a member)
    star = touched.select(
        F.col("id").alias("src"), F.col("component").alias("dst")
    )
    sub = connected_components(
        star.unionByName(e.select(F.col("a").alias("src"), F.col("b").alias("dst"))),
        max_iter=max_iter,
    )
    # pin (id, component) column ORDER: the USING-join above moves the
    # join key first, and downstream positional consumers (parquet
    # round-trips, createDataFrame re-materialization) must see the same
    # layout connected_components emits
    return untouched.select("id", "component").unionByName(sub)

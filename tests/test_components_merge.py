"""Incremental connected-component maintenance (merge_components):
folding a batch of new edges into a persisted canonical table must equal
a from-scratch relabel of the union graph — on hand-built merge
topologies, across sequential batches, and on the real daily-crawl
composition (persisted MinHash index probes producing the new edges)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_streaming_base_spark.operators.components import (
    connected_components,
    merge_components,
)
from pyspark_streaming_base_spark.operators.minhash import (
    minhash_bands,
    build_minhash_index,
    query_minhash_index,
)
from pyspark_streaming_base_spark.queries._tables import t

from tests.conftest import SF_SMALL

EDGE_SCHEMA = "src long, dst long"


def _cc(spark, edges):
    df = spark.createDataFrame(edges, EDGE_SCHEMA)
    return {
        (r.id, r.component) for r in connected_components(df).collect()
    }


def test_merge_equals_from_scratch_on_merge_topologies(spark):
    """New edges that (a) bridge two existing components, (b) extend a
    component with new vertices, (c) stay inside one component, and
    (d) form a brand-new component — one batch, all four cases."""
    base = [(1, 2), (2, 3), (10, 11), (20, 21), (30, 31)]
    new = [
        (3, 10),    # bridges {1,2,3} and {10,11} → min label 1
        (21, 22),   # extends {20,21} with a new vertex
        (30, 31),   # redundant in-component edge
        (40, 41),   # brand-new component
    ]
    existing = connected_components(spark.createDataFrame(base, EDGE_SCHEMA))
    got = {
        (r.id, r.component)
        for r in merge_components(
            existing, spark.createDataFrame(new, EDGE_SCHEMA)
        ).collect()
    }
    assert got == _cc(spark, base + new)


def test_merge_empty_batch_is_identity(spark):
    base = [(1, 2), (5, 6)]
    existing = connected_components(spark.createDataFrame(base, EDGE_SCHEMA))
    empty = spark.createDataFrame([], EDGE_SCHEMA)
    got = {(r.id, r.component) for r in merge_components(existing, empty).collect()}
    assert got == {(r.id, r.component) for r in existing.collect()}


def test_sequential_merges_equal_from_scratch(spark):
    """Three daily batches folded one at a time — including a batch that
    re-bridges components created by an earlier batch — end at the same
    table as one from-scratch run over everything."""
    base = [(1, 2), (10, 11), (20, 21)]
    batches = [
        [(2, 3), (30, 31)],
        [(3, 10), (31, 32)],       # bridge via a batch-1 vertex
        [(11, 20), (100, 101)],    # chain all of 1..21 together
    ]
    labels = connected_components(spark.createDataFrame(base, EDGE_SCHEMA))
    for b in batches:
        labels = merge_components(labels, spark.createDataFrame(b, EDGE_SCHEMA))
        # keep the chain realistic: each merge output is the persisted
        # table the next day reads back (materialize to break lineage)
        labels = spark.createDataFrame(labels.collect(), "id long, component long")
    got = {(r.id, r.component) for r in labels.collect()}
    assert got == _cc(spark, base + [e for b in batches for e in b])


def test_minhash_probe_feeds_incremental_merge(spark, tmp_path):
    """The daily-crawl composition: corpus A's canonicals + persisted
    MinHash index; batch B arrives, probes the index (B↔A candidates)
    and band-joins itself (B↔B candidates); merge_components folds those
    edges in. Result == from-scratch components over the full corpus's
    band-collision graph."""
    docs = t(spark, SF_SMALL, "documents").select("doc_id", "text")
    a = docs.filter(F.col("doc_id") % 5 != 0)
    b = docs.filter(F.col("doc_id") % 5 == 0)

    def band_pairs(frame):
        bands = minhash_bands(frame)
        x = bands.select(
            F.col("doc_id").alias("src"), "band_idx", "band_hash"
        )
        y = bands.select(
            F.col("doc_id").alias("dst"), "band_idx", "band_hash"
        )
        return (
            x.join(y, ["band_idx", "band_hash"])
            .filter(F.col("src") < F.col("dst"))
            .select("src", "dst")
            .distinct()
        )

    existing = connected_components(band_pairs(a))

    path = str(tmp_path / "mh_index")
    build_minhash_index(a, path)
    cross = query_minhash_index(spark, path, b).select(
        F.col("query_id").alias("src"), F.col("index_id").alias("dst")
    )
    new_edges = cross.unionByName(band_pairs(b))

    got = {
        (r.id, r.component)
        for r in merge_components(existing, new_edges).collect()
    }
    want = {
        (r.id, r.component) for r in connected_components(band_pairs(docs)).collect()
    }
    assert got == want
    assert len(got) > 0  # fixture corpus has near-dup families


def test_high_diameter_chain_converges(spark):
    """Pointer jumping: a 120-vertex path graph (diameter 119) must
    converge inside the default 20-round budget — plain neighbor-min
    propagation would need 119 rounds and raise. Chain components are
    real (page-by-page boilerplate pickup links near-dups in a line),
    so O(log diameter) convergence is a correctness property at scale,
    not an optimization."""
    chain = [(i, i + 1) for i in range(120)]
    got = {
        (r.id, r.component)
        for r in connected_components(
            spark.createDataFrame(chain, EDGE_SCHEMA)
        ).collect()
    }
    assert got == {(i, 0) for i in range(121)}


def test_streaming_crawl_loop_end_to_end(spark, tmp_path):
    """The full incremental crawl loop as a STREAM: day-0 docs seed the
    MinHash index and canonical table; each later day arrives as one
    micro-batch that (1) appends its signatures to the index, (2) probes
    the index for candidate pairs — new-vs-corpus AND within-batch, both
    O(batch), (3) folds the edges into the persisted canonical table via
    merge_components. After the stream drains, the canonical table must
    equal a from-scratch connected_components over ALL candidate pairs
    of the full corpus."""
    from pyspark_streaming_base_spark.operators.minhash import (
        append_minhash_index,
    )

    docs = t(spark, SF_SMALL, "documents").select("doc_id", "text")
    day0 = docs.filter(F.col("doc_id") % 3 == 0)

    idx = str(tmp_path / "mh_idx")
    build_minhash_index(day0, idx)
    seed_edges = query_minhash_index(spark, idx, day0).select(
        F.col("query_id").alias("src"), F.col("index_id").alias("dst")
    )
    canon_dir = tmp_path / "canon"
    connected_components(seed_edges).write.parquet(str(canon_dir / "v0"))
    state = {"version": 0}

    staging = str(tmp_path / "days")
    docs.filter(F.col("doc_id") % 3 == 1).coalesce(1).write.mode("append").parquet(staging)
    docs.filter(F.col("doc_id") % 3 == 2).coalesce(1).write.mode("append").parquet(staging)

    def crawl(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        # append first so the probe also surfaces within-batch pairs
        append_minhash_index(batch_df, idx)
        edges = query_minhash_index(spark, idx, batch_df).select(
            F.col("query_id").alias("src"), F.col("index_id").alias("dst")
        )
        existing = spark.read.parquet(str(canon_dir / f"v{state['version']}"))
        updated = merge_components(existing, edges)
        state["version"] += 1
        updated.write.parquet(str(canon_dir / f"v{state['version']}"))

    q = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(staging)
        .writeStream.foreachBatch(crawl)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert state["version"] == 2  # one merge per day file

    got = {
        (r.id, r.component)
        for r in spark.read.parquet(str(canon_dir / "v2")).collect()
    }
    # from-scratch: the drained index holds the whole corpus, so probing
    # it with every doc yields the complete candidate pair set
    all_edges = query_minhash_index(spark, idx, docs).select(
        F.col("query_id").alias("src"), F.col("index_id").alias("dst")
    )
    want = {(r.id, r.component) for r in connected_components(all_edges).collect()}
    assert got == want and got


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_edge = st.tuples(
    st.integers(min_value=0, max_value=24), st.integers(min_value=0, max_value=24)
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(
    base=st.lists(_edge, min_size=0, max_size=20),
    batches=st.lists(st.lists(_edge, min_size=0, max_size=12), min_size=1, max_size=3),
)
def test_merge_property_random_graphs(spark, base, batches):
    """Property: for ANY base graph and ANY sequence of new-edge batches
    (self-loops, duplicate edges, brand-new ids, bridges between old
    components — whatever hypothesis throws), sequentially merging each
    batch equals connected_components over the whole union."""
    state = connected_components(spark.createDataFrame(base, EDGE_SCHEMA))
    for batch in batches:
        state = merge_components(state, spark.createDataFrame(batch, EDGE_SCHEMA))
    got = {(r.id, r.component) for r in state.collect()}
    want = _cc(spark, base + [e for b in batches for e in b])
    assert got == want

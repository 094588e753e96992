"""Quality tests for the approximate operators (MinHash LSH, SimHash,
ANN): the DuckDB oracle can't check these (hash families are
engine-specific), so these tests pin their statistical behavior against
exact ground truth computed in-Spark. All hashes are deterministic →
results are stable run-to-run, so the bounds are tight, not flaky.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pyspark_streaming_base_spark.queries import load_all
from pyspark_streaming_base_spark.queries._tables import t
from pyspark_streaming_base_spark.queries.dedup import _shingles

from pyspark_streaming_base_spark.operators.components import connected_components

from tests.conftest import SF_MEDIUM, SF_SMALL

R = load_all()


def test_connected_components_matches_union_find(spark):
    edges = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 20), (30, 31)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["id"]: r["component"] for r in connected_components(df).collect()}

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {v: find(v) for v in parent}
    assert got == expect


def test_dedup_clusters_are_consistent_with_pairs(spark):
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in R["q40_ngram_jaccard_pairs"].fn(spark, SF_MEDIUM).collect()
    }
    clusters = {
        r["doc_id"]: r["canonical"]
        for r in R["q44_dedup_clusters"].fn(spark, SF_MEDIUM).collect()
    }
    # every paired doc is clustered, pair members share a component, and
    # the canonical is the component minimum (itself a clustered member)
    for a, b in pairs:
        assert clusters[a] == clusters[b]
        assert clusters[a] <= min(a, b)
    for doc, canon in clusters.items():
        assert clusters[canon] == canon


def _shingle_truth_pairs(spark, sf_dir, threshold=0.8):
    sh = t(spark, sf_dir, "documents").select("doc_id", _shingles(F.col("text")).alias("sh"))
    a, b = sh.alias("a"), sh.alias("b")
    truth = (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .withColumn(
            "j",
            F.size(F.array_intersect("a.sh", "b.sh")).cast("double")
            / F.size(F.array_union("a.sh", "b.sh")),
        )
        .filter(F.col("j") >= threshold)
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    )
    return {(r.doc_a, r.doc_b) for r in truth.collect()}


def test_minhash_lsh_recall_and_precision(spark):
    truth = _shingle_truth_pairs(spark, SF_SMALL)
    got = {
        (r.doc_a, r.doc_b) for r in R["q41_minhash_lsh_pairs"].fn(spark, SF_SMALL).collect()
    }
    assert truth, "fixture should contain near-duplicate documents"
    # exact-Jaccard verification step ⇒ precision is 1.0 by construction
    assert got <= truth
    # 16 perms / 4 bands: P(candidate | J=0.8) ≈ 0.88, higher above;
    # measured 1.0 on this fixture — pin a margin below
    recall = len(got & truth) / len(truth)
    assert recall >= 0.9, f"recall {recall}"


def test_simhash_identical_docs_share_fingerprint(spark):
    docs = t(spark, SF_SMALL, "documents")
    # duplicate texts must land in the same bucket with identical simhash —
    # group exact-dup docs and check their bucket stats are consistent
    dup_texts = (
        docs.groupBy("text").agg(F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("k"))
        .filter(F.col("n") > 1)
    )
    n_dup_groups = dup_texts.count()
    buckets = R["q42_simhash_buckets"].fn(spark, SF_SMALL)
    assert buckets.count() > 0
    if n_dup_groups:
        # every bucket count ≥ 1 and total docs conserved
        total = buckets.agg(F.sum("n_docs")).collect()[0][0]
        assert total == docs.count()


def test_ann_lsh_recall_vs_bruteforce(spark):
    exact = {
        (r.qid, r.vec_id)
        for r in R["q60_knn_bruteforce"].fn(spark, SF_SMALL).collect()
    }
    approx = {
        (r.qid, r.vec_id) for r in R["q61_ann_lsh"].fn(spark, SF_SMALL).collect()
    }
    assert exact and approx
    recall = len(approx & exact) / len(exact)
    # deterministic planes → stable. Query-side multi-probe (subset-flips
    # of the 2 lowest-|margin| planes, 4 probes/table) measures 0.87 at
    # both sf0.001 and sf0.01 (vs 0.43 single-probe); floor pinned at the
    # production-usable 0.8 bar.
    assert recall >= 0.8, f"ANN recall {recall}"


def test_ann_ivf_recall_vs_bruteforce(spark):
    exact = {
        (r.qid, r.vec_id)
        for r in R["q60_knn_bruteforce"].fn(spark, SF_SMALL).collect()
    }
    approx = {
        (r.qid, r.vec_id) for r in R["q63_ann_ivf"].fn(spark, SF_SMALL).collect()
    }
    assert exact and approx
    recall = len(approx & exact) / len(exact)
    # nprobe/K = 2/16 of the corpus scanned; weakly-clustered synthetic
    # vectors put true neighbors across many cells, so the floor is the
    # scan fraction's regime, pinned with margin below the measured value.
    assert recall >= 0.2, f"IVF recall {recall}"


def test_exact_dedup_conserves_documents(spark):
    docs = t(spark, SF_SMALL, "documents")
    dedup = R["q22_exact_dedup"].fn(spark, SF_SMALL)
    stats = dedup.agg(
        F.sum("n_copies").alias("total"), F.count(F.lit(1)).alias("uniq")
    ).collect()[0]
    assert stats["total"] == docs.count()
    assert stats["uniq"] <= docs.count()


def test_countmin_overestimate_bounds(spark):
    rows = R["q58_countmin_freq"].fn(spark, SF_SMALL).collect()
    assert len(rows) == 20
    total_err = 0
    for r in rows:
        assert r["est_count"] >= r["true_count"], r  # CMS never undercounts
        total_err += r["est_count"] - r["true_count"]
    # w=1024 at ~50k sf0.001 tokens → expected overcount per probe ≈ N/w ≈ 50;
    # bound the MEAN overcount with generous margin (deterministic hashes →
    # stable run-to-run)
    assert total_err / len(rows) < 500, total_err


def test_dedup_pipeline_verdicts_consistent(spark):
    docs = t(spark, SF_SMALL, "documents")
    out = R["q45_dedup_pipeline"].fn(spark, SF_SMALL).collect()
    assert len(out) == docs.count()  # one verdict per document
    verdicts = {r["doc_id"]: (r["verdict"], r["canonical"]) for r in out}
    n_kept = sum(1 for v, _ in verdicts.values() if v == "kept")
    assert 0 < n_kept < len(verdicts)  # fixture contains dups
    for doc, (v, canon) in verdicts.items():
        if v == "kept":
            assert canon == doc
        else:
            # every canonical must itself be a kept document
            assert verdicts[canon][0] == "kept", (doc, v, canon)


def test_simhash_pairs_complete_wrt_hamming(spark):
    """The band join must have PERFECT recall at the hamming threshold:
    by pigeonhole, two 64-bit fingerprints within hamming distance ≤ 3
    agree exactly on at least one of the 4 16-bit bands. So q46's output
    must EQUAL the brute-force all-pairs hamming filter — no pair missed
    (banding complete), no extra pair (verification filter)."""
    from pyspark_streaming_base_spark.queries.dedup import (
        _SIMHASH_MAX_HAMMING,
        _simhash_fingerprints,
    )

    fp = _simhash_fingerprints(spark, SF_MEDIUM)
    a, b = fp.alias("a"), fp.alias("b")
    brute = (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .withColumn(
            "ham",
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).cast("bigint"),
        )
        .filter(F.col("ham") <= _SIMHASH_MAX_HAMMING)
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"), "ham")
    )
    expect = {(r.doc_a, r.doc_b): r.ham for r in brute.collect()}
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in R["q46_simhash_neardup_pairs"].fn(spark, SF_MEDIUM).collect()
    }
    assert expect, "fixture should contain near-identical documents"
    assert got == expect


def test_simhash_pairs_catch_exact_token_dups(spark):
    """Identical token SETS produce identical fingerprints, so every
    exact-token-dup pair (q40 jaccard = 1.0) must be emitted by q46 with
    hamming 0 — recall 1.0 on the near-identical tier SimHash-d3 targets
    (looser J≥0.8 near-dups are MinHash/q41's job, not SimHash's)."""
    exact_dups = {
        (r.doc_a, r.doc_b)
        for r in R["q40_ngram_jaccard_pairs"].fn(spark, SF_MEDIUM).collect()
        if r.jaccard == 1.0
    }
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in R["q46_simhash_neardup_pairs"].fn(spark, SF_MEDIUM).collect()
    }
    assert exact_dups, "fixture should contain exact token dups"
    for pair in exact_dups:
        assert got.get(pair) == 0, pair


def test_simhash_pairs_feed_connected_components(spark):
    """q46's pair list is a drop-in edge set for the same transitive
    clustering q44 runs on q40's pairs."""
    pairs = R["q46_simhash_neardup_pairs"].fn(spark, SF_MEDIUM).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    comp = {r["id"]: r["component"] for r in connected_components(pairs).collect()}
    edges = [(r.doc_a, r.doc_b) for r in R["q46_simhash_neardup_pairs"].fn(spark, SF_MEDIUM).collect()]
    for a, b in edges:
        assert comp[a] == comp[b]
        assert comp[a] <= min(a, b)


def test_approx_percentile_rank_error_bound(spark):
    """percentile_approx's published guarantee: with accuracy A, the
    returned value's RANK differs from the target rank by at most n/A.
    Checked against the exact sorted data per group."""
    approx = {r.l_returnflag: r for r in R["q78_approx_percentile"].fn(spark, SF_MEDIUM).collect()}
    li = t(spark, SF_MEDIUM, "lineitem").select("l_returnflag", "l_extendedprice")
    by_flag: dict[str, list[float]] = {}
    for r in li.collect():
        by_flag.setdefault(r.l_returnflag, []).append(r.l_extendedprice)
    assert set(approx) == set(by_flag)
    accuracy = 10000
    for flag, vals in by_flag.items():
        vals.sort()
        n = len(vals)
        tol = max(1.0, n / accuracy)
        for q, col in ((0.5, "p50_approx"), (0.9, "p90_approx"), (0.99, "p99_approx")):
            got = approx[flag][col]
            # rank of the returned value in the exact ordering
            import bisect

            lo = bisect.bisect_left(vals, got)
            hi = bisect.bisect_right(vals, got)
            target = q * (n - 1)
            # the value's occupied rank range must cover the target
            # within the sketch's rank tolerance
            assert lo - tol <= target <= hi + tol, (flag, q, got, lo, hi, target)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(
    docs=st.lists(
        st.lists(st.sampled_from("ab"), min_size=0, max_size=40).map(
            lambda cs: " ".join(cs)
        ),
        min_size=0,
        max_size=8,
    )
)
def test_dup_span_matches_bruteforce(spark, docs):
    """q107's window-hash aggregation == a brute-force Python mirror of
    the W=16 duplicated-span definition, on adversarial corpora (tiny
    alphabet maximizes window collisions; short docs hit the <W filter)."""
    W16 = 16
    wins = {}  # doc -> list of window tuples
    for i, text in enumerate(docs):
        toks = [t_ for t_ in text.split(" ") if t_]
        if len(toks) >= W16:
            wins[i] = [tuple(toks[j : j + W16]) for j in range(len(toks) - W16 + 1)]
    owners = {}
    for i, ws in wins.items():
        for w in ws:
            owners.setdefault(w, set()).add(i)
    expect = {
        i: (
            len(ws),
            sum(1 for w in ws if len(owners[w]) > 1),
        )
        for i, ws in wins.items()
    }

    df = spark.createDataFrame(
        [(i, t_) for i, t_ in enumerate(docs)], "doc_id long, text string"
    )
    from pyspark_streaming_base_spark.queries.dedup import q107_dup_span_detection
    import pyspark_streaming_base_spark.queries._tables as _tables

    # run the registered query body against this frame via a temp parquet
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "documents.parquet"))
        got = {
            r.doc_id: (r.n_windows, r.n_dup_windows)
            for r in q107_dup_span_detection(spark, d).collect()
        }
    assert got == expect


def test_cluster_representatives_keeper_invariants(spark):
    """q122: exactly one keeper per cluster, the keeper maximizes the
    quality score (doc_id tie-break), and membership matches q44."""
    from collections import defaultdict

    rows = R["q122_cluster_representatives"].fn(spark, SF_MEDIUM).collect()
    clusters = defaultdict(list)
    for r in rows:
        clusters[r.cluster].append(r)
    assert clusters
    for members in clusters.values():
        keepers = [r for r in members if r.kept]
        assert len(keepers) == 1
        k = keepers[0]
        mx = max(r.quality_score for r in members)
        assert k.quality_score == mx
        # doc_id tie-break: among max-quality members the LOWEST id wins
        best_ids = [r.doc_id for r in members if r.quality_score == mx]
        assert k.doc_id == min(best_ids)
        assert all(r.keeper_id == k.doc_id for r in members)
        assert all(r.cluster_size == len(members) for r in members)
    # same membership as the q44 clustering it composes
    q44 = {
        (r.doc_id, r.canonical)
        for r in R["q44_dedup_clusters"].fn(spark, SF_MEDIUM).collect()
    }
    assert {(r.doc_id, r.cluster) for r in rows} == q44


# both fixture corpora (different vectors, same schema): the sf0.01 twin
# guards the q122/q125/q127 consumer chain against larger-scale numeric
# drift in the float-Lloyd + cosine path (r5 verdict task 6)
@pytest.mark.parametrize("sf_dir", [SF_SMALL, SF_MEDIUM])
def test_semantic_dedup_matches_numpy_mirror(spark, sf_dir):
    """q125: given the (q94-numpy-pinned) k-means assignment, the
    within-cluster remove set must equal an exact Python mirror of the
    SemDeDup keeper policy (lower-id neighbor within tau removes you),
    including the 6-dp cosine quantization."""
    import math

    from pyspark_streaming_base_spark.functions.vectorops import dvec
    from pyspark_streaming_base_spark.queries.pipeline import kmeans_assign

    tau = 0.35
    assigned = (
        kmeans_assign(spark, sf_dir)
        .select("vec_id", "cid")
        .join(
            t(spark, sf_dir, "embeddings").select(
                "vec_id", dvec("embedding").alias("v")
            ),
            "vec_id",
        )
        .collect()
    )
    by_cluster: dict = {}
    for r in assigned:
        by_cluster.setdefault(r.cid, []).append((r.vec_id, list(r.v)))

    def cos(a, b):
        # mirror functions/vectorops.cosine: sequential left-to-right fold
        dot = na = nb = 0.0
        for x, y in zip(a, b):
            dot += x * y
            na += x * x
            nb += y * y
        return dot / (math.sqrt(na) * math.sqrt(nb))

    def dround6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    expect_removed = set()
    for members in by_cluster.values():
        members.sort()
        for i, (ida, va) in enumerate(members):
            for idb, vb in members[i + 1 :]:
                if dround6(cos(va, vb)) >= tau:
                    expect_removed.add(idb)

    got = {r.vec_id: r.kept for r in R["q125_semantic_dedup"].fn(spark, sf_dir).collect()}
    assert len(got) == len(assigned)
    assert {v for v, kept in got.items() if not kept} == expect_removed
    assert any(not kept for kept in got.values())  # non-trivial at tau=0.35


def test_leakage_safe_split_invariants(spark):
    """q127: (a) every near-dup cluster lands wholly in ONE split,
    (b) singleton docs reproduce q49's per-doc assignment exactly,
    (c) every document appears exactly once."""
    from pyspark_streaming_base_spark.queries.text import q49_train_split

    rows = R["q127_leakage_safe_split"].fn(spark, SF_MEDIUM).collect()
    n_docs = t(spark, SF_MEDIUM, "documents").count()
    assert len(rows) == n_docs
    assert len({r.doc_id for r in rows}) == n_docs

    by_canon: dict = {}
    for r in rows:
        by_canon.setdefault(r.canonical, set()).add(r.split)
    assert all(len(s) == 1 for s in by_canon.values())  # no straddling

    # q49 assigns per doc_id; singletons (canonical == doc_id) must match.
    # q49 emits (lang, split) aggregates, so recompute its per-doc rule:
    hk = F.md5(F.col("doc_id").cast("string")).substr(1, 4)
    from pyspark_streaming_base_spark.queries.text import (
        _SPLIT_TEST_HEX,
        _SPLIT_VAL_HEX,
    )

    per_doc = {
        r.doc_id: r.split
        for r in t(spark, SF_MEDIUM, "documents")
        .select(
            "doc_id",
            F.when(hk < _SPLIT_VAL_HEX, "val")
            .when(hk < _SPLIT_TEST_HEX, "test")
            .otherwise("train")
            .alias("split"),
        )
        .collect()
    }
    singletons = [r for r in rows if r.canonical == r.doc_id]
    assert singletons
    assert all(per_doc[r.doc_id] == r.split for r in singletons)
    # and at least one clustered doc got REASSIGNED relative to q49's
    # per-doc rule (the whole point of the operator) — if none differ the
    # fixture has no multi-doc clusters and the test is vacuous
    clustered = [r for r in rows if r.canonical != r.doc_id]
    assert clustered


def test_ann_recall_eval_matches_python_mirror(spark):
    """q146's metric arithmetic recomputed in python from the two
    collected arms must match row-for-row; and the macro recall floor
    mirrors the standing q61 recall bound."""
    from pyspark_streaming_base_spark.queries import load_all

    R = load_all()
    truth = R["q60_knn_bruteforce"].fn(spark, SF_SMALL).collect()
    cand = R["q61_ann_lsh"].fn(spark, SF_SMALL).collect()
    got = {
        r.qid: (r.n_truth, r.n_hit, r.recall_at_k, r.rr)
        for r in R["q146_ann_recall_eval"].fn(spark, SF_SMALL).collect()
    }
    t_by_q: dict = {}
    for r in truth:
        t_by_q.setdefault(r.qid, []).append((r.rnk, r.vec_id))
    c_by_q: dict = {}
    for r in cand:
        c_by_q.setdefault(r.qid, {})[r.vec_id] = r.rnk
    for qid, trows in t_by_q.items():
        tset = {v for _, v in trows}
        hits = len(tset & set(c_by_q.get(qid, {})))
        top1 = min(trows)[1]
        rr = 1.0 / c_by_q[qid][top1] if top1 in c_by_q.get(qid, {}) else 0.0
        assert got[qid] == (len(tset), hits, hits / len(tset), rr), qid
    macro = sum(v[2] for v in got.values()) / len(got)
    assert macro >= 0.8  # the q61 multi-probe recall floor


def test_q168_kcore_matches_python_peel(spark):
    """The distributed k-core equals an in-memory peel of the same q40
    edge set, vertex-for-vertex and core-degree-for-core-degree; also
    sanity: the 2-core is a subgraph of the non-singleton components."""
    from collections import defaultdict

    from pyspark_streaming_base_spark.queries import load_all

    R = load_all()
    edges = [
        (r["doc_a"], r["doc_b"])
        for r in R["q40_ngram_jaccard_pairs"].fn(spark, SF_SMALL).collect()
    ]
    adj = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    changed = True
    while changed:
        changed = False
        for v in list(adj):
            if len(adj[v]) < 2:
                for u in adj[v]:
                    adj[u].discard(v)
                del adj[v]
                changed = True
    want = {v: len(nbrs) for v, nbrs in adj.items()}

    got = {
        r["doc_id"]: r["core_degree"]
        for r in R["q168_kcore"].fn(spark, SF_SMALL).collect()
    }
    assert got == want

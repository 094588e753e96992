"""Product quantization (operators/pq.py, q109): structural invariants,
the ADC-reconstruction identity, codebook parity with a numpy Lloyd
mirror, and recall vs the exact scan."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pyspark_streaming_base_spark.functions.vectorops import dvec
from pyspark_streaming_base_spark.operators.pq import (
    pq_codebooks,
    pq_encode,
    pq_search,
    pq_search_rerank,
    pq_subvectors,
)

SF = "/root/testdata/sf0.001"
M, K = 16, 16


@pytest.fixture(scope="module")
def emb(spark):
    df = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id", dvec("embedding").alias("vec"))
        .cache()
    )
    df.count()
    return df


@pytest.fixture(scope="module")
def trained(emb):
    cb = pq_codebooks(emb, M, K, iters=3).cache()
    enc = pq_encode(emb, cb, M).cache()
    return cb, enc


def _np_corpus(emb):
    return {r.vec_id: np.array(r.vec, dtype=np.float64) for r in emb.collect()}


def test_subvector_geometry(emb):
    rows = pq_subvectors(emb, M).filter(F.col("vec_id") == 0).collect()
    assert len(rows) == M
    assert sorted(r.sub for r in rows) == list(range(M))
    assert all(len(r.sv) == 64 // M for r in rows)
    # concatenating the subvectors in sub order reproduces the vector
    V = _np_corpus(emb)
    rebuilt = np.concatenate([r.sv for r in sorted(rows, key=lambda r: r.sub)])
    assert np.array_equal(rebuilt, V[0])


def test_codebook_shape_and_code_range(trained):
    cb, enc = trained
    assert cb.count() == M * K
    assert cb.select("sub").distinct().count() == M
    codes = enc.collect()
    assert all(len(r.codes) == M for r in codes)
    assert all(0 <= c < K for r in codes for c in r.codes)


def test_adc_equals_reconstructed_distance(emb, trained):
    """The PQ identity: ADC(q, v) == ||q - decode(codes(v))||² exactly
    (same per-subspace terms, summed in the same sub order)."""
    cb, enc = trained
    C = {(r.sub, r.cid): np.array(r.cv) for r in cb.collect()}
    V = _np_corpus(emb)
    codes = {r.vec_id: list(r.codes) for r in enc.collect()}
    ds = 64 // M

    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("vec").alias("qvec")
    )
    got = pq_search(enc, cb, queries, M, top_k=10).collect()
    assert {r.qid for r in got} == {0, 1, 2}
    for r in got:
        q = V[r.qid]
        decoded = np.concatenate([C[(s, codes[r.vec_id][s])] for s in range(M)])
        expect = sum(
            float(np.sum((q[s * ds : (s + 1) * ds] - decoded[s * ds : (s + 1) * ds]) ** 2))
            for s in range(M)
        )
        assert abs(r.adc_r - round(expect, 6)) <= 1e-6


def test_codebooks_match_numpy_lloyd(emb, trained):
    """Joint distributed Lloyd == per-subspace numpy Lloyd with the same
    deterministic init (vec_id < K) and (d2, cid) argmin tie-break."""
    cb, _ = trained
    V = _np_corpus(emb)
    ids = sorted(V)
    ds = 64 // M
    X = np.stack([V[i] for i in ids])  # (n, 64) in vec_id order

    got = {(r.sub, r.cid): np.array(r.cv) for r in cb.collect()}
    for s in range(M):
        Xs = X[:, s * ds : (s + 1) * ds]
        cent = {i: Xs[ids.index(i)].copy() for i in range(K)}
        for _ in range(3):
            cids = sorted(cent)
            CM = np.stack([cent[c] for c in cids])
            d2 = ((Xs[:, None, :] - CM[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)  # first minimum == lowest cid
            cent = {
                cids[c]: Xs[assign == c].mean(axis=0)
                for c in range(len(cids))
                if (assign == c).any()
            }
        for c, cv in cent.items():
            np.testing.assert_allclose(got[(s, c)], cv, atol=1e-9)


def test_rerank_recall_vs_exact(emb, trained):
    cb, enc = trained
    V = _np_corpus(emb)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("vec").alias("qvec")
    )
    got = pq_search_rerank(emb, enc, cb, queries, M, shortlist=50, top_k=10)
    mine = {}
    for r in got.collect():
        mine.setdefault(r.qid, set()).add(r.vec_id)
    recalls = []
    for qid in (0, 1, 2):
        exact = {
            v
            for _, v in sorted(
                (float(np.sum((V[qid] - V[v]) ** 2)), v) for v in V if v != qid
            )[:10]
        }
        recalls.append(len(mine[qid] & exact) / 10)
    assert np.mean(recalls) >= 0.75, recalls


def test_search_is_deterministic(emb, trained):
    cb, enc = trained
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("vec").alias("qvec")
    )
    a = sorted(map(tuple, pq_search_rerank(emb, enc, cb, queries, M).collect()))
    b = sorted(map(tuple, pq_search_rerank(emb, enc, cb, queries, M).collect()))
    assert a == b


def test_ivfadc_recall_and_pruning(spark, emb, trained):
    """IVFADC: recall holds up under coarse pruning (nprobe=4 of 8
    cells), and every result must come from a probed cell."""
    from pyspark_streaming_base_spark.operators.ivf import (
        ivf_assign,
        ivf_probe_cells,
    )
    from pyspark_streaming_base_spark.operators.pq import ivfadc_search

    cb, enc = trained
    centroids = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cent_id"), F.col("vec").alias("cvec")
    )
    assigned = ivf_assign(emb, centroids).select("vec_id", "cell").cache()
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("vec").alias("qvec")
    )
    got = ivfadc_search(
        emb, assigned, enc, cb, centroids, queries, M, nprobe=4,
        shortlist=50, top_k=10,
    ).collect()

    cells = {r.vec_id: r.cell for r in assigned.collect()}
    probed = {}
    for r in ivf_probe_cells(queries, centroids, 4).collect():
        probed.setdefault(r.qid, set()).add(r.cell)
    assert all(cells[r.vec_id] in probed[r.qid] for r in got)

    V = _np_corpus(emb)
    mine = {}
    for r in got:
        mine.setdefault(r.qid, set()).add(r.vec_id)
    recalls = []
    for qid in (0, 1, 2):
        exact = {
            v
            for _, v in sorted(
                (float(np.sum((V[qid] - V[v]) ** 2)), v) for v in V if v != qid
            )[:10]
        }
        recalls.append(len(mine[qid] & exact) / 10)
    # half the corpus is pruned before scoring: recall trades against the
    # 2x scan reduction; floor set with margin under the measured value
    assert np.mean(recalls) >= 0.5, recalls


def test_codebooks_reject_indivisible_dimension(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0]), (1, [4.0, 5.0, 6.0])], "vec_id long, vec array<double>"
    )
    with pytest.raises(ValueError, match="divisible"):
        pq_codebooks(df, m=2, k=2, iters=1)


def test_adc_survives_sparse_cids(spark):
    """Regression (r4 advice): if a Lloyd cluster empties during training,
    surviving cids go SPARSE (e.g. {0, 2, 3}) — the cid-keyed ADC table
    must still score every code correctly, where a positional lookup
    would silently read the wrong codeword's distance (or throw under
    ANSI for the max cid)."""
    m = 2
    # hand-built codebook with a GAP: cids {0, 2, 5} per subspace
    cb = spark.createDataFrame(
        [
            (s, cid, [float(cid + 10 * s), float(cid + 10 * s)])
            for s in range(m)
            for cid in (0, 2, 5)
        ],
        "sub int, cid bigint, cv array<double>",
    )
    # corpus vectors sitting exactly ON codewords (codes known a priori)
    emb = spark.createDataFrame(
        [
            (0, [0.0, 0.0, 10.0, 10.0]),   # codes [0, 0]
            (1, [5.0, 5.0, 15.0, 15.0]),   # codes [5, 5]  <- max sparse cid
            (2, [2.0, 2.0, 12.0, 12.0]),   # codes [2, 2]
        ],
        "vec_id long, vec array<double>",
    )
    enc = pq_encode(emb, cb, m)
    assert {r.vec_id: list(r.codes) for r in enc.collect()} == {
        0: [0, 0],
        1: [5, 5],
        2: [2, 2],
    }
    queries = spark.createDataFrame(
        [(100, [0.0, 0.0, 10.0, 10.0])], "qid long, qvec array<double>"
    )
    got = {r.vec_id: r.adc_r for r in pq_search(enc, cb, queries, m, top_k=3).collect()}
    # exact ADC distances from the query to each (on-codeword) vector
    assert got == {0: 0.0, 2: 4 * 4.0, 1: 4 * 25.0}


def test_persisted_index_equals_inline_q111(spark, emb, tmp_path):
    """build_pq_index/query_pq_index: the persisted IVFADC index answers
    EXACTLY what the inline q111 composition computes (same deterministic
    quantizers, same tie-breaks) — the index-backed == inline proof the
    MinHash and IVF persisted indexes already carry."""
    from pyspark_streaming_base_spark.operators.pq import (
        build_pq_index,
        query_pq_index,
    )
    from pyspark_streaming_base_spark.queries import load_all

    path = str(tmp_path / "pq")
    build_pq_index(emb, path, m=M, k=K, iters=3, n_cells=8)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("vec").alias("qvec")
    )
    got = {
        (r.qid, r.rnk): (r.vec_id, r.d2_r)
        for r in query_pq_index(
            spark, path, queries, m=M, nprobe=4, shortlist=50, top_k=10
        ).collect()
    }
    want = {
        (r.qid, r.rnk): (r.vec_id, r.d2_r)
        for r in load_all()["q111_ivfadc_ann"].fn(spark, SF).collect()
    }
    assert got == want
    assert len(got) == 30


def test_pq_probe_never_reads_corpus(spark, emb, tmp_path):
    """The probe plan touches ONLY the persisted index tables: with the
    query batch supplied as literal rows, no scan of embeddings.parquet
    appears anywhere — cells, codes, and the re-rank's full-precision
    vectors all come from the pre-joined index layout."""
    from pyspark_streaming_base_spark.operators.pq import (
        build_pq_index,
        query_pq_index,
    )
    from pyspark_streaming_base_spark.plans import formatted_plan

    path = str(tmp_path / "pq")
    build_pq_index(emb, path, m=M, k=K, iters=3, n_cells=8)
    qrows = [
        (int(r.vec_id), [float(x) for x in r.vec])
        for r in emb.filter(F.col("vec_id") < 2).collect()
    ]
    queries = spark.createDataFrame(qrows, "qid long, qvec array<double>")
    plan = formatted_plan(
        query_pq_index(spark, path, queries, m=M, nprobe=2, shortlist=20, top_k=5)
    )
    assert "embeddings.parquet" not in plan
    assert plan.count("/index") >= 1  # codes+vec read off the index table


def test_streaming_query_vectors_probe_persisted_pq_index(spark, emb, tmp_path):
    """Serving-path parity with the IVF index: a STREAM of query vectors
    probes the persisted IVFADC index through foreachBatch (one
    micro-batch per query file), and the accumulated results equal the
    one-shot batch probe — the index is built once, probed many times,
    and never retrained between batches."""
    from pyspark_streaming_base_spark.operators.pq import (
        build_pq_index,
        query_pq_index,
    )

    path = str(tmp_path / "pq")
    build_pq_index(emb, path, m=M, k=K, iters=3, n_cells=8)

    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("vec").alias("qvec")
    )
    staging = str(tmp_path / "qstream")
    queries.repartition("qid").write.parquet(staging)
    out = str(tmp_path / "results")

    def probe(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        query_pq_index(
            spark, path, batch_df, m=M, nprobe=4, shortlist=50, top_k=10
        ).write.mode("append").parquet(out)

    q = (
        spark.readStream.schema(queries.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(staging)
        .writeStream.foreachBatch(probe)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = {
        (r.qid, r.vec_id, r.d2_r, r.rnk) for r in spark.read.parquet(out).collect()
    }
    want = {
        (r.qid, r.vec_id, r.d2_r, r.rnk)
        for r in query_pq_index(
            spark, path, queries, m=M, nprobe=4, shortlist=50, top_k=10
        ).collect()
    }
    assert got == want
    assert len({qid for (qid, *_rest) in got}) == 3


def test_append_pq_index_equals_frozen_rebuild(spark, emb, tmp_path):
    """The daily-crawl add(): build on corpus A, append batch B with the
    frozen quantizers — the index table must equal, row for row, a
    rebuild over A∪B that pins the SAME codebooks/centroids, and probes
    of the appended index must surface the new vectors."""
    from pyspark_streaming_base_spark.operators.pq import (
        append_pq_index,
        build_pq_index,
        query_pq_index,
    )

    a = emb.filter(F.col("vec_id") % 5 != 0)
    b = emb.filter(F.col("vec_id") % 5 == 0)
    path = str(tmp_path / "pq_a")
    build_pq_index(a, path, m=M, k=K, iters=3, n_cells=8)
    append_pq_index(spark, path, b, m=M)

    path2 = str(tmp_path / "pq_union")
    build_pq_index(
        emb,
        path2,
        m=M,
        k=K,
        centroids=spark.read.parquet(f"{path}/centroids"),
        codebooks=spark.read.parquet(f"{path}/codebooks"),
    )

    def rows(p):
        return {
            (r.vec_id, r.cell, tuple(r.codes), tuple(r.vec))
            for r in spark.read.parquet(f"{p}/index").collect()
        }

    assert rows(path) == rows(path2)

    # probe-level equality on the two layouts, and appended ids are live:
    # querying WITH an appended vector finds its exact copy at d2 == 0
    queries = b.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 1000000).alias("qid"), F.col("vec").alias("qvec")
    )
    got = query_pq_index(spark, path, queries, m=M, nprobe=8, shortlist=50, top_k=5)
    want = query_pq_index(spark, path2, queries, m=M, nprobe=8, shortlist=50, top_k=5)
    g = {tuple(r) for r in got.collect()}
    assert g == {tuple(r) for r in want.collect()}
    hits = {
        r.qid - 1000000
        for r in got.collect()
        if r.rnk == 1 and r.d2_r == 0.0 and r.vec_id == r.qid - 1000000
    }
    assert hits == {r.vec_id for r in queries.select((F.col("qid") - 1000000).alias("vec_id")).collect()}


def test_default_quantizer_survives_offset_id_space(spark, emb, tmp_path):
    """ADVICE r6: `vec_id < n_cells` as the default coarse quantizer
    silently yields fewer (possibly zero) centroids on a sparse/offset id
    space. The fix selects the TRUE lowest n_cells ids, so an index built
    from ids starting at 10_000 still gets a full quantizer — and for the
    dense-from-0 fixtures the selection is unchanged (ids 0..n_cells-1)."""
    from pyspark_streaming_base_spark.operators.pq import build_pq_index

    shifted = emb.select((F.col("vec_id") + 10_000).alias("vec_id"), "vec")
    path = str(tmp_path / "pq_offset")
    build_pq_index(shifted, path, m=M, k=4, iters=1, n_cells=8)
    cent = spark.read.parquet(f"{path}/centroids")
    assert cent.count() == 8
    assert {r.cent_id for r in cent.collect()} == set(range(10_000, 10_008))
    # every corpus vector landed in a real cell
    idx = spark.read.parquet(f"{path}/index")
    assert idx.count() == shifted.count()
    assert idx.filter(F.col("cell").isNull()).count() == 0


def test_delete_excludes_from_scan_and_rerank(spark, emb, tmp_path):
    """Tombstoned IVFADC probe == probe of the index rebuilt over the
    survivors (frozen codebooks/centroids shared): deleted vectors
    leave BOTH the compressed candidate scan and the exact re-rank."""
    import os
    import shutil

    from pyspark_streaming_base_spark.operators.pq import (
        build_pq_index,
        compact_pq_index,
        delete_from_pq_index,
        query_pq_index,
    )

    path = str(tmp_path / "pq")
    build_pq_index(emb, path, m=M, k=K, iters=3, n_cells=8)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("vec").alias("qvec")
    )
    gone = [
        r[0]
        for r in emb.select("vec_id")
        .filter(F.col("vec_id") >= 3)
        .orderBy("vec_id")
        .limit(30)
        .collect()
    ]
    delete_from_pq_index(spark, path, gone)

    # rebuild-without: same frozen artifacts, index table filtered
    want = str(tmp_path / "want")
    os.makedirs(want)
    for artifact in ("codebooks", "centroids"):
        shutil.copytree(f"{path}/{artifact}", f"{want}/{artifact}")
    spark.read.parquet(f"{path}/index").filter(
        ~F.col("vec_id").isin(gone)
    ).write.parquet(f"{want}/index")

    def res(p):
        return sorted(
            map(
                tuple,
                query_pq_index(
                    spark, p, queries, m=M, nprobe=4, shortlist=20, top_k=5
                ).collect(),
            )
        )

    before = res(path)
    assert before == res(want)
    assert not any(r[1] in gone for r in before)

    compact_pq_index(spark, path)
    assert not os.path.exists(f"{path}/tombstones")
    assert res(path) == before

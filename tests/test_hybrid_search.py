"""End-to-end hybrid search over PERSISTED indexes: the deployment
composition — BM25 inverted file (lexical arm) + IVF vector index
(semantic arm) fused by RRF — built once, probed from disk, nothing
re-scanning the corpus at query time. The fused ranking must agree with
a python mirror computed from the two arms' own outputs, and each arm
must match its inline query twin."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from pyspark_streaming_base_spark.functions.vectorops import dvec
from pyspark_streaming_base_spark.operators.bm25 import (
    build_bm25_index,
    query_bm25_index,
)
from pyspark_streaming_base_spark.operators.ivf import (
    build_ivf_index,
    query_ivf_index,
)
from pyspark_streaming_base_spark.queries._tables import t

from tests.conftest import SF_SMALL

TERMS = ("scan", "merge", "window", "stream", "vector")
K = 60  # the RRF constant
DEPTH = 15


def test_hybrid_search_over_persisted_indexes(spark, tmp_path):
    docs = t(spark, SF_SMALL, "documents")
    emb = t(spark, SF_SMALL, "embeddings").select(
        "vec_id", dvec("embedding").alias("vec")
    )

    # build both indexes once (write-once / probe-many)
    bm25_path = str(tmp_path / "bm25")
    ivf_path = str(tmp_path / "ivf")
    build_bm25_index(docs, bm25_path)
    build_ivf_index(emb, ivf_path, k=16)

    # probe both arms from disk
    lex = query_bm25_index(spark, bm25_path, TERMS, top_k=DEPTH).select(
        "doc_id",
        F.row_number()
        .over(W.orderBy(F.col("score").desc(), "doc_id"))
        .cast("bigint")
        .alias("r_lex"),
    )
    queries = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("qid"), F.col("vec").alias("qvec")
    )
    vec = (
        query_ivf_index(spark, ivf_path, queries, nprobe=8, top_k=DEPTH)
        .filter(F.col("vec_id") != 0)
        .select("vec_id", F.col("rnk").alias("r_vec"))
    )

    fused = (
        lex.join(vec, lex["doc_id"] == vec["vec_id"], "full_outer")
        .select(
            F.coalesce(lex["doc_id"], vec["vec_id"]).alias("doc_id"),
            "r_lex",
            "r_vec",
            (
                F.coalesce(F.lit(1.0) / (F.lit(K) + F.col("r_lex")).cast("double"), F.lit(0.0))
                + F.coalesce(F.lit(1.0) / (F.lit(K) + F.col("r_vec")).cast("double"), F.lit(0.0))
            ).alias("rrf"),
        )
        .collect()
    )

    # python mirror from the arms' own outputs
    lex_rows = {r.doc_id: r.r_lex for r in lex.collect()}
    vec_rows = {r.vec_id: r.r_vec for r in vec.collect()}
    want = {}
    for d in set(lex_rows) | set(vec_rows):
        s = 0.0
        if d in lex_rows:
            s += 1.0 / (K + lex_rows[d])
        if d in vec_rows:
            s += 1.0 / (K + vec_rows[d])
        want[d] = s
    got = {r.doc_id: r.rrf for r in fused}
    assert got == want
    # docs present in both arms must outrank a same-rank single-arm doc
    both = [r for r in fused if r.r_lex is not None and r.r_vec is not None]
    if both:
        best_single = max(
            (r.rrf for r in fused if r.r_lex is None or r.r_vec is None),
            default=0.0,
        )
        assert max(r.rrf for r in both) > best_single / 2  # sanity, not vacuous

    # each arm equals its inline twin (the single-definition contract)
    from pyspark_streaming_base_spark.queries import load_all

    R = load_all()
    inline_lex = sorted(
        (r.doc_id, r.n_terms_hit, r.score)
        for r in R["q136_bm25_topk"].fn(spark, SF_SMALL).collect()
    )
    idx_lex = sorted(
        map(tuple, query_bm25_index(spark, bm25_path, TERMS, top_k=DEPTH).collect())
    )
    assert inline_lex == idx_lex

"""Vector similarity search (SURVEY.md §2C C18) over the ``embeddings``
table (``embedding: array<float>``, 64-dim).

Two paths, per the 100 TB design:

* brute-force cosine top-k — correct baseline; OK when the query set is
  small (broadcast) even if the corpus is huge: one scan, no shuffle of the
  corpus, per-partition top-k then a tiny final merge;
* LSH (random hyperplane) bucketed ANN — the scale path: corpus is hashed
  once to sign-pattern buckets, candidates come from equal buckets only.

All vector math is built-in (``zip_with`` + ``aggregate`` fold in double
precision) — no UDFs, stays inside codegen.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from pyspark_streaming_base_spark.functions.vectorops import cosine, dot, dvec as _dvec
from pyspark_streaming_base_spark.queries import query
from pyspark_streaming_base_spark.queries._exact import dround, dsum, sql_dround, sql_dsum
from pyspark_streaming_base_spark.queries._tables import t

#: Number of query vectors (lowest vec_ids) used by the demo queries.
_N_QUERIES = 3
_TOP_K = 10


@query(
    "q60_knn_bruteforce",
    oracle=f"""
    SELECT qid, vec_id, sim_r, rnk
    FROM (
      SELECT q.vec_id AS qid, c.vec_id AS vec_id,
             FLOOR((
               list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))
               / (SQRT(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))
                  * SQRT(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))))) * 1000000.0 + 0.5) / 1000000.0 AS sim_r,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY q.vec_id
               ORDER BY FLOOR((
                 list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))
                 / (SQRT(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))
                    * SQRT(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))))) * 1000000.0 + 0.5) / 1000000.0 DESC, c.vec_id
             ) AS BIGINT) AS rnk
      FROM (SELECT * FROM embeddings WHERE vec_id < {_N_QUERIES}) q
      JOIN embeddings c ON c.vec_id <> q.vec_id
    )
    WHERE rnk <= {_TOP_K}
    """,
)
def q60_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k for a small query set (C18 baseline).

    Similarities are rounded to 6 dp *before* ranking and ties break on
    vec_id, so the top-k set is deterministic across engines. Scale: the
    query side is broadcast; the corpus is scanned once with per-partition
    top-k (window rank ≤ k) — no corpus shuffle until the final tiny merge.
    """
    emb = t(spark, sf_dir, "embeddings")
    q = F.broadcast(
        emb.filter(F.col("vec_id") < _N_QUERIES).select(
            F.col("vec_id").alias("qid"), _dvec("embedding").alias("qvec")
        )
    )
    c = emb.select("vec_id", _dvec("embedding").alias("cvec"))
    sim = dround(cosine(F.col("qvec"), F.col("cvec")))
    ranked = (
        q.join(c, F.col("vec_id") != F.col("qid"))
        .withColumn("sim_r", sim)
        .withColumn(
            "rnk",
            F.row_number()
            .over(W.partitionBy("qid").orderBy(F.col("sim_r").desc(), F.col("vec_id")))
            .cast("bigint"),
        )
    )
    return ranked.filter(F.col("rnk") <= _TOP_K).select("qid", "vec_id", "sim_r", "rnk")


#: LSH parameters: L hash tables × b hyperplanes each (2^b buckets/table),
#: plus query-side MULTI-PROBE: each query also probes the buckets reached
#: by flipping subsets of its ``_N_FLIP_PLANES`` lowest-|margin| planes
#: (the planes it nearly fell on the other side of) — 2^flips probes per
#: table. Multi-probe buys recall without more tables and without touching
#: the corpus side: the index stays one bucket per vector per table; only
#: the (tiny, broadcast) query side fans out. Sized for weakly-clustered
#: corpora (top-k cosine ≈ 0.3): 8 tables × 5 planes × 4 probes measures
#: ≈ 0.9 top-10 recall at sf0.001 (vs ≈ 0.43 single-probe) — still a pure
#: bucket equi-join, never an O(n²) scan.
_N_TABLES = 8
_N_PLANES = 5
_N_FLIP_PLANES = 2  # probe all subsets of the 2 lowest-margin planes
_DIM = 64


# the one deterministic plane-mix definition (functions/vectorops.py),
# kept under its historical private name for this module's matrix builder
from pyspark_streaming_base_spark.functions.vectorops import (  # noqa: E402
    plane_component as _plane_component,
)


def _plane_matrix():
    """(dim × tables·planes) hyperplane matrix from the deterministic mix."""
    return np.array(
        [
            [_plane_component(tbl * 101 + p, d) for tbl in range(_N_TABLES) for p in range(_N_PLANES)]
            for d in range(_DIM)
        ],
        dtype=np.float64,
    )


#: encoded join key: table_index * 2^planes + bucket — one long per probe
_TABLE_OFFSETS = (np.arange(_N_TABLES, dtype=np.int64) << _N_PLANES)


def _bucket_udf():
    """Pandas UDF: embedding → array of per-table encoded bucket keys
    (``tbl * 2^planes + bucket``), one per table.

    Bucket assignment is dense linear algebra — (batch × dim) @ (dim ×
    tables·planes) — which is exactly the case where an Arrow-batched
    numpy matmul beats interpreted expression folds (~40 higher-order
    folds/row otherwise). Deterministic: fixed plane matrix, sign test.
    """
    W_planes = _plane_matrix()
    powers = (1 << np.arange(_N_PLANES, dtype=np.int64))

    @F.pandas_udf(ArrayType(LongType()))
    def buckets(emb: pd.Series) -> pd.Series:
        X = np.stack(emb.to_numpy()).astype(np.float64)  # (n, dim)
        S = X @ W_planes >= 0  # (n, tables*planes) sign bits
        B = S.reshape(len(X), _N_TABLES, _N_PLANES) @ powers  # (n, tables)
        return pd.Series(list((B + _TABLE_OFFSETS).astype(np.int64)))

    return buckets


def _multiprobe_udf():
    """Pandas UDF (query side only): embedding → array of encoded bucket
    keys covering the primary bucket PLUS every subset-flip of the
    ``_N_FLIP_PLANES`` lowest-|margin| planes per table — the standard
    multi-probe LSH sequence (the planes the vector nearly crossed are
    the likeliest to separate it from a true neighbor).

    2^flips probes per table; the corpus/index side stays single-probe,
    so index size and build cost are unchanged — only the broadcast query
    rows fan out (queries × tables × 2^flips keys).
    """
    W_planes = _plane_matrix()
    powers = (1 << np.arange(_N_PLANES, dtype=np.int64))
    n_subsets = 1 << _N_FLIP_PLANES

    @F.pandas_udf(ArrayType(LongType()))
    def probes(emb: pd.Series) -> pd.Series:
        X = np.stack(emb.to_numpy()).astype(np.float64)  # (n, dim)
        M = (X @ W_planes).reshape(len(X), _N_TABLES, _N_PLANES)
        prim = ((M >= 0) @ powers).astype(np.int64)  # (n, tables)
        # indices of the flip-candidate planes, ascending |margin|
        low = np.argsort(np.abs(M), axis=2)[:, :, :_N_FLIP_PLANES]  # (n, T, F)
        out = np.empty((len(X), _N_TABLES, n_subsets), dtype=np.int64)
        for s in range(n_subsets):
            mask = np.zeros(prim.shape, dtype=np.int64)
            for f in range(_N_FLIP_PLANES):
                if s >> f & 1:
                    mask ^= np.int64(1) << low[:, :, f]
            out[:, :, s] = prim ^ mask
        out += _TABLE_OFFSETS[None, :, None]
        return pd.Series(list(out.reshape(len(X), -1)))

    return probes


@query("q61_ann_lsh", oracle=None)  # bucket assignment is engine-side; pytest checks recall
def q61_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate nearest neighbors (C18 scale path), with
    query-side multi-probe.

    Random-hyperplane signatures over ``_N_TABLES`` independent hash tables
    (deterministic planes, no RNG) bucket the corpus ONCE (one key per
    table per vector); each query probes its own bucket plus the
    subset-flips of its lowest-|margin| planes (multi-probe), so a corpus
    vector is a candidate iff it lands in any probed bucket of any table.
    Driver does a rows-only check; the pytest suite pins recall ≥ 0.8
    against q60's exact brute-force top-k.

    Scale: corpus is hashed in one scan (all tables' keys computed
    per-row, then stacked); the candidate join is an equi-join on the
    encoded (table, bucket) key — a standard hash join on a
    well-distributed long versus an infeasible O(n²) cross product. Hot
    buckets are AQE skew-join territory. Multi-probe multiplies only the
    broadcast QUERY rows (× 2^flips), never the corpus index. The
    bucket/dedup phase moves only (vec_id, key) longs — the 64-dim
    vectors never enter the exploded join or the distinct; they are
    re-attached per *surviving candidate id* afterwards (at 100 TB that's
    the difference between shuffling 8×512 B/row of vector payload and
    8×16 B/row of keys).
    """
    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", _dvec("embedding").alias("vec")
    )
    stacked = emb.withColumn("bks", _bucket_udf()(F.col("vec"))).select(
        "vec_id", F.explode("bks").alias("bk")
    )
    q = F.broadcast(
        emb.filter(F.col("vec_id") < _N_QUERIES)
        .withColumn("pks", _multiprobe_udf()(F.col("vec")))
        .select(F.col("vec_id").alias("qid"), F.explode("pks").alias("qbk"))
    )
    cand = (
        q.join(
            stacked,
            (F.col("bk") == F.col("qbk")) & (F.col("vec_id") != F.col("qid")),
        )
        .select("qid", "vec_id")
        .distinct()  # collapse multi-table/multi-probe collisions before scoring
    )
    qvecs = F.broadcast(
        emb.filter(F.col("vec_id") < _N_QUERIES).select(
            F.col("vec_id").alias("qid"), F.col("vec").alias("qvec")
        )
    )
    scored = cand.join(emb, "vec_id").join(qvecs, "qid")
    sim = F.round(cosine(F.col("qvec"), F.col("vec")), 6)
    ranked = scored.withColumn("sim_r", sim).withColumn(
        "rnk",
        F.row_number()
        .over(W.partitionBy("qid").orderBy(F.col("sim_r").desc(), F.col("vec_id")))
        .cast("bigint"),
    )
    return ranked.filter(F.col("rnk") <= _TOP_K).select("qid", "vec_id", "sim_r", "rnk")


#: IVF parameters: K coarse cells, nprobe cells searched per query.
_IVF_K = 16
_IVF_NPROBE = 2


@query("q63_ann_ivf", oracle=None)  # cell assignment is engine-side; pytest checks recall
def q63_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) approximate nearest neighbors — the cell-probe
    alternative to q61's LSH: the corpus is partitioned into K coarse
    cells by nearest centroid; a query scores only the ``nprobe`` cells
    whose centroids it is closest to.

    The coarse quantizer here is deterministic-by-construction (the K
    lowest-vec_id vectors serve as centroids — a production system would
    k-means a sample; the *index structure* is what this operator
    demonstrates). Rows-only driver check; pytest measures recall against
    q60's exact top-k.

    Scale: centroids are a K-row broadcast; cell assignment is one
    broadcast-join scan of the corpus (argmin over K cosines, no
    shuffle); the probe join is an equi-join on cell id. Versus LSH:
    IVF's cell count tunes partition granularity directly (K ~ √n), and
    nprobe trades recall for scan fraction (nprobe/K of the corpus)
    without re-indexing.
    """
    # assignment + cell-probe search: one definition in operators/ivf.py
    # (shared with the persisted index build/probe path)
    from pyspark_streaming_base_spark.operators.ivf import ivf_assign, ivf_search

    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", _dvec("embedding").alias("vec")
    )
    cents = emb.filter(F.col("vec_id") < _IVF_K).select(
        F.col("vec_id").alias("cent_id"), F.col("vec").alias("cvec")
    )
    assigned = ivf_assign(emb, cents)
    queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("vec").alias("qvec")
    )
    return ivf_search(queries, cents, assigned, _IVF_NPROBE, _TOP_K)


@query(
    "q62_centroid_by_label",
    oracle="""
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           {s} AS sum_norm
    FROM (
      SELECT label,
             FLOOR((SQRT(list_dot_product(CAST(embedding AS DOUBLE[]),
                                         CAST(embedding AS DOUBLE[])))) * 1000000.0 + 0.5) / 1000000.0 AS emb_norm
      FROM embeddings
    )
    GROUP BY label
    """.format(s=sql_dsum("emb_norm")),
)
def q62_centroid_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label vector stats (C18 support op): count + summed L2 norm.

    Each per-row norm is deterministic (identical fold → identical
    double) and is rounded to 6 dp *before* the sum, which then runs on
    the exact scaled-int64 path — rounding an order-dependent float SUM
    after the fact would sit on a rounding-grid knife edge (see
    ``_exact.py``).
    """
    emb = t(spark, sf_dir, "embeddings")
    norm = dround(F.sqrt(dot(_dvec("embedding"), _dvec("embedding"))))
    return (
        emb.select("label", norm.alias("emb_norm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            dsum(F.col("emb_norm")).alias("sum_norm"),
        )
    )


@query(
    "q68_label_centroids",
    oracle="""
    SELECT label, dim,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(CAST(ROUND(CAST(val AS DOUBLE) * 1000000.0, 0) AS BIGINT))
             AS DOUBLE) / 1000000.0 / COUNT(*) AS centroid_val
    FROM (
      SELECT label,
             unnest(embedding) AS val,
             generate_subscripts(embedding, 1) AS dim
      FROM embeddings
    )
    GROUP BY label, dim
    """,
)
def q68_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the embedding vectors (the aggregate every
    IVF/k-means-style index build and class-prototype computation needs),
    with EXACT cross-engine math: a naive per-dimension ``avg(double)``
    sums in engine-specific order and drifts in the last bits, so each
    dimension goes through the scaled-int64 path (`_exact.py`) — posexplode
    to (label, dim, value), int sums, divide once.

    Long output grain (label, dim) keeps the whole query in built-in
    hash aggregation; re-assembling array centroids is a single
    ``array_agg`` over 64 rows per label downstream.

    Scale: the explode multiplies rows ×64, but map-side partial
    aggregation collapses the shuffle to O(labels × dims × tasks) rows of
    ~24 B — the corpus's vectors never cross the wire. ``dim`` is 1-based
    to match DuckDB's ``generate_subscripts``.
    """
    e = t(spark, sf_dir, "embeddings").select(
        "label", F.posexplode("embedding").alias("pos", "val")
    )
    return (
        e.select(
            "label",
            (F.col("pos") + 1).cast("bigint").alias("dim"),
            F.col("val").cast("double").alias("val"),
        )
        .groupBy("label", "dim")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            (dsum(F.col("val")) / F.count(F.lit(1))).alias("centroid_val"),
        )
    )


#: PQ parameters: 16 subspaces of 4 dims, 16 codewords each (16-byte
#: codes = 16× compression of the 64-dim float corpus), ADC shortlist of
#: 50 re-ranked exactly to a top-10. Measured ≈0.87 top-10 recall vs
#: q60's exact scan at sf0.001/sf0.01 (pinned ≥0.75 in tests/test_pq.py).
_PQ_M = 16
_PQ_K = 16
_PQ_SHORTLIST = 50


@query("q109_pq_ann")  # iterative float codebooks — rows-only by design
def q109_pq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN with exact re-rank (C18 extension).

    The third ANN family next to LSH (q61) and IVF (q63), covering the
    axis they don't: MEMORY. Codebooks are trained by joint distributed
    Lloyd rounds (all 16 subspaces in the same jobs), the corpus is
    stored as 16 one-byte codes, candidate generation is a code-table
    scan (Asymmetric Distance Computation via a broadcast M×K table per
    query), and the 50-candidate shortlist is re-ranked with exact
    distances — full-precision math touches only O(queries × shortlist)
    rows. Deterministic: vec_id-prefix init, (d2, cid) argmin ties,
    (d2_r, vec_id) rank ties. Like q94/q61, float iteration makes the
    result engine-specific → rows-only here; recall and the
    ADC-reconstruction identity are pinned in ``tests/test_pq.py``.
    """
    from pyspark_streaming_base_spark.operators.pq import (
        pq_codebooks,
        pq_encode,
        pq_search_rerank,
    )

    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", _dvec("embedding").alias("vec")
    )
    cb = pq_codebooks(emb, _PQ_M, _PQ_K, iters=3)
    enc = pq_encode(emb, cb, _PQ_M)
    queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("vec").alias("qvec")
    )
    return pq_search_rerank(
        emb, enc, cb, queries, _PQ_M, shortlist=_PQ_SHORTLIST, top_k=_TOP_K
    )


#: IVFADC: 8 coarse cells probed 4-deep (half the corpus pruned before
#: any scoring), PQ codes score the survivors, exact re-rank of 50.
_IVFADC_CELLS = 8
_IVFADC_NPROBE = 4


@query("q111_ivfadc_ann")  # iterative float quantizers — rows-only by design
def q111_ivfadc_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC ANN (C18 capstone): the standard published two-level stack
    composed from this package's own operators — IVF coarse cells prune
    the corpus to ``nprobe/n_cells`` of its rows per query, PQ codes
    score the survivors at 16 bytes/vector (ADC), and the 50-candidate
    shortlist is re-ranked exactly. Coarse and fine quantizers are the
    SAME single-definition helpers q63 and q109 use (``ivf_assign`` /
    ``ivf_probe_cells`` / ``pq_codebooks`` / ``pq_encode``), so the
    composition is configuration, not new math. Rows-only like its
    parents; recall vs the exact scan is pinned in ``test_pq.py``.
    """
    from pyspark_streaming_base_spark.operators.ivf import ivf_assign
    from pyspark_streaming_base_spark.operators.pq import (
        ivfadc_search,
        pq_codebooks,
        pq_encode,
    )

    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", _dvec("embedding").alias("vec")
    )
    centroids = emb.filter(F.col("vec_id") < _IVFADC_CELLS).select(
        F.col("vec_id").alias("cent_id"), F.col("vec").alias("cvec")
    )
    assigned = ivf_assign(emb, centroids).select("vec_id", "cell")
    cb = pq_codebooks(emb, _PQ_M, _PQ_K, iters=3)
    enc = pq_encode(emb, cb, _PQ_M)
    queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("vec").alias("qvec")
    )
    return ivfadc_search(
        emb,
        assigned,
        enc,
        cb,
        centroids,
        queries,
        _PQ_M,
        nprobe=_IVFADC_NPROBE,
        shortlist=_PQ_SHORTLIST,
        top_k=_TOP_K,
    )


#: q131 drift-demo parameters: 8 frozen cells, every-10th-id batch with a
#: deterministic affine shift (x*1.2 + 0.1) — enough to move every drift
#: statistic without leaving the exact-math grid.
_DRIFT_K = 8

_Q131_D2 = (
    "(list_dot_product({a}.v, {a}.v) - 2 * list_dot_product({a}.v, c.cv))"
    " + list_dot_product(c.cv, c.cv)"
)


def _q131_oracle() -> str:
    from pyspark_streaming_base_spark.queries._exact import sql_dround, sql_dsum

    mean0 = sql_dround("bs.s0 / bs.n_base")
    mean1 = sql_dround("ts.s1 / ts.n_batch")
    return f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    cent AS (
      SELECT vec_id AS cid, v AS cv FROM e ORDER BY vec_id LIMIT {_DRIFT_K}
    ),
    base_d AS (
      SELECT e.vec_id, c.cid, {_Q131_D2.format(a='e')} AS d2
      FROM e CROSS JOIN cent c
    ),
    base AS (
      SELECT vec_id, cid, d2 FROM (
        SELECT vec_id, cid, d2,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
        FROM base_d
      ) WHERE rn = 1
    ),
    bt0 AS (
      SELECT vec_id, list_transform(v, x -> x * 1.2 + 0.1) AS v
      FROM e WHERE vec_id % 10 = 0
    ),
    bt_d AS (
      SELECT b.vec_id, c.cid, {_Q131_D2.format(a='b')} AS d2
      FROM bt0 b CROSS JOIN cent c
    ),
    bt AS (
      SELECT vec_id, cid, d2 FROM (
        SELECT vec_id, cid, d2,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
        FROM bt_d
      ) WHERE rn = 1
    ),
    bs AS (
      SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_base,
             {sql_dsum(sql_dround('d2'))} AS s0
      FROM base GROUP BY cid
    ),
    ts AS (
      SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_batch,
             {sql_dsum(sql_dround('d2'))} AS s1
      FROM bt GROUP BY cid
    ),
    tot AS (
      SELECT (SELECT SUM(n_base) FROM bs) AS t0,
             (SELECT SUM(n_batch) FROM ts) AS t1
    )
    SELECT bs.cid, bs.n_base,
           COALESCE(ts.n_batch, 0) AS n_batch,
           {mean0} AS mean_d2_base_r,
           COALESCE({mean1}, 0.0) AS mean_d2_batch_r,
           COALESCE({sql_dround(f"({mean1}) / ({mean0})")}, 0.0)
             AS drift_ratio_r,
           {sql_dround('CAST(bs.n_base AS DOUBLE) / t0')} AS occ_base_r,
           {sql_dround('CAST(COALESCE(ts.n_batch, 0) AS DOUBLE) / t1')}
             AS occ_batch_r
    FROM bs LEFT JOIN ts ON bs.cid = ts.cid CROSS JOIN tot
    """


@query("q131_embedding_drift", oracle=_q131_oracle())
def q131_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantizer drift statistics (C18 index lifecycle — the exact twin
    of ``operators/drift.py``'s monitor): per frozen cell, member count,
    mean quantization error, error ratio, and occupancy for the corpus
    vs a deterministically shifted batch (every 10th vector, x·1.2+0.1 —
    a stand-in for tomorrow's drifted crawl).

    Exact cross-engine math throughout: d2 is the dot-product expansion
    (three sequential folds, each bit-identical to DuckDB's
    ``list_dot_product``), the argmin tie-breaks on (d2, cid) with
    IDENTICAL doubles on both engines, and every mean/ratio goes through
    dround/dsum (per-row round → scaled-int sum → round the quotient).

    Scale: the centroid table broadcasts (k rows); both assigns are one
    corpus/batch scan with a map-side-combinable struct-min argmin —
    the same shape as ``assign_to_centroids``; the report joins k-row
    aggregates. The production monitor reads its baseline from the
    persisted index instead of recomputing it (``write_drift_baseline``
    at build, ``merge_drift_baseline`` per accepted batch).
    """
    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", _dvec("embedding").alias("v")
    )
    cent = F.broadcast(
        emb.orderBy("vec_id")
        .limit(_DRIFT_K)
        .select(F.col("vec_id").alias("cid"), F.col("v").alias("cv"))
    )
    d2 = (
        dot(F.col("v"), F.col("v")) - 2 * dot(F.col("v"), F.col("cv"))
    ) + dot(F.col("cv"), F.col("cv"))

    def assign(df: DataFrame) -> DataFrame:
        return (
            df.crossJoin(cent)
            .withColumn("d2", d2)
            .groupBy("vec_id")
            .agg(F.min(F.struct("d2", "cid")).alias("m"))
            .select("vec_id", F.col("m.cid").alias("cid"), F.col("m.d2").alias("d2"))
        )

    base = assign(emb)
    batch = assign(
        emb.filter(F.col("vec_id") % 10 == 0).select(
            "vec_id", F.transform("v", lambda x: x * 1.2 + 0.1).alias("v")
        )
    )
    bs = base.groupBy("cid").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_base"),
        dsum(dround(F.col("d2"))).alias("s0"),
    )
    ts = batch.groupBy("cid").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_batch"),
        dsum(dround(F.col("d2"))).alias("s1"),
    )
    tot0 = bs.agg(F.sum("n_base").alias("t0"))
    tot1 = ts.agg(F.sum("n_batch").alias("t1"))
    mean0 = dround(F.col("s0") / F.col("n_base"))
    mean1 = dround(F.col("s1") / F.col("n_batch"))
    return (
        bs.join(ts, "cid", "left")
        .crossJoin(F.broadcast(tot0))
        .crossJoin(F.broadcast(tot1))
        .select(
            F.col("cid").cast("bigint").alias("cid"),
            "n_base",
            F.coalesce(F.col("n_batch"), F.lit(0)).cast("bigint").alias("n_batch"),
            mean0.alias("mean_d2_base_r"),
            F.coalesce(mean1, F.lit(0.0)).alias("mean_d2_batch_r"),
            F.coalesce(dround(mean1 / mean0), F.lit(0.0)).alias("drift_ratio_r"),
            dround(F.col("n_base").cast("double") / F.col("t0")).alias("occ_base_r"),
            dround(
                F.coalesce(F.col("n_batch"), F.lit(0)).cast("double") / F.col("t1")
            ).alias("occ_batch_r"),
        )
    )


# ---------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion of BM25 + vector ranks
# ---------------------------------------------------------------------------

#: RRF smoothing constant (Cormack, Clarke & Büttcher, SIGIR 2009 — the
#: standard k=60) and the per-arm list depth. ``vec_id i`` is the
#: embedding of ``doc_id i`` in the synthetic testdata, the shared id the
#: fusion joins on.
_RRF_K = 60
_RRF_DEPTH = 15


def _rrf_oracle() -> str:
    from pyspark_streaming_base_spark.queries.text import BM25_SQL_CTES

    return f"""{BM25_SQL_CTES}
    , lex AS (
      SELECT doc_id,
             CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT)
               AS r_lex
      FROM (SELECT * FROM bm25 ORDER BY score DESC, doc_id LIMIT {_RRF_DEPTH})
    ),
    vq AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
    sims AS (
      SELECT c.vec_id,
             FLOOR((
               list_dot_product(CAST(vq.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))
               / (SQRT(list_dot_product(CAST(vq.embedding AS DOUBLE[]), CAST(vq.embedding AS DOUBLE[])))
                  * SQRT(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))))) * 1000000.0 + 0.5) / 1000000.0 AS sim_r
      FROM embeddings c CROSS JOIN vq
      WHERE c.vec_id <> 0
    ),
    vtop AS (
      SELECT vec_id,
             CAST(ROW_NUMBER() OVER (ORDER BY sim_r DESC, vec_id) AS BIGINT)
               AS r_vec
      FROM (SELECT * FROM sims ORDER BY sim_r DESC, vec_id LIMIT {_RRF_DEPTH})
    )
    SELECT COALESCE(l.doc_id, v.vec_id) AS doc_id, l.r_lex, v.r_vec,
           (COALESCE(CAST(1 AS DOUBLE) / CAST({_RRF_K} + l.r_lex AS DOUBLE), 0.0)
            + COALESCE(CAST(1 AS DOUBLE) / CAST({_RRF_K} + v.r_vec AS DOUBLE), 0.0))
             AS rrf_score
    FROM lex l FULL OUTER JOIN vtop v ON l.doc_id = v.vec_id
    """


@query("q138_rrf_hybrid_fusion", oracle=_rrf_oracle())
def q138_rrf_hybrid_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion (C18/C19 extension):
    fuse the BM25 lexical top-15 (q136's scorer, single definition —
    both the Spark arm and the oracle arm are reused verbatim) with the
    cosine top-15 around query vector 0 by
    ``RRF(d) = Σ_arms 1/(60 + rank_arm(d))`` — the fusion rule hybrid
    RAG search stacks run because it needs NO score calibration between
    arms, only ranks. Cormack et al., SIGIR 2009 — public.

    Determinism: both rank lists order on (exact score desc, id); RRF
    adds two correctly-rounded ``1.0/int`` doubles in a fixed order, so
    the fused score is bit-identical cross-engine. Missing-arm docs
    contribute 0.0 from that arm (FULL OUTER join).

    Scale: each arm is already scale-shaped (BM25 = broadcast-folded
    aggregates + TakeOrderedAndProject; cosine = broadcast query, one
    corpus scan, per-partition top-k). Ranking WITHIN a top-k list is a
    bounded k-row window — the single-partition exchange the linter
    reports is 15 rows by construction. The fusion join is k-vs-k.
    """
    from pyspark_streaming_base_spark.queries.text import q136_bm25_topk

    lex = q136_bm25_topk(spark, sf_dir).select(
        "doc_id",
        F.row_number()
        .over(W.orderBy(F.col("score").desc(), "doc_id"))
        .cast("bigint")
        .alias("r_lex"),
    )
    emb = t(spark, sf_dir, "embeddings")
    vq = F.broadcast(
        emb.filter(F.col("vec_id") == 0).select(_dvec("embedding").alias("qvec"))
    )
    sims = (
        emb.filter(F.col("vec_id") != 0)
        .select("vec_id", _dvec("embedding").alias("cvec"))
        .crossJoin(vq)
        .select("vec_id", dround(cosine(F.col("qvec"), F.col("cvec"))).alias("sim_r"))
    )
    vtop = (
        sims.orderBy(F.col("sim_r").desc(), "vec_id")
        .limit(_RRF_DEPTH)
        .select(
            "vec_id",
            F.row_number()
            .over(W.orderBy(F.col("sim_r").desc(), "vec_id"))
            .cast("bigint")
            .alias("r_vec"),
        )
    )
    fused = lex.join(vtop, lex["doc_id"] == vtop["vec_id"], "full_outer")
    arm = lambda r: F.coalesce(  # noqa: E731 — tiny local shorthand
        F.lit(1.0) / (F.lit(_RRF_K) + F.col(r)).cast("double"), F.lit(0.0)
    )
    return fused.select(
        F.coalesce(lex["doc_id"], vtop["vec_id"]).alias("doc_id"),
        "r_lex",
        "r_vec",
        (arm("r_lex") + arm("r_vec")).alias("rrf_score"),
    )


# ---------------------------------------------------------------------------
# MMR diversity re-ranking
# ---------------------------------------------------------------------------

_MMR_LAMBDA = 0.7
_MMR_CAND = 32
_MMR_K = 10


_MMR_COS = (
    "FLOOR((list_dot_product({a}, {b}) / "
    "(SQRT(list_dot_product({a}, {a})) * SQRT(list_dot_product({b}, {b})))) "
    "* 1000000.0 + 0.5) / 1000000.0"
)


@query(
    "q140_mmr_diverse_topk",
    # ORACLE since r9 (rows-only before): greedy selection over the
    # 32-candidate shortlist is a single-row recursive CTE carrying the
    # selected LIST; with all pairwise sims and relevances on the 10⁻⁶
    # grid (operators/mmr.py rounds them before scoring), the argmax
    # compares bit-identical doubles on both engines, so the selection
    # — not just the scores — hash-matches. The q168/q44 rows-only →
    # recursive-CTE precedent applied to an iterative GREEDY op.
    oracle=f"""
    WITH RECURSIVE
    q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
    cand AS MATERIALIZED (
      SELECT vec_id, v, rel_r FROM (
        SELECT c.vec_id, CAST(c.embedding AS DOUBLE[]) AS v,
               {_MMR_COS.format(a="CAST(c.embedding AS DOUBLE[])", b="q.qv")} AS rel_r
        FROM embeddings c, q WHERE c.vec_id <> 0
      ) ORDER BY rel_r DESC, vec_id LIMIT {{cand}}
    ),
    sims AS MATERIALIZED (
      SELECT a.vec_id AS ia, b.vec_id AS ib,
             {_MMR_COS.format(a="a.v", b="b.v")} AS sim_r
      FROM cand a JOIN cand b ON a.vec_id <> b.vec_id
    ),
    sel AS (
      SELECT CAST(1 AS BIGINT) AS sel_rank, p.vec_id, p.rel_r,
             FLOOR(({{lam}} * p.rel_r) * 1000000.0 + 0.5) / 1000000.0 AS mmr_r,
             [p.vec_id] AS chosen
      FROM (SELECT vec_id, rel_r FROM cand
            ORDER BY {{lam}} * rel_r DESC, vec_id LIMIT 1) p
      UNION ALL
      SELECT s.sel_rank + 1, nxt.vec_id, nxt.rel_r,
             FLOOR(nxt.score * 1000000.0 + 0.5) / 1000000.0,
             list_append(s.chosen, nxt.vec_id)
      FROM sel s, LATERAL (
        SELECT c.vec_id, c.rel_r,
               {{lam}} * c.rel_r - (1 - {{lam}}) * COALESCE((
                 SELECT MAX(m.sim_r) FROM sims m
                 WHERE m.ia = c.vec_id AND list_contains(s.chosen, m.ib)
               ), 0.0) AS score
        FROM cand c
        WHERE NOT list_contains(s.chosen, c.vec_id)
        ORDER BY score DESC, c.vec_id
        LIMIT 1
      ) nxt
      WHERE s.sel_rank < {{k}}
    )
    SELECT sel_rank, vec_id, rel_r, mmr_r FROM sel
    """.replace("{cand}", str(_MMR_CAND))
    .replace("{lam}", str(_MMR_LAMBDA))
    .replace("{k}", str(_MMR_K)),
)
def q140_mmr_diverse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance diverse top-k (C18 extension): re-rank
    the cosine top-32 around query vector 0 by greedily picking
    ``argmax λ·rel(i) − (1−λ)·max_{j∈S} sim(i, j)`` — the diversity
    selection step retrieval and data-curation pipelines run so the k
    results (or k training exemplars) aren't 10 copies of the same
    near-duplicate. Carbonell & Goldstein, SIGIR 1998 — public.

    Scale shape: the DISTRIBUTED part does all the data reduction — one
    corpus scan, broadcast query, ``TakeOrderedAndProject`` down to the
    32-row candidate shortlist. Greedy MMR is inherently sequential, so
    it runs as ONE bounded Arrow group (32×64 floats) via
    ``applyInPandas`` — the same bounded-re-rank tier as q111's ADC
    shortlist; nothing sequential ever sees more than ``_MMR_CAND``
    rows. Ties break on vec_id; relevance enters pre-rounded on the
    10⁻⁶ grid so selection is reproducible. The greedy step is the ONE
    definition in ``operators/mmr.py`` (shared with q150's capstone).
    """
    from pyspark_streaming_base_spark.operators.mmr import mmr_rerank

    emb = t(spark, sf_dir, "embeddings")
    vq = F.broadcast(
        emb.filter(F.col("vec_id") == 0).select(_dvec("embedding").alias("qvec"))
    )
    cands = (
        emb.filter(F.col("vec_id") != 0)
        .select("vec_id", _dvec("embedding").alias("vec"))
        .crossJoin(vq)
        .select(
            "vec_id",
            "vec",
            dround(cosine(F.col("qvec"), F.col("vec"))).alias("rel_r"),
        )
        .orderBy(F.col("rel_r").desc(), "vec_id")
        .limit(_MMR_CAND)
    )
    return mmr_rerank(cands, k=_MMR_K, lam=_MMR_LAMBDA)


# ---------------------------------------------------------------------------
# ANN index health: recall@k / MRR against the exact baseline
# ---------------------------------------------------------------------------


@query("q146_ann_recall_eval", oracle=None)  # the candidate arm (q61 LSH)
# is engine-side, so rows-only; the metric ARITHMETIC is pinned against a
# python mirror and the recall floor in tests/test_dedup_similarity.py
def q146_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN index health metrics (C18 extension): per-query recall@k and
    reciprocal rank of the LSH index (q61) against the exact brute-force
    truth (q60) — the evaluation job a retrieval deployment schedules
    next to its drift monitors (q131/q141 watch the DATA moving; this
    watches the INDEX's answer quality, the number that decides a
    rebuild). Standard IR metrics — public.

    Determinism: both arms are deterministic registered queries; recall
    is an exact integer ratio; RR is ``1/rank`` or exactly 0.0 for a
    missed truth-top-1.

    Scale: all inputs are k-row-per-query lists by construction — the
    metric joins touch (queries × k) rows regardless of corpus size; the
    expensive parts (the ANN probe, the exact baseline) are the operators
    under test, not the evaluator.
    """
    truth = q60_knn_bruteforce(spark, sf_dir).select(
        "qid", "vec_id", F.col("rnk").alias("rnk_t")
    )
    cand = q61_ann_lsh(spark, sf_dir).select(
        "qid", "vec_id", F.col("rnk").alias("rnk_c")
    )
    hits = truth.join(cand, ["qid", "vec_id"])
    per_q = truth.groupBy("qid").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_truth")
    )
    n_hit = hits.groupBy("qid").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hit")
    )
    top1 = truth.filter(F.col("rnk_t") == 1).join(
        cand, ["qid", "vec_id"], "left"
    )
    rr = top1.select(
        "qid",
        F.coalesce(
            F.lit(1.0) / F.col("rnk_c").cast("double"), F.lit(0.0)
        ).alias("rr"),
    )
    return (
        per_q.join(n_hit, "qid", "left")
        .join(rr, "qid", "left")
        .select(
            "qid",
            "n_truth",
            F.coalesce("n_hit", F.lit(0)).cast("bigint").alias("n_hit"),
            (
                F.coalesce("n_hit", F.lit(0)).cast("double")
                / F.col("n_truth").cast("double")
            ).alias("recall_at_k"),
            F.coalesce("rr", F.lit(0.0)).alias("rr"),
        )
    )


# ---------------------------------------------------------------------------
# Retrieval capstone: hybrid fusion + diversity in one pipeline
# ---------------------------------------------------------------------------


@query("q150_retrieval_pipeline", oracle=None)  # the MMR tail is greedy-
# sequential (rows-only by design); the RRF head is the oracle-checked
# q138 and the greedy step is q140's mirror-pinned shared definition
def q150_retrieval_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval capstone (C18/C19): the full search pipeline a RAG
    deployment runs, composed end-to-end from the registry's own
    oracle-checked stages — BM25 lexical arm + cosine vector arm fused
    by RRF (q138, exact), then MMR diversity re-ranking of the fused
    shortlist (``operators/mmr.py``, the q140 definition) so the final
    k aren't near-duplicates of each other. q100 is the training
    capstone; this is the serving one.

    Scale: both arms reduce distributedly to k-row lists; the fusion is
    k-vs-k; vectors re-attach to the ≤2k-row fused shortlist by one
    broadcast-backed join; the sequential greedy sees only that
    shortlist (bounded Arrow group).
    """
    from pyspark_streaming_base_spark.operators.mmr import mmr_rerank

    fused = q138_rrf_hybrid_fusion(spark, sf_dir).select(
        "doc_id", F.col("rrf_score").alias("rrf")
    )
    # RRF scores live on a ~1/k scale while cosine diversity lives on
    # [−1, 1] — min-max normalize relevance over the shortlist so the
    # λ trade-off is meaningful (1-row broadcast, exact-double affine)
    mm = fused.agg(F.min("rrf").alias("lo"), F.max("rrf").alias("hi"))
    rel = fused.crossJoin(F.broadcast(mm)).select(
        "doc_id",
        F.when(F.col("hi") > F.col("lo"),
               (F.col("rrf") - F.col("lo")) / (F.col("hi") - F.col("lo")))
        .otherwise(F.lit(1.0))
        .alias("rel_r"),
    )
    emb = t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), _dvec("embedding").alias("vec")
    )
    shortlist = rel.join(emb, "doc_id")
    out = mmr_rerank(
        shortlist, k=_MMR_K, lam=_MMR_LAMBDA, id_col="doc_id"
    )
    return out.select("sel_rank", "doc_id", "rel_r", "mmr_r")


# ---------------------------------------------------------------------------
# Contrastive-training pair mining: random + hard negatives
# ---------------------------------------------------------------------------

_NEG_ANCHORS = 4  # lowest vec_ids serve as demo anchors
_NEG_K = 8


@query(
    "q151_negative_sampling",
    oracle=f"""
    SELECT anchor_id, vec_id, neg_rank
    FROM (
      SELECT a.vec_id AS anchor_id, c.vec_id AS vec_id,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY a.vec_id
               ORDER BY md5(CAST(a.vec_id AS VARCHAR) || ':' || CAST(c.vec_id AS VARCHAR)),
                        c.vec_id
             ) AS BIGINT) AS neg_rank
      FROM (SELECT vec_id, label FROM embeddings WHERE vec_id < {_NEG_ANCHORS}) a
      JOIN embeddings c ON c.label <> a.label
    )
    WHERE neg_rank <= {_NEG_K}
    """,
)
def q151_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random negative sampling for contrastive training (C18/pipeline
    extension): per anchor, k uniform negatives drawn from the
    DIFFERENT-label pool — the in-batch-negatives data-prep step of
    embedding training, made deterministic the repo way: the "random"
    order is the md5 of (anchor_id ':' cand_id), a keyed hash identical
    in both engines (determinism invariant 5 — no RNG, reproducible
    across runs/partitionings, and each anchor gets an independent
    permutation because the anchor id salts the hash).

    Scale: anchors are a tiny broadcast; ONE corpus scan computes the
    hash key; per-anchor top-k is WindowGroupLimit (per-partition
    pre-filter) — at any corpus size the exchange carries
    ~k × anchors × tasks rows, never the label-pool cross product.
    """
    emb = t(spark, sf_dir, "embeddings")
    anchors = F.broadcast(
        emb.filter(F.col("vec_id") < _NEG_ANCHORS).select(
            F.col("vec_id").alias("anchor_id"), F.col("label").alias("a_label")
        )
    )
    ranked = (
        anchors.join(emb.select("vec_id", "label"), F.col("label") != F.col("a_label"))
        .withColumn(
            "neg_rank",
            F.row_number()
            .over(
                W.partitionBy("anchor_id").orderBy(
                    F.md5(
                        F.concat(
                            F.col("anchor_id").cast("string"),
                            F.lit(":"),
                            F.col("vec_id").cast("string"),
                        )
                    ),
                    "vec_id",
                )
            )
            .cast("bigint"),
        )
    )
    return ranked.filter(F.col("neg_rank") <= _NEG_K).select(
        "anchor_id", "vec_id", "neg_rank"
    )


@query(
    "q152_hard_negative_mining",
    oracle=f"""
    SELECT anchor_id, vec_id, sim_r, neg_rank
    FROM (
      SELECT a.vec_id AS anchor_id, c.vec_id AS vec_id,
             FLOOR((
               list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))
               / (SQRT(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
                  * SQRT(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))))) * 1000000.0 + 0.5) / 1000000.0 AS sim_r,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY a.vec_id
               ORDER BY FLOOR((
                 list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))
                 / (SQRT(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
                    * SQRT(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))))) * 1000000.0 + 0.5) / 1000000.0 DESC,
                 c.vec_id
             ) AS BIGINT) AS neg_rank
      FROM (SELECT vec_id, label, embedding FROM embeddings
            WHERE vec_id < {_NEG_ANCHORS}) a
      JOIN embeddings c ON c.label <> a.label
    )
    WHERE neg_rank <= {_NEG_K}
    """,
)
def q152_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD negative mining (C18/pipeline extension): per anchor, the k
    most-similar vectors with a DIFFERENT label — the negatives that
    actually move a contrastive loss (random negatives are mostly
    trivial; the near-boundary ones teach the margin). q151's sampler
    and this miner are the two standard negative tiers of embedding
    training; both emit (anchor, negative, rank) ready for pair-loss
    batch assembly.

    Determinism: q60's exact pattern — similarities dround-ed to the
    10⁻⁶ grid BEFORE ranking, ties on vec_id, so the mined set is
    bit-stable cross-engine.

    Scale: identical shape to q60 (broadcast anchors, one corpus scan,
    per-partition top-k) plus the label-exclusion predicate evaluated
    in the same pass — at 1000 executors this is the brute-force tier;
    swap the scan for an IVF/IVFADC probe (q63/q111's indexes) filtered
    by label to mine from billions.
    """
    emb = t(spark, sf_dir, "embeddings")
    anchors = F.broadcast(
        emb.filter(F.col("vec_id") < _NEG_ANCHORS).select(
            F.col("vec_id").alias("anchor_id"),
            F.col("label").alias("a_label"),
            _dvec("embedding").alias("avec"),
        )
    )
    cands = emb.select("vec_id", "label", _dvec("embedding").alias("cvec"))
    sim = dround(cosine(F.col("avec"), F.col("cvec")))
    ranked = (
        anchors.join(cands, F.col("label") != F.col("a_label"))
        .withColumn("sim_r", sim)
        .withColumn(
            "neg_rank",
            F.row_number()
            .over(
                W.partitionBy("anchor_id").orderBy(
                    F.col("sim_r").desc(), "vec_id"
                )
            )
            .cast("bigint"),
        )
    )
    return ranked.filter(F.col("neg_rank") <= _NEG_K).select(
        "anchor_id", "vec_id", "sim_r", "neg_rank"
    )


#: dimension prefixes evaluated by the truncation-recall audit (the full
#: vectors are 64-dim; 8/16/32 are the 8x/4x/2x memory-cut candidates)
_TRUNC_DIMS = (8, 16, 32)


def _sql_cos(a: str, b: str) -> str:
    """DuckDB twin of ``vectorops.cosine`` on two list expressions."""
    return (
        f"list_dot_product({a}, {b}) / (SQRT(list_dot_product({a}, {a}))"
        f" * SQRT(list_dot_product({b}, {b})))"
    )


def _trunc_branch_sql(d: int) -> str:
    qs, cs = f"q.e[1:{d}]", f"c.e[1:{d}]"
    return f"""
      SELECT {d} AS dim, qid, vec_id FROM (
        SELECT q.qid, c.vec_id,
          ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY
            {sql_dround(_sql_cos(qs, cs))} DESC, c.vec_id) AS rnk
        FROM q JOIN c ON c.vec_id <> q.qid)
      WHERE rnk <= {_TOP_K}"""


@query(
    "q198_dim_truncation_recall",
    # Recall is a set-overlap COUNT between two independently-ranked
    # top-k lists, so the cross-engine contract is the q60/q140 one:
    # every similarity is gridded (dround) BEFORE the rank that decides
    # membership, ties break on vec_id, and the closing recall is a raw
    # IEEE division of identical int64 pairs. DuckDB list slices are
    # 1-based INCLUSIVE (e[1:8] = the first 8 components) — the twin of
    # Spark's slice(vec, 1, 8).
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS e
      FROM embeddings WHERE vec_id < {_N_QUERIES}
    ), c AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ), truth AS (
      SELECT qid, vec_id FROM (
        SELECT q.qid, c.vec_id,
          ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY
            {sql_dround(_sql_cos("q.e", "c.e"))} DESC, c.vec_id) AS rnk
        FROM q JOIN c ON c.vec_id <> q.qid)
      WHERE rnk <= {_TOP_K}
    ), tr AS ({" UNION ALL ".join(_trunc_branch_sql(d) for d in _TRUNC_DIMS)}
    ), hits AS (
      SELECT tr.dim, COUNT(*) AS hits FROM tr
      JOIN truth ON truth.qid = tr.qid AND truth.vec_id = tr.vec_id
      GROUP BY tr.dim
    ), nt AS (SELECT COUNT(*) AS n_truth FROM truth)
    SELECT CAST(d.dim AS BIGINT) AS dim,
      CAST(COALESCE(hits.hits, 0) AS BIGINT) AS hits,
      CAST(nt.n_truth AS BIGINT) AS n_truth,
      CAST(COALESCE(hits.hits, 0) AS DOUBLE) / nt.n_truth AS recall
    FROM (VALUES {", ".join(f"({d})" for d in _TRUNC_DIMS)}) AS d(dim)
    LEFT JOIN hits ON hits.dim = d.dim CROSS JOIN nt
    """,
)
def q198_dim_truncation_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-dimension truncation recall (Matryoshka-style eval,
    r13): for each dimension prefix d ∈ {8, 16, 32} of the 64-dim
    embeddings, the top-k recall of prefix-cosine retrieval against the
    full-dimension exact top-k — the table that decides whether the ANN
    tier (q61/q63/q111) can run on truncated vectors and cut index
    memory 2–8× at 10⁹ vectors before paying for a retrain.

    Determinism (the q140/q164 gridded-selection rule): every cosine —
    full AND truncated — is rounded to the 10⁻⁶ grid BEFORE the
    row_number that decides top-k membership, ties break on vec_id, so
    both engines pick identical sets and the recall fraction is exact.

    Scale: the query panel is broadcast (q60's shape), each of the four
    rankings is one corpus scan with per-partition top-k
    (WindowGroupLimit prunes to ≤k rows per query per task before the
    exchange), and everything after the rankings operates on
    |panel|·k-row keys-only sets. Truncated branches fold d components
    instead of 64 — the candidate-side work SHRINKS with d, and no
    vector ever enters an exchange.
    """
    emb = t(spark, sf_dir, "embeddings")
    q = F.broadcast(
        emb.filter(F.col("vec_id") < _N_QUERIES).select(
            F.col("vec_id").alias("qid"), _dvec("embedding").alias("qvec")
        )
    )
    c = emb.select("vec_id", _dvec("embedding").alias("cvec"))
    pairs = q.join(c, F.col("vec_id") != F.col("qid"))

    def topk(qv, cv) -> DataFrame:
        sim = dround(cosine(qv, cv))
        return (
            pairs.withColumn("sim_r", sim)
            .withColumn(
                "rnk",
                F.row_number().over(
                    W.partitionBy("qid").orderBy(
                        F.col("sim_r").desc(), F.col("vec_id")
                    )
                ),
            )
            .filter(F.col("rnk") <= _TOP_K)
            .select("qid", "vec_id")
        )

    truth = topk(F.col("qvec"), F.col("cvec"))
    trunc = None
    for d in _TRUNC_DIMS:
        b = topk(
            F.slice(F.col("qvec"), 1, d), F.slice(F.col("cvec"), 1, d)
        ).select(F.lit(d).cast("bigint").alias("dim"), "qid", "vec_id")
        trunc = b if trunc is None else trunc.unionByName(b)

    # truth is |panel|*k rows by construction (30 here) -> broadcast, so
    # the hit-join and the grid assembly below never plan a sort-merge
    # exchange pair for set sizes bounded by the panel
    hits = (
        trunc.join(F.broadcast(truth), ["qid", "vec_id"])
        .groupBy("dim")
        .agg(F.count(F.lit(1)).cast("bigint").alias("hits"))
    )
    grid = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(d).cast("bigint") for d in _TRUNC_DIMS])
        ).alias("dim")
    )
    n_truth = truth.agg(F.count(F.lit(1)).cast("bigint").alias("n_truth"))
    return (
        grid.join(F.broadcast(hits), "dim", "left")
        .withColumn("hits", F.coalesce(F.col("hits"), F.lit(0)).cast("bigint"))
        .crossJoin(F.broadcast(n_truth))
        .withColumn(
            "recall",
            F.col("hits").cast("double") / F.col("n_truth").cast("double"),
        )
        .select("dim", "hits", "n_truth", "recall")
    )


#: DCG rank discounts 1/log2(r+1) for r = 1..k, pre-gridded to 1e-6 and
#: embedded as LITERALS in both engines — neither engine ever evaluates a
#: transcendental, so the metric stays inside the exact-sum contract
#: (rel ∈ {0..3} × a 6-decimal literal is a 6-decimal value, dsum-safe).
import math as _math

_DISCOUNTS = tuple(
    _math.floor(1.0 / _math.log2(r + 1) * 1e6 + 0.5) / 1e6
    for r in range(1, _TOP_K + 1)
)


def _sql_rel(qid: str, vid: str) -> str:
    """Digest-graded relevance: 60-bit md5 of 'qid:vec_id' → %8 → the
    {0,0,0,0,0,1,2,3} grade ladder (mostly irrelevant, few graded)."""
    return (
        f"GREATEST(CAST(concat('0x', substring(md5({qid} || ':' || {vid}),"
        f" 1, 15)) AS BIGINT) % 8 - 4, 0)"
    )


def _sql_disc(rnk: str) -> str:
    cases = " ".join(f"WHEN {r} THEN {d!r}" for r, d in enumerate(_DISCOUNTS, 1))
    return f"CASE {rnk} {cases} END"


@query(
    "q199_retrieval_metrics",
    # MRR + nDCG@k with FULL-CORPUS ideal: the retrieved list is q60's
    # gridded-cosine top-k (same CTE), relevance grades are pure digest
    # arithmetic, the log2 discounts are pre-gridded literals (no
    # transcendental runs in either engine), per-rank gains go through
    # the exact scaled-int sum, and the closing rr/ndcg are dround /
    # raw-division of identical values — the whole ranked-eval stack
    # stays on the cross-engine-exact lattice.
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS e
      FROM embeddings WHERE vec_id < {_N_QUERIES}
    ), c AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
    ), ret AS (
      SELECT qid, vec_id, rnk,
             {_sql_rel("qid", "vec_id")} AS rel
      FROM (
        SELECT q.qid, c.vec_id,
          ROW_NUMBER() OVER (PARTITION BY q.qid ORDER BY
            {sql_dround(_sql_cos("q.e", "c.e"))} DESC, c.vec_id) AS rnk
        FROM q JOIN c ON c.vec_id <> q.qid)
      WHERE rnk <= {_TOP_K}
    ), dcg AS (
      SELECT qid,
        {sql_dsum(f"rel * ({_sql_disc('rnk')})")} AS dcg,
        MIN(CASE WHEN rel > 0 THEN rnk END) AS first_rel_rank
      FROM ret GROUP BY qid
    ), lab AS (
      SELECT q.qid, c.vec_id,
             {_sql_rel("q.qid", "c.vec_id")} AS rel
      FROM (SELECT qid FROM q) q
      JOIN (SELECT vec_id FROM c) c ON c.vec_id <> q.qid
    ), ideal AS (
      SELECT qid, rel,
        ROW_NUMBER() OVER (PARTITION BY qid ORDER BY rel DESC, vec_id)
          AS irnk
      FROM lab
    ), idcg AS (
      SELECT qid, {sql_dsum(f"rel * ({_sql_disc('irnk')})")} AS idcg
      FROM ideal WHERE irnk <= {_TOP_K} GROUP BY qid
    )
    SELECT d.qid,
      CAST(d.first_rel_rank AS BIGINT) AS first_rel_rank,
      CASE WHEN d.first_rel_rank IS NULL THEN 0.0
           ELSE {sql_dround("1.0 / d.first_rel_rank")} END AS rr,
      d.dcg AS dcg, i.idcg AS idcg, d.dcg / i.idcg AS ndcg
    FROM dcg d JOIN idcg i ON i.qid = d.qid
    """,
)
def q199_retrieval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranked-retrieval quality metrics (MRR, nDCG@k with a FULL-CORPUS
    ideal) for the dense arm — the standard eval table q146's set-recall
    doesn't give: how early the first relevant hit lands (reciprocal
    rank) and how well the whole ranking orders graded relevance
    against the best achievable ordering over the ENTIRE corpus (not
    just the retrieved set — an arm that misses every graded doc scores
    0, which retrieved-set-normalized nDCG would hide).

    Relevance grades are digest arithmetic (mostly-zero {0,1,2,3}
    ladder), so both engines label identically; the log2 discounts are
    pre-gridded module literals (no transcendental evaluated anywhere);
    per-rank gains go through the exact scaled-int sum; rr is gridded;
    ndcg is a raw division of identical doubles.

    Scale: the retrieved arm is q60's broadcast-panel scan (one corpus
    pass, WindowGroupLimit top-k per task); the ideal arm is the same
    window machinery over (qid, vec_id, rel) KEYS ONLY — no vector is
    touched to rank labels, and everything after the two rankings is
    |panel|-row arithmetic.
    """
    from pyspark_streaming_base_spark.functions.textops import hash60

    emb = t(spark, sf_dir, "embeddings")
    q = F.broadcast(
        emb.filter(F.col("vec_id") < _N_QUERIES).select(
            F.col("vec_id").alias("qid"), _dvec("embedding").alias("qvec")
        )
    )
    c = emb.select("vec_id", _dvec("embedding").alias("cvec"))

    rel = F.greatest(
        hash60(F.concat_ws(":", F.col("qid"), F.col("vec_id"))) % 8 - 4,
        F.lit(0),
    )
    disc_of = lambda rnk: F.element_at(  # noqa: E731 — rank → literal table
        F.array(*[F.lit(d) for d in _DISCOUNTS]), rnk.cast("int")
    )

    ret = (
        q.join(c, F.col("vec_id") != F.col("qid"))
        .withColumn("sim_r", dround(cosine(F.col("qvec"), F.col("cvec"))))
        .withColumn(
            "rnk",
            F.row_number()
            .over(
                W.partitionBy("qid").orderBy(
                    F.col("sim_r").desc(), F.col("vec_id")
                )
            )
            .cast("bigint"),
        )
        .filter(F.col("rnk") <= _TOP_K)
        .withColumn("rel", rel)
    )
    dcg = ret.groupBy("qid").agg(
        dsum(F.col("rel") * disc_of(F.col("rnk"))).alias("dcg"),
        F.min(F.when(F.col("rel") > 0, F.col("rnk"))).alias("first_rel_rank"),
    )

    qids = F.broadcast(
        emb.filter(F.col("vec_id") < _N_QUERIES).select(
            F.col("vec_id").alias("qid")
        )
    )
    lab = (
        qids.join(emb.select("vec_id"), F.col("vec_id") != F.col("qid"))
        .withColumn("rel", rel)
        .withColumn(
            "irnk",
            F.row_number()
            .over(
                W.partitionBy("qid").orderBy(
                    F.col("rel").desc(), F.col("vec_id")
                )
            )
            .cast("bigint"),
        )
        .filter(F.col("irnk") <= _TOP_K)
    )
    idcg = lab.groupBy("qid").agg(
        dsum(F.col("rel") * disc_of(F.col("irnk"))).alias("idcg")
    )

    return (
        dcg.join(F.broadcast(idcg), "qid")
        .withColumn(
            "rr",
            F.when(F.col("first_rel_rank").isNull(), F.lit(0.0)).otherwise(
                dround(F.lit(1.0) / F.col("first_rel_rank"))
            ),
        )
        .withColumn("ndcg", F.col("dcg") / F.col("idcg"))
        .select("qid", "first_rel_rank", "rr", "dcg", "idcg", "ndcg")
    )

"""Training-data-pipeline extras beyond SURVEY §2C: PII redaction,
embedding quantization, unigram-LM document scoring, distributed k-means.

These are the governance / compression / quality-filter / clustering
stages a 100 TB pretraining pipeline runs between dedup and packing.
Design rules as everywhere else: built-in expressions in the hot path,
shuffles only on high-cardinality keys, broadcast only by-construction-
small sides (quantization params: 1 row; k-means centroids: k rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from pyspark_streaming_base_spark.functions.textops import redact, tokens
from pyspark_streaming_base_spark.functions.vectorops import dvec
from pyspark_streaming_base_spark.queries import query
from pyspark_streaming_base_spark.queries._exact import dround
from pyspark_streaming_base_spark.queries._tables import t

_DIGIT_RUN = r"[0-9]+"


@query(
    "q91_pii_redaction",
    oracle=r"""
    SELECT event_id,
           event_type,
           regexp_replace(
             regexp_replace(
               regexp_replace(props,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '#', 'g'),
               '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '#', 'g'),
             '[0-9]+', '#', 'g') AS props_redacted,
           CAST(len(regexp_extract_all(props, '[0-9]+')) AS BIGINT)
             AS n_digit_runs
    FROM events
    """,
)
def q91_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-style redaction over free text (``events.props`` JSON strings):
    emails, IPv4s, then digit runs, each match collapsed to ``#`` — the
    scrub stage every externally-sourced corpus passes through before
    training. Patterns live in ``functions/textops.py:PII_PATTERNS`` (one
    definition; the email/IPv4 tiers are exercised by the pytest property
    test since the synthetic corpus has only numeric PII).

    Scale: pure per-row ``regexp_replace`` chain — no shuffle at all, no
    Python; a scan-transform-write pipeline at any data size.
    """
    ev = t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "event_type",
        redact(F.col("props")).alias("props_redacted"),
        F.size(F.regexp_extract_all(F.col("props"), F.lit(_DIGIT_RUN), 0))
        .cast("bigint")
        .alias("n_digit_runs"),
    )


@query(
    "q92_int8_quantize",
    oracle="""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    x AS (
      SELECT generate_subscripts(v, 1) AS pos, unnest(v) AS val FROM e
    ),
    d AS (SELECT pos, MIN(val) AS vmin, MAX(val) AS vmax FROM x GROUP BY pos),
    p AS (
      SELECT list(vmin ORDER BY pos) AS mins,
             list(vmax - vmin ORDER BY pos) AS rngs
      FROM d
    ),
    q AS (
      SELECT vec_id, v, mins, rngs,
             list_transform(range(1, len(v) + 1),
               i -> CASE WHEN rngs[i] > 0
                         THEN CAST(LEAST(FLOOR((v[i] - mins[i]) * 255.0
                                               / rngs[i]), 255) AS BIGINT)
                         ELSE 0 END) AS qvec
      FROM e, p
    )
    SELECT vec_id,
           CAST(list_sum(qvec) AS BIGINT) AS q_sum,
           md5(array_to_string(qvec, '-')) AS q_digest,
           FLOOR(list_max(list_transform(range(1, len(v) + 1),
             i -> ABS((v[i] - mins[i])
                      - CAST(qvec[i] AS DOUBLE) * rngs[i] / 255.0)))
             * 1000000.0 + 0.5) / 1000000.0 AS max_abs_err_r
    FROM q
    """,
)
def q92_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar int8 quantization of the embedding corpus (the compression
    step before an ANN index ships to serving): global per-dimension
    min/max, then each component → ``floor((v-min)·255/range)`` ∈ [0,255];
    emitted per vector as code-sum + md5 digest (scalar cells for the
    oracle hash) plus the max reconstruction error.

    Plan shape (100 TB): pass 1 posexplodes to (pos, val) and reduces to
    64 rows with map-side-combined min/max — vectors never shuffle; the
    64-dim param table is folded to ONE row of two arrays and broadcast
    cross-joined, so pass 2 is a scan with per-row ``zip_with`` arithmetic
    (no join shuffle, no Python). Both engines run identical IEEE-double
    expressions, so the integer codes match exactly and the error rounds
    identically.
    """
    emb = t(spark, sf_dir, "embeddings").select("vec_id", dvec("embedding").alias("v"))
    dims = (
        emb.select(F.posexplode("v").alias("pos", "val"))
        .groupBy("pos")
        .agg(F.min("val").alias("vmin"), (F.max("val") - F.min("val")).alias("rng"))
    )
    params = dims.agg(
        F.array_sort(F.collect_list(F.struct("pos", "vmin"))).alias("mn"),
        F.array_sort(F.collect_list(F.struct("pos", "rng"))).alias("rg"),
    ).select(
        F.transform("mn", lambda s: s["vmin"]).alias("mins"),
        F.transform("rg", lambda s: s["rng"]).alias("rngs"),
    )
    centered = F.zip_with("v", "mins", lambda x, m: x - m)
    with_q = (
        emb.crossJoin(F.broadcast(params))
        .withColumn("c", centered)
        .withColumn(
            "qvec",
            F.zip_with(
                "c",
                "rngs",
                lambda c, r: F.when(
                    r > 0, F.least(F.floor(c * 255.0 / r), F.lit(255))
                ).otherwise(F.lit(0).cast("bigint")),
            ),
        )
    )
    recon = F.zip_with("qvec", "rngs", lambda q, r: q * r / 255.0)
    err = F.zip_with("c", recon, lambda c, d: F.abs(c - d))
    # Downstream consumers keep the qvec array; the registry projection
    # digests it (sum + md5 of the joined codes) because the oracle
    # compare hashes scalar cells, not arrays.
    return with_q.withColumn("err", err).select(
        "vec_id",
        F.aggregate("qvec", F.lit(0).cast("bigint"), lambda a, x: a + x).alias(
            "q_sum"
        ),
        F.md5(
            F.concat_ws("-", F.transform("qvec", lambda x: x.cast("string")))
        ).alias("q_digest"),
        dround(F.array_max("err")).alias("max_abs_err_r"),
    )


@query(
    "q93_unigram_lm_score",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
      FROM documents
    ),
    cnt AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY tok)
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(c.c) AS BIGINT) AS sum_freq,
           FLOOR((CAST(SUM(c.c) AS DOUBLE) / COUNT(*)) * 1000000.0 + 0.5)
             / 1000000.0 AS avg_tok_freq_r
    FROM tok t JOIN cnt c USING (tok)
    GROUP BY t.doc_id
    """,
)
def q93_unigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM document scoring (quality filtering): each document's
    mean corpus frequency of its tokens — the cheap LM-likeness proxy used
    to rank documents before expensive model-based scoring (low score =
    rare-token-heavy = boilerplate/garbled candidates).

    All-integer aggregation (token counts are bigints) with ONE rounded
    quotient at the end, so the oracle matches exactly. Scale: token
    explode → count groupBy (map-side combined), then a token-keyed join
    back; stopword-grade hot tokens are exactly the AQE skew-join case,
    and the count side can be broadcast when the vocabulary is bounded.
    """
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", tokens(F.col("text")).alias("toks")
    )
    tok = docs.select("doc_id", F.explode("toks").alias("tok"))
    cnt = tok.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    return (
        tok.join(cnt, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum("c").cast("bigint").alias("sum_freq"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "sum_freq",
            dround(F.col("sum_freq").cast("double") / F.col("n_tokens")).alias(
                "avg_tok_freq_r"
            ),
        )
    )


_KMEANS_K = 8
_KMEANS_ITERS = 3


def kmeans_centroids(
    spark: SparkSession,
    sf_dir: str,
    k: int = _KMEANS_K,
    iters: int = _KMEANS_ITERS,
    train_cap: int = 65_536,
) -> DataFrame:
    """The refined (cid, cv) centroid table after ``iters`` Lloyd rounds —
    the production coarse quantizer for ``operators/ivf.py``'s index
    (``build_ivf_index(..., centroids=...)``). Same loop as
    :func:`kmeans_assign` (which consumes this and assigns).

    Training set: bounded to the ``train_cap`` lowest xxhash64(vec_id)
    rows when the corpus is larger (the ``pq_codebooks`` convention — k
    centroids saturate long before 10⁵ training points; Lloyd over the
    full corpus at 100 TB is pure waste), pinned via localCheckpoint so
    the rounds never re-scan the corpus. At fixture scales (n < cap)
    the training set IS the corpus — the numpy twins are unaffected.
    The ASSIGN pass (:func:`kmeans_assign`) always covers every vector."""
    emb = t(spark, sf_dir, "embeddings").select("vec_id", dvec("embedding").alias("v"))
    train = emb
    if train_cap > 0:
        train = (
            emb.orderBy(F.xxhash64("vec_id"), "vec_id")
            .limit(train_cap)
            .repartition(spark.sparkContext.defaultParallelism, "vec_id")
            .localCheckpoint(eager=True)
        )
    # true lowest-k ids (identical to the old `vec_id < k` on the
    # dense-from-0 fixtures the numpy twin mirrors; robust to sparse
    # id spaces — the ADVICE-r6 quantizer fix applied uniformly)
    cent = (
        train.orderBy("vec_id")
        .limit(k)
        .select(F.col("vec_id").cast("bigint").alias("cid"), F.col("v").alias("cv"))
    )

    from pyspark_streaming_base_spark.functions.vectorops import l2sq

    def d2() -> F.Column:
        return l2sq(F.col("v"), F.col("cv"))

    for _ in range(iters):
        # carry v THROUGH the argmin aggregate instead of re-joining the
        # corpus afterwards (v is functionally determined by the vec_id
        # group key, so first() is deterministic) — one join per round
        assigned = (
            train.crossJoin(F.broadcast(cent))
            .withColumn("d2", d2())
            .groupBy("vec_id")
            .agg(
                F.min_by("cid", F.struct("d2", "cid")).alias("cid"),
                F.first("v").alias("v"),
            )
        )
        cent = (
            assigned.select("cid", F.posexplode("v").alias("pos", "val"))
            .groupBy("cid", "pos")
            .agg(F.avg("val").alias("m"))
            .groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("s"))
            .select("cid", F.transform("s", lambda st: st["m"]).alias("cv"))
            .localCheckpoint(eager=True)
        )
    return cent


def kmeans_assign(
    spark: SparkSession, sf_dir: str, k: int = _KMEANS_K, iters: int = _KMEANS_ITERS
) -> DataFrame:
    """Lloyd's k-means over the embedding corpus, fully distributed:
    (vec_id, cid, d2) after ``iters`` refinement rounds.

    * init: the vectors with ``vec_id < k`` (deterministic, no RNG);
    * assign: broadcast the k-row centroid table, per-row squared-distance
      fold, ``min_by`` argmin with a (d2, cid) tie-break;
    * update: per-dimension means via posexplode + map-side-combined agg —
      the corpus never shuffles, only (cid, pos) partials do;
    * each new centroid table is ``localCheckpoint``-ed (k rows) to
      truncate lineage — no driver ``collect``, same pattern as
      ``operators/components.py``.
    """
    from pyspark_streaming_base_spark.operators.semdedup import (
        assign_to_centroids,
    )

    emb = t(spark, sf_dir, "embeddings").select("vec_id", dvec("embedding").alias("v"))
    cent = kmeans_centroids(spark, sf_dir, k=k, iters=iters)
    # the ONE frozen-centroid assignment definition — shared with the
    # persisted semantic-dedup blocking index, so the incremental path
    # (build_semdedup_index + append_semdedup_index) matches this
    # from-scratch assignment by construction
    return assign_to_centroids(emb, cent)


@query("q94_kmeans_clusters")  # iterative float refinement — rows-only by design
def q94_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means cluster summary (k=8, 3 Lloyd iterations): size and inertia
    per cluster. Iterative refinement of float centroids is inherently
    engine-specific, so this is rows-only for the driver; the pytest twin
    (``tests/test_pipeline_ops.py``) checks the assignment against a numpy
    Lloyd oracle run with identical init and tie-breaks.
    """
    a = kmeans_assign(spark, sf_dir)
    return a.groupBy("cid").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.round(F.sum("d2"), 6).alias("inertia_r"),
    )


@query(
    "q95_dq_violations",
    oracle="""
    WITH c AS (
      SELECT
        CAST(SUM(CASE WHEN NOT COALESCE(l_discount <= 0.05, FALSE)
                 THEN 1 ELSE 0 END) AS BIGINT) AS low_discount,
        CAST(SUM(CASE WHEN NOT COALESCE(l_quantity < 45, FALSE)
                 THEN 1 ELSE 0 END) AS BIGINT) AS qty_bounded,
        CAST(SUM(CASE WHEN NOT COALESCE(l_extendedprice > 0, FALSE)
                 THEN 1 ELSE 0 END) AS BIGINT) AS positive_price,
        CAST(SUM(CASE WHEN NOT COALESCE(l_tax IS NOT NULL, FALSE)
                 THEN 1 ELSE 0 END) AS BIGINT) AS tax_nonnull
      FROM lineitem
    )
    SELECT rule, n_violations FROM (
      SELECT 'low_discount' AS rule, low_discount AS n_violations FROM c
      UNION ALL SELECT 'qty_bounded', qty_bounded FROM c
      UNION ALL SELECT 'positive_price', positive_price FROM c
      UNION ALL SELECT 'tax_nonnull', tax_nonnull FROM c
    ) WHERE n_violations > 0
    """,
)
def q95_dq_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality expectations (DLT-style) over lineitem: declarative
    named rules → pass/quarantine split + per-rule violation metrics, via
    ``operators/expectations.py``. Rules with zero violations are absent
    (the metrics come from exploding each row's failed-rule tags); the
    ``tax_nonnull`` rule is deliberately clean to exercise that path.

    Scale: rule tagging is one shuffle-free projection over the scan; the
    metrics explode emits only failed tags, so the groupBy shuffle carries
    O(rules × tasks) partial counts.
    """
    from pyspark_streaming_base_spark.operators.expectations import (
        apply_expectations,
        violation_counts,
    )

    li = t(spark, sf_dir, "lineitem")
    tagged = apply_expectations(
        li,
        {
            "low_discount": F.col("l_discount") <= 0.05,
            "qty_bounded": F.col("l_quantity") < 45,
            "positive_price": F.col("l_extendedprice") > 0,
            "tax_nonnull": F.col("l_tax").isNotNull(),
        },
    )
    return violation_counts(tagged)


@query(
    "q98_arrow_digest",
    oracle="""
    SELECT doc_id,
           md5(text) AS text_md5,
           CAST(strlen(text) AS BIGINT) AS n_bytes
    FROM documents
    """,
)
def q98_arrow_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-native batch processing (``mapInArrow``): per-document md5 +
    byte length computed in Python directly over Arrow RecordBatches — no
    pandas materialization, zero-copy from the JVM. This is the API tier
    for payload-level work (hashing, codec probes, feature extraction)
    where the data is opaque bytes and vectorized numpy/pandas offers
    nothing over a straight loop; the Arrow columnar buffers keep the
    transfer cost at serialization-free.

    md5 is bit-identical everywhere, so unlike most Python paths this one
    carries a full value oracle. Scale: embarrassingly parallel map, no
    shuffle; batch size follows spark.sql.execution.arrow.maxRecordsPerBatch.
    """
    import hashlib

    import pyarrow as pa

    def digest(batches):
        for batch in batches:
            d = batch.to_pydict()
            # NULL text propagates as NULL (matching SQL md5/strlen
            # semantics on NULL input) — no silent ''-coercion
            texts = d["text"]
            yield pa.RecordBatch.from_pydict(
                {
                    "doc_id": d["doc_id"],
                    "text_md5": [
                        None
                        if s is None
                        else hashlib.md5(s.encode("utf-8")).hexdigest()
                        for s in texts
                    ],
                    "n_bytes": [
                        None if s is None else len(s.encode("utf-8"))
                        for s in texts
                    ],
                }
            )

    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInArrow(digest, "doc_id bigint, text_md5 string, n_bytes bigint")


@query(
    "q100_training_pipeline",
    oracle="""
    WITH norm AS (
      SELECT doc_id, lang,
             TRIM(regexp_replace(regexp_replace(LOWER(text), '[^a-z0-9 ]', '', 'g'),
                                 ' +', ' ', 'g')) AS norm
      FROM documents
    ),
    dedup AS (
      SELECT doc_id, lang, norm,
             ROW_NUMBER() OVER (PARTITION BY md5(norm) ORDER BY doc_id) AS rn
      FROM norm
    ),
    toks AS (
      SELECT doc_id, lang, norm,
             list_filter(string_split(norm, ' '), x -> x <> '') AS tk
      FROM dedup WHERE rn = 1
    ),
    quality AS (
      SELECT doc_id, lang,
             len(tk) AS n_tokens,
             len(list_filter(tk, x -> list_contains(['a','the','and','of','to'], x)))
               AS n_stop
      FROM toks
    ),
    kept AS (
      SELECT doc_id, lang, n_tokens,
             SUBSTRING(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS shard
      FROM quality
      WHERE n_tokens >= 10
        AND CAST(n_stop AS DOUBLE) / n_tokens <= 0.6
    )
    SELECT shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
    FROM kept
    GROUP BY shard
    """,
)
def q100_training_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capstone: the full training-data preprocessing pipeline as ONE
    Catalyst plan — normalize → exact near-dup collapse (md5 of normal
    form, keep lowest doc_id) → quality gate (≥10 tokens, stopword ratio
    ≤0.6) → deterministic md5 sharding → per-shard manifest stats. Every
    stage reuses the registry's single-definition helpers
    (``textops.normalize``/``tokens``, q22/q48/q55 semantics), and the
    whole chain carries a full DuckDB oracle.

    Scale: one shuffle for the dedup window (fingerprint key), one for
    the final 16-shard aggregate; the quality gate is a narrow projection
    between them. This is the plan a 100 TB corpus actually runs — the
    oracle proves the composition, not just the stages.
    """
    from pyspark.sql import Window as W

    from pyspark_streaming_base_spark.functions.textops import normalize, tokens

    stop_arr = F.array(*[F.lit(w) for w in ("a", "the", "and", "of", "to")])
    d = t(spark, sf_dir, "documents").select(
        "doc_id", "lang", normalize(F.col("text")).alias("norm")
    )
    w = W.partitionBy(F.md5(F.col("norm"))).orderBy("doc_id")
    kept = (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .withColumn("tk", tokens(F.col("norm")))
        .withColumn("n_tokens", F.size("tk").cast("bigint"))
        .withColumn(
            "n_stop",
            F.size(F.filter(F.col("tk"), lambda x: F.array_contains(stop_arr, x))),
        )
        .filter(
            (F.col("n_tokens") >= 10)
            & (F.col("n_stop").cast("double") / F.col("n_tokens") <= 0.6)
        )
        .withColumn("shard", F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1))
    )
    return kept.groupBy("shard").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        # size(collect_set) = exact distinct count in ONE aggregate pass;
        # countDistinct would plan a second (shard, lang) shuffle
        F.size(F.collect_set("lang")).cast("bigint").alias("n_langs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.min("doc_id").cast("bigint").alias("min_doc_id"),
        F.max("doc_id").cast("bigint").alias("max_doc_id"),
    )


def _q52_oracle() -> str:
    from pyspark_streaming_base_spark.queries import REGISTRY
    from pyspark_streaming_base_spark.queries import text  # noqa: F401 (registers q52)

    return REGISTRY["q52_language_id"].oracle


@query(
    "q101_langid_eval",
    oracle="""
    SELECT lang, pred_lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN lang = pred_lang THEN 1 ELSE 0 END) AS BIGINT)
             AS n_correct
    FROM ({q52})
    GROUP BY lang, pred_lang
    """.format(q52=_q52_oracle()),
)
def q101_langid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier evaluation harness: the confusion matrix of q52's
    stopword-overlap language ID against the labeled ``lang`` column —
    the quality-measurement loop every heuristic filter in a training
    pipeline needs. Reuses q52's REGISTERED function and oracle verbatim
    (one definition each side), adding only the (label, prediction)
    aggregation.

    Scale: q52 is a narrow projection; the confusion matrix is one
    map-side-combined aggregate over ≤ langs² groups.
    """
    from pyspark_streaming_base_spark.queries.text import q52_language_id

    scored = q52_language_id(spark, sf_dir)
    return scored.groupBy("lang", "pred_lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum((F.col("lang") == F.col("pred_lang")).cast("int"))
        .cast("bigint")
        .alias("n_correct"),
    )


_MG_COUNTERS = 64
_HH_TOP_K = 10


@query(
    "q102_heavy_hitters",
    oracle=f"""
    WITH tok AS (
      SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
      FROM documents
    ),
    cnt AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY tok)
    SELECT tok, n,
           CAST(ROW_NUMBER() OVER (ORDER BY n DESC, tok) AS BIGINT) AS rnk
    FROM cnt
    ORDER BY n DESC, tok
    LIMIT {_HH_TOP_K}
    """,
)
def q102_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-accelerated EXACT top-k heavy hitters: per-partition
    Misra-Gries (64 counters) finds a small candidate superset, a second
    pass computes exact counts for candidates only, and the top-10 (ties
    on token) is provably the true top-10 whenever the k-th frequency
    exceeds N/64 — the pigeonhole guarantee: any token above that global
    share beats the per-partition decrement floor somewhere, so it
    survives at least one partition's sketch.

    This is the two-phase pattern that replaces a full-vocabulary shuffle
    with O(counters × partitions) candidate rows at 100 TB; size
    ``_MG_COUNTERS > N / freq_k`` for the workload. mapInPandas is the
    right tier here: the decrement-based counter state is inherently
    sequential per partition and has no expression-tree form.
    """
    import pandas as pd

    docs = t(spark, sf_dir, "documents").select(
        F.explode(tokens(F.col("text"))).alias("tok")
    )

    def mg(batches):
        counters: dict = {}
        for pdf in batches:
            for tok in pdf["tok"]:
                if tok in counters:
                    counters[tok] += 1
                elif len(counters) < _MG_COUNTERS:
                    counters[tok] = 1
                else:
                    dead = [k for k in counters if counters[k] == 1]
                    for k in counters:
                        counters[k] -= 1
                    for k in dead:
                        del counters[k]
        yield pd.DataFrame({"tok": list(counters.keys())})

    candidates = docs.mapInPandas(mg, "tok string").distinct()
    exact = (
        docs.join(F.broadcast(candidates), "tok", "left_semi")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    from pyspark.sql import Window as W

    ranked = exact.withColumn(
        "rnk",
        F.row_number().over(W.orderBy(F.col("n").desc(), F.col("tok"))).cast("bigint"),
    )
    return ranked.filter(F.col("rnk") <= _HH_TOP_K).orderBy("rnk")


@query(
    "q103_pagerank_top20",
    # ORACLE since r9 (rows-only before): with every edge message on the
    # 10⁻¹² grid and the per-node fold an EXACT int64 sum
    # (operators/pagerank.py), each round's ranks are identical doubles
    # on both engines, so the recursive CTE replays the power iteration
    # value-for-value. The q44/q168/q140/q164 precedent applied to
    # message passing.
    oracle="""
    WITH RECURSIVE
    cs AS MATERIALIZED (
      SELECT DISTINCT o.o_custkey AS src, l.l_suppkey + 1000000 AS dst
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    e AS MATERIALIZED (
      SELECT src, dst FROM cs UNION ALL SELECT dst, src FROM cs
    ),
    nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM e),
    deg AS MATERIALIZED (
      SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY src
    ),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
    pr AS (
      SELECT 0 AS round, node, 1.0 / nn.n AS r FROM nodes, nn
      UNION ALL
      SELECT p.round, p.node,
             (1 - 0.85) / nn.n
               + 0.85 * (COALESCE(c.msum, 0) / 1000000000000.0) AS r
      FROM (
        SELECT MAX(round) + 1 AS round, node FROM pr GROUP BY node
      ) p
      LEFT JOIN (
        SELECT e.dst AS node,
               CAST(SUM(CAST(FLOOR(p2.r / d.deg * 1000000000000.0 + 0.5)
                             AS BIGINT)) AS BIGINT) AS msum
        FROM pr p2 JOIN e ON e.src = p2.node JOIN deg d ON d.src = e.src
        GROUP BY e.dst
      ) c ON c.node = p.node
      CROSS JOIN nn
      WHERE p.round <= 3
    ),
    lastround AS (SELECT MAX(round) AS mr FROM pr)
    SELECT node, rank_r, rnk FROM (
      SELECT node,
             FLOOR(r * 1000000000.0 + 0.5) / 1000000000.0 AS rank_r,
             CAST(ROW_NUMBER() OVER (
               ORDER BY FLOOR(r * 1000000000.0 + 0.5) / 1000000000.0 DESC,
                        node
             ) AS BIGINT) AS rnk
      FROM pr, lastround WHERE round = lastround.mr
    ) WHERE rnk <= 20 ORDER BY rnk
    """,
)
def q103_pagerank_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the customer↔supplier transaction graph (edges from
    lineitem⋈orders, symmetrized so there are no dangling nodes), 3
    message-passing rounds, top-20 nodes by rounded rank with id
    tie-break. ORACLE-checked since r9: per-edge messages are gridded
    and exact-summed inside the operator, so the iteration — not just
    the rounded output — is engine-portable and a DuckDB recursive CTE
    replays it round for round. The numpy power-iteration twin (same
    grid) still pins it independently.

    Scale: per round, ONE edge-shuffle (join ranks on src, aggregate on
    dst); ranks are localCheckpoint-ed so round i+1 never replays round
    i. Supplier ids are offset by 10^6 to keep the two id spaces
    disjoint.
    """
    from pyspark.sql import Window as W

    from pyspark_streaming_base_spark.operators.pagerank import pagerank

    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cs = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + 1_000_000).alias("dst"),
        )
        .distinct()
    )
    edges = cs.unionByName(cs.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    ranks = pagerank(edges, damping=0.85, iters=3)
    # dround, not ROUND: the final rank grid must match the oracle's
    # floor(x·1e9 + 0.5) exactly (invariant 1 — plain ROUND of a
    # computed double flips on representation-boundary ties)
    w = W.orderBy(dround(F.col("r"), 9).desc(), "node")
    return (
        ranks.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 20)
        .select("node", dround(F.col("r"), 9).alias("rank_r"), "rnk")
    )


@query(
    "q104_embedding_qa",
    oracle="""
    WITH n AS (
      SELECT vec_id,
             FLOOR(SQRT(list_dot_product(CAST(embedding AS DOUBLE[]),
                                         CAST(embedding AS DOUBLE[])))
                   * 1000000.0 + 0.5) / 1000000.0
               AS norm_r
      FROM embeddings
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs,
             CAST(SUM(CAST(ROUND(norm_r * 1000000.0, 0) AS BIGINT)) AS DOUBLE)
               / 1000000.0 AS sum_norm,
             CAST(SUM(CAST(ROUND((FLOOR(norm_r * norm_r * 1000000.0 + 0.5)
                      / 1000000.0) * 1000000.0, 0)
                      AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_norm2
      FROM n
    )
    SELECT vec_id, norm_r,
           CASE WHEN ABS(norm_r - sum_norm / n_vecs)
                     > 2.0 * SQRT(GREATEST(sum_norm2 / n_vecs
                                  - (sum_norm / n_vecs) * (sum_norm / n_vecs),
                                  0.0))
                THEN 1 ELSE 0 END AS is_outlier
    FROM n, s
    """,
)
def q104_embedding_qa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding QA (the sanity gate before vectors reach an index):
    per-vector L2 norm plus a 2-sigma outlier flag against the corpus
    norm distribution — catching unnormalized, zeroed, or blown-up
    vectors early.

    Determinism: the norm is a sequential fold (bit-identical to DuckDB's
    ``list_dot_product``) rounded to 6 dp; corpus mean/std come from
    scaled-int sums of the ROUNDED per-row values, so both engines
    compare against identical thresholds. The 10⁻⁶-grid squared term
    bounds the scaled sum to ~10¹² per 10⁶ rows — repartition-and-
    preaggregate before the final fold beyond that (documented in
    ``_exact.py``).

    Scale: one scan + a 1-row broadcast stats fold — no shuffle of the
    vectors; the same two-pass shape as q92.
    """
    from pyspark_streaming_base_spark.functions.vectorops import dot
    from pyspark_streaming_base_spark.queries._exact import dsum

    emb = t(spark, sf_dir, "embeddings").select("vec_id", dvec("embedding").alias("v"))
    n = emb.select(
        "vec_id", dround(F.sqrt(dot(F.col("v"), F.col("v")))).alias("norm_r")
    )
    stats = n.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        dsum(F.col("norm_r")).alias("sum_norm"),
        dsum(dround(F.col("norm_r") * F.col("norm_r"))).alias("sum_norm2"),
    )
    mean = F.col("sum_norm") / F.col("n_vecs")
    # clamp: rounding the moments can push the variance epsilon-negative
    # for a near-constant norm distribution (DuckDB SQRT raises on <0)
    std = F.sqrt(
        F.greatest(
            F.col("sum_norm2") / F.col("n_vecs") - mean * mean, F.lit(0.0)
        )
    )
    return (
        n.crossJoin(F.broadcast(stats))
        .select(
            "vec_id",
            "norm_r",
            F.when(F.abs(F.col("norm_r") - mean) > 2.0 * std, 1)
            .otherwise(0)
            .alias("is_outlier"),
        )
    )


@query(
    "q105_cohort_retention",
    oracle="""
    WITH o AS (
      SELECT o_custkey, date_trunc('month', o_orderdate) AS m FROM orders
    ),
    first AS (
      SELECT o_custkey, MIN(m) AS cohort FROM o GROUP BY o_custkey
    )
    SELECT CAST(first.cohort AS DATE) AS cohort,
           CAST(date_diff('month', first.cohort, o.m) AS BIGINT) AS k,
           CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_active
    FROM o JOIN first USING (o_custkey)
    GROUP BY first.cohort, date_diff('month', first.cohort, o.m)
    """,
)
def q105_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention (classic product-analytics rollup): customers
    grouped by first-order month; ``n_active`` = distinct customers from
    that cohort ordering again ``k`` months later. ``months_between`` on
    month-truncated timestamps is an exact integer, matching DuckDB's
    ``date_diff('month', ...)``.

    Scale: first-order table is one groupBy on the customer key; the
    cohort join re-shuffles on the same key (AQE reuses the
    partitioning); the final (cohort, k) aggregate is a few hundred
    groups with map-side-combined distinct counting.
    """
    o = t(spark, sf_dir, "orders").select(
        "o_custkey", F.date_trunc("month", "o_orderdate").alias("m")
    )
    first = o.groupBy("o_custkey").agg(F.min("m").alias("cohort"))
    return (
        o.join(first, "o_custkey")
        .select(
            "o_custkey",
            "cohort",
            F.months_between(F.col("m"), F.col("cohort")).cast("bigint").alias("k"),
        )
        .groupBy(F.col("cohort").cast("date").alias("cohort"), F.col("k"))
        .agg(F.countDistinct("o_custkey").cast("bigint").alias("n_active"))
    )


@query(
    "q112_robust_outliers",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_type, ABS(e.value - m.med) AS adev, m.med
      FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type, quantile_cont(adev, 0.5) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           max(d.med) AS med,
           max(s.mad) AS mad,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) FILTER (WHERE d.adev > 3 * s.mad) AS BIGINT)
             AS n_outliers
    FROM dev d JOIN mad s USING (event_type)
    GROUP BY d.event_type
    """,
)
def q112_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (median/MAD) anomaly detection per event type — the
    outlier rule that survives the outliers themselves, unlike q104's
    mean/stddev z-score which a single extreme value drags.

    Two exact interpolated percentiles (Spark ``percentile`` == DuckDB
    ``quantile_cont``, the q26-verified bit-exact pair): the per-type
    median, then the median absolute deviation of the SAME scan joined
    back through a broadcast of the 10-row median table. Flag =
    ``|v - med| > 3·MAD``; every term is bit-deterministic so the strict
    comparison agrees across engines.

    Scale: two aggregate passes over the events scan plus two 10-row
    broadcasts — no row-level shuffle at all (both groupBys map-side
    partial on event_type). Both medians route through the SIZE GATE
    (``operators/histogram.py``, same as q26/q116): exact interpolated
    percentile below 4M rows/key — what the oracle checks — flipping
    in-plan to the sketch when a type goes hot, so the per-group value
    buffer can never OOM a task.
    """
    from pyspark_streaming_base_spark.operators.histogram import gated_percentiles

    ev = t(spark, sf_dir, "events").select("event_type", "value")
    med = gated_percentiles(ev, "event_type", "value", percentiles=(0.5,)).select(
        "event_type", F.col("p50").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "med", F.abs(F.col("value") - F.col("med")).alias("adev")
    )
    mad = gated_percentiles(dev, "event_type", "adev", percentiles=(0.5,)).select(
        "event_type", F.col("p50").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("med").alias("med"),
            F.max("mad").alias("mad"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.count(F.when(F.col("adev") > 3 * F.col("mad"), 1))
            .cast("bigint")
            .alias("n_outliers"),
        )
    )


@query(
    "q126_mix_weights",
    oracle="""
    WITH c AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY lang
    ),
    r AS (
      SELECT lang, n,
             CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS rs
      FROM c
    ),
    t AS (SELECT sum(rs) AS tot, sum(n) AS sn FROM r)
    SELECT lang, n AS n_docs,
           CAST(rs AS DOUBLE) / tot AS weight,
           (CAST(rs AS DOUBLE) * CAST(sn AS DOUBLE))
             / (CAST(tot AS DOUBLE) * CAST(n AS DOUBLE)) AS oversample
    FROM r CROSS JOIN t
    """,
)
def q126_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based training-mix weights per source (the published
    multilingual-sampling recipe: sample source i with probability
    ∝ n_i^α, α = 1/2, so low-resource sources are UP-weighted relative
    to their share — the standard fix for head-language domination).
    Emits the normalized mix weight and the oversample factor
    (weight / natural share) per lang.

    Bit-exact across engines WITHOUT the usual float-sum trap: n^α is one
    correctly-rounded IEEE sqrt per group, immediately quantized to a
    6-dp int64 (``floor(sqrt(n)·10⁶ + 0.5)`` — pure IEEE on both
    engines), so the normalizing SUM is integer arithmetic (order-free)
    and each output is a single int-ratio division. Scale: one count
    aggregate + a 1-row broadcast total.
    """
    d = t(spark, sf_dir, "documents")
    c = d.groupBy("lang").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    rs = F.floor(F.sqrt(F.col("n").cast("double")) * 1_000_000 + F.lit(0.5)).cast(
        "bigint"
    )
    r = c.select("lang", "n", rs.alias("rs"))
    tot = r.agg(
        F.sum("rs").alias("tot"), F.sum("n").alias("sn")
    )
    return r.crossJoin(F.broadcast(tot)).select(
        "lang",
        F.col("n").alias("n_docs"),
        (F.col("rs").cast("double") / F.col("tot")).alias("weight"),
        # oversample = (rs·sn)/(tot·n) with EACH FACTOR cast to double
        # before multiplying: rs ≈ 1e6·sqrt(n), so the int64 product
        # rs·sn overflows around 1e11 docs (the 100 TB corpus range) —
        # non-ANSI Spark would wrap silently while DuckDB errors. Double
        # products are correctly-rounded IEEE on both engines, so the
        # cross-engine hash match is preserved at every scale.
        (
            (F.col("rs").cast("double") * F.col("sn").cast("double"))
            / (F.col("tot").cast("double") * F.col("n").cast("double"))
        ).alias("oversample"),
    )


@query(
    "q128_per_source_cap",
    oracle="""
    WITH c AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY source
    ),
    k AS (
      SELECT d.doc_id, d.source, c.n,
             CASE WHEN c.n <= 120 THEN TRUE
                  ELSE substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 4)
                       < printf('%04x', CAST(floor(120 * 65536.0 / c.n) AS BIGINT))
             END AS kept
      FROM documents d JOIN c USING (source)
    )
    SELECT source, max(n) AS n_docs,
           CAST(count(*) FILTER (WHERE kept) AS BIGINT) AS n_kept,
           CAST(count(*) FILTER (WHERE kept) AS DOUBLE) / max(n) AS kept_frac
    FROM k GROUP BY source
    """,
)
def q128_per_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap via deterministic hash-rate sampling (the
    CommonCrawl-style per-domain cap, in its SCALABLE form): instead of
    ranking every source's docs and keeping the top N — a per-source
    sort whose hot domain is a straggler at 100 TB — each source keeps
    docs whose md5 prefix falls under ``cap/n`` of the hash space. One
    count aggregate, one broadcast join-back, a pure-function filter:
    no sort, no window, reproducible under reshuffling, and the kept set
    is STABLE as the corpus grows (a doc's fate depends only on its own
    id and its source's count bucket — the q55 stratified-sample
    property applied to cap enforcement). The realized count is binomial
    around the cap — the accepted trade for sort-freedom (exact top-N
    quality-ranked selection is q30/q122's job on bounded keys).

    Bit-exact across engines: the threshold is an integer
    (``floor(cap·65536/n)``) rendered as 4 lowercase hex digits, so the
    comparison is a plain string compare both sides.
    """
    cap = 120
    d = t(spark, sf_dir, "documents").select("doc_id", "source")
    c = d.groupBy("source").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    thr = F.format_string(
        "%04x", F.floor(F.lit(cap) * 65536.0 / F.col("n")).cast("bigint")
    )
    hk = F.md5(F.col("doc_id").cast("string")).substr(1, 4)
    kept = F.when(F.col("n") <= cap, F.lit(True)).otherwise(hk < thr)
    return (
        d.join(F.broadcast(c), "source")
        .select("source", "n", kept.alias("kept"))
        .groupBy("source")
        .agg(
            F.max("n").alias("n_docs"),
            F.count(F.when(F.col("kept"), 1)).cast("bigint").alias("n_kept"),
            (
                F.count(F.when(F.col("kept"), 1)).cast("double") / F.max("n")
            ).alias("kept_frac"),
        )
    )


@query(
    "q129_stratified_k_sample",
    oracle="""
    SELECT lang, doc_id, CAST(rn AS BIGINT) AS rn FROM (
      SELECT lang, doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY substring(md5(CAST(doc_id AS VARCHAR)), 1, 16), doc_id
             ) AS rn
      FROM documents
    )
    WHERE rn <= 20
    """,
)
def q129_stratified_k_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-k deterministic sample per stratum (eval-panel / few-shot
    pool construction): the 20 docs per language whose md5 falls lowest
    in hash order — a seedless, engine-portable "random" panel that
    every rerun reproduces bit-for-bit. Complements q55's RATE-based
    stratified sample (stable under corpus growth, but size only in
    expectation) with the exact-size panel evaluation needs; the
    membership-stability trade is documented, not hidden (a new doc
    with a smaller hash displaces the panel's tail).

    Scale: ``row_number() <= k`` plans ``WindowGroupLimit`` — each map
    task pre-keeps 20 candidates per stratum before the sort-shuffle,
    so the exchange carries O(k · strata · tasks) rows, not the corpus.
    """
    d = t(spark, sf_dir, "documents").select("doc_id", "lang")
    hk = F.md5(F.col("doc_id").cast("string")).substr(1, 16)
    w = W.partitionBy("lang").orderBy(hk, "doc_id")
    return (
        d.select("lang", "doc_id", F.row_number().over(w).cast("bigint").alias("rn"))
        .filter(F.col("rn") <= 20)
    )


@query("q133_logreg_quality_gate", oracle=None)  # iterative training + exp
def q133_logreg_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained linear quality gate (extension; ``operators/logreg.py``):
    distill q51's rule-based quality score into a logistic-regression
    classifier over cheap per-doc features — the production pattern
    where an expensive gate (a big model's judgments, human labels, a
    slow heuristic stack) is distilled into a fast linear filter that
    then scans the whole corpus (the public fastText-style quality-
    classifier recipe).

    Label: q51's quality >= 0.63 (the fixture's median, ~52/48 split).
    Features: the same cheap stats the rule uses — distinct-token
    ratio, length saturation, tokens/100 — so the distillation should
    (and does: ~0.98 train accuracy, asserted loosely in pytest) recover
    the gate. Training is 30 full-batch GD steps with momentum over
    standardized features, every aggregate an exact scaled-int sum, so
    the weights are BIT-REPRODUCIBLE under any partitioning.

    Rows-only by design (training is iterative, sigmoid is
    transcendental — no SQL oracle can replay it); the pytest twin
    mirrors the whole loop in numpy (same fixed-point grids, same fold
    order) and pins the weights to ~1e-8, the q94-Lloyd pattern.

    Scale: one stats scan + one scan per step (each a narrow map +
    (dims × partitions)-row shuffle), state is a 1-row DataFrame —
    nothing O(corpus) ever reaches the driver; the applied model is a
    zero-shuffle projection.
    """
    from pyspark_streaming_base_spark.operators.logreg import (
        logreg_predict,
        logreg_train,
    )

    toks = tokens(F.col("text"))
    n_tok = F.size(toks)
    dr = F.size(F.array_distinct(toks)).cast("double") / n_tok
    ls = F.least(F.col("n_chars").cast("double") / 500.0, F.lit(1.0))
    quality = (
        0.45 * dr + 0.35 * ls + 0.2 * F.when(n_tok >= 10, 1.0).otherwise(0.0)
    )
    feats = (
        t(spark, sf_dir, "documents")
        .select(
            "doc_id",
            dr.alias("f_distinct_ratio"),
            ls.alias("f_length_score"),
            (n_tok.cast("double") / 100.0).alias("f_tokens"),
            (quality >= 0.63).cast("double").alias("label"),
        )
        .filter(n_tok > 0)
    )
    cols = ["f_distinct_ratio", "f_length_score", "f_tokens"]
    w = logreg_train(feats, cols, "label")
    return logreg_predict(feats, cols, w, prob_col="p").select(
        "doc_id",
        F.col("label").cast("bigint").alias("label"),
        dround(F.col("p")).alias("p"),
        (F.col("p") >= 0.5).alias("pred"),
    )


# ---------------------------------------------------------------------------
# Data-distribution drift monitor (DQ extension)
# ---------------------------------------------------------------------------

#: Equi-width histogram geometry + the chi-square flag threshold
#: (df = 15 at alpha = 0.001). The THRESHOLD is a convention; the exact
#: chi2/TV statistics are the oracle-checked output.
_DRIFT_BUCKETS = 16
_DRIFT_CHI2_CRIT = 37.697

_E = "((CAST(n_t AS DOUBLE) * CAST(cg AS DOUBLE)) / n_g)"


@query(
    "q141_distribution_drift",
    oracle=f"""
    WITH mm AS (
      SELECT MIN(value) AS mn, MAX(value) AS mx FROM events
    ),
    b AS (
      SELECT event_type,
             LEAST({_DRIFT_BUCKETS - 1},
                   CAST(FLOOR(((value - mm.mn) / (mm.mx - mm.mn))
                              * {_DRIFT_BUCKETS}.0) AS BIGINT)) AS bucket
      FROM events CROSS JOIN mm
    ),
    gl AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cg FROM b GROUP BY bucket),
    ng AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_g FROM b),
    tt AS (
      SELECT event_type, bucket, CAST(COUNT(*) AS BIGINT) AS ct
      FROM b GROUP BY event_type, bucket
    ),
    nt AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_t
      FROM b GROUP BY event_type
    ),
    grid AS (
      SELECT nt.event_type, nt.n_t, gl.bucket, gl.cg, ng.n_g,
             COALESCE(tt.ct, CAST(0 AS BIGINT)) AS ct
      FROM nt CROSS JOIN gl CROSS JOIN ng
      LEFT JOIN tt ON tt.event_type = nt.event_type AND tt.bucket = gl.bucket
    ),
    contrib AS (
      SELECT event_type, n_t,
             CAST(FLOOR((((CAST(ct AS DOUBLE) - {_E})
                          * (CAST(ct AS DOUBLE) - {_E})) / {_E})
                        * 1000000000.0 + 0.5) AS BIGINT) AS chi9,
             CAST(FLOOR(ABS((CAST(ct AS DOUBLE) / CAST(n_t AS DOUBLE))
                            - (CAST(cg AS DOUBLE) / n_g))
                        * 1000000000.0 + 0.5) AS BIGINT) AS tv9
      FROM grid
    )
    SELECT event_type, CAST(MIN(n_t) AS BIGINT) AS n,
           CAST(SUM(chi9) AS DOUBLE) / 1000000000.0 AS chi2,
           0.5 * (CAST(SUM(tv9) AS DOUBLE) / 1000000000.0) AS tv_dist,
           (CAST(SUM(chi9) AS DOUBLE) / 1000000000.0) > {_DRIFT_CHI2_CRIT}
             AS drifted
    FROM contrib
    GROUP BY event_type
    """,
)
def q141_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment distribution-drift monitor (DQ extension): chi-square
    goodness-of-fit + total-variation distance of each event_type's
    ``value`` histogram against the whole-corpus histogram — the
    "did this slice's numeric distribution shift?" check data-quality
    monitors run per ingestion source/segment (the numeric-feature
    sibling of q131's embedding drift: q131 watches VECTOR space against
    a frozen quantizer, this watches a SCALAR column against the pooled
    distribution; both emit a deterministic boolean trigger).

    Math, exact cross-engine: equi-width buckets from a 1-row global
    min/max broadcast (integer-ratio bucket index, boundary pinned by
    LEAST); expected counts ``e = n_t·c_g/n_g`` and both statistics'
    per-bucket contributions are correctly-rounded IEEE expressions on
    exact integer counts, rounded to the 10⁻⁹ grid per bucket and
    exact-summed as int64 (`_exact.py` scheme) — the chi2/TV sums are
    partition-order independent. Pearson chi-square: public statistics;
    drift flag = chi2 > the df=15, α=0.001 critical value.

    Scale: two map-side-combinable aggregates over ONE scan ((type,
    bucket) and bucket), a 16-row × k-type broadcast grid join, one
    k-row output — nothing corpus-sized shuffles; new segments/batches
    reuse the same bucket edges broadcast.
    """
    ev = t(spark, sf_dir, "events").select("event_type", "value")
    mm = ev.agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
    b = ev.crossJoin(F.broadcast(mm)).select(
        "event_type",
        F.least(
            F.lit(_DRIFT_BUCKETS - 1),
            F.floor(
                ((F.col("value") - F.col("mn")) / (F.col("mx") - F.col("mn")))
                * F.lit(float(_DRIFT_BUCKETS))
            ).cast("bigint"),
        ).alias("bucket"),
    )
    gl = b.groupBy("bucket").agg(F.count(F.lit(1)).cast("bigint").alias("cg"))
    ng = b.agg(F.count(F.lit(1)).cast("double").alias("n_g"))
    tt = b.groupBy("event_type", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("ct")
    )
    nt = b.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_t")
    )
    grid = (
        nt.crossJoin(F.broadcast(gl))
        .crossJoin(F.broadcast(ng))
        .join(F.broadcast(tt), ["event_type", "bucket"], "left")
        .withColumn("ct", F.coalesce("ct", F.lit(0).cast("bigint")))
    )
    e = (F.col("n_t").cast("double") * F.col("cg").cast("double")) / F.col("n_g")
    diff = F.col("ct").cast("double") - e
    chi9 = F.floor(((diff * diff) / e) * F.lit(1000000000.0) + F.lit(0.5)).cast(
        "bigint"
    )
    tv9 = F.floor(
        F.abs(
            (F.col("ct").cast("double") / F.col("n_t").cast("double"))
            - (F.col("cg").cast("double") / F.col("n_g"))
        )
        * F.lit(1000000000.0)
        + F.lit(0.5)
    ).cast("bigint")
    return (
        grid.select("event_type", "n_t", chi9.alias("chi9"), tv9.alias("tv9"))
        .groupBy("event_type")
        .agg(
            F.min("n_t").cast("bigint").alias("n"),
            (F.sum("chi9").cast("double") / F.lit(1000000000.0)).alias("chi2"),
            (
                F.lit(0.5)
                * (F.sum("tv9").cast("double") / F.lit(1000000000.0))
            ).alias("tv_dist"),
            (
                (F.sum("chi9").cast("double") / F.lit(1000000000.0))
                > F.lit(_DRIFT_CHI2_CRIT)
            ).alias("drifted"),
        )
    )


# ---------------------------------------------------------------------------
# Referential-integrity audit (DQ extension)
# ---------------------------------------------------------------------------


def _fk_audit(child: DataFrame, ckey: str, parent: DataFrame, pkey: str,
              relation: str) -> DataFrame:
    """One relationship's integrity metrics from ONE join: aggregate the
    child to (key, n_rows), FULL OUTER against the parent's primary key,
    fold to a single metrics row. Orphans = child keys with no parent;
    childless = parents never referenced."""
    ck = child.groupBy(F.col(ckey).alias("k")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    )
    pk = parent.select(F.col(pkey).alias("pk"))
    j = ck.join(pk, ck["k"] == pk["pk"], "full_outer")
    return j.agg(
        F.coalesce(F.sum("n_rows"), F.lit(0)).cast("bigint").alias("n_child"),
        F.coalesce(
            F.sum(F.when(F.col("pk").isNull(), F.col("n_rows"))), F.lit(0)
        )
        .cast("bigint")
        .alias("n_orphan_child"),
        F.count("pk").cast("bigint").alias("n_parents"),
        F.sum(F.col("k").isNull().cast("bigint"))
        .cast("bigint")
        .alias("n_childless_parents"),
    ).select(
        F.lit(relation).alias("relation"),
        "n_child",
        "n_orphan_child",
        "n_parents",
        "n_childless_parents",
    )


@query(
    "q142_referential_integrity",
    oracle="""
    WITH rel AS (
      SELECT 'events.user_id->customer.c_custkey' AS relation,
             user_id AS k FROM events
      UNION ALL
      SELECT 'lineitem.l_orderkey->orders.o_orderkey', l_orderkey FROM lineitem
      UNION ALL
      SELECT 'orders.o_custkey->customer.c_custkey', o_custkey FROM orders
    ),
    par AS (
      SELECT 'events.user_id->customer.c_custkey' AS relation,
             c_custkey AS pk FROM customer
      UNION ALL
      SELECT 'lineitem.l_orderkey->orders.o_orderkey', o_orderkey FROM orders
      UNION ALL
      SELECT 'orders.o_custkey->customer.c_custkey', c_custkey FROM customer
    ),
    ck AS (
      SELECT relation, k, CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM rel GROUP BY relation, k
    ),
    j AS (
      SELECT COALESCE(ck.relation, par.relation) AS relation,
             ck.k, ck.n_rows, par.pk
      FROM ck FULL OUTER JOIN par
        ON ck.relation = par.relation AND ck.k = par.pk
    )
    SELECT relation,
           CAST(COALESCE(SUM(n_rows), 0) AS BIGINT) AS n_child,
           CAST(COALESCE(SUM(CASE WHEN pk IS NULL THEN n_rows END), 0)
                AS BIGINT) AS n_orphan_child,
           CAST(COUNT(pk) AS BIGINT) AS n_parents,
           CAST(SUM(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_childless_parents
    FROM j
    GROUP BY relation
    """,
)
def q142_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit (DQ extension): orphan-and-coverage
    metrics for the schema's three foreign-key relationships — the
    join-key health check every warehouse DQ suite runs before trusting
    downstream joins (complements `operators/expectations.py`'s row-level
    rules and q141's distribution drift with CROSS-TABLE invariants).
    Per relationship: child rows, orphan child rows (no parent — the
    rows an inner join would silently drop), parent count, and
    never-referenced parents.

    Scale: each relationship is ONE child-side key aggregate (map-side
    combined to |keys| rows) + ONE full-outer join against the parent
    key + a 1-row fold — never a row-level child×parent join; the three
    audits are independent plans unioned at k rows each.
    """
    ev = t(spark, sf_dir, "events")
    li = t(spark, sf_dir, "lineitem")
    od = t(spark, sf_dir, "orders")
    cu = t(spark, sf_dir, "customer")
    return (
        _fk_audit(ev, "user_id", cu, "c_custkey",
                  "events.user_id->customer.c_custkey")
        .unionByName(
            _fk_audit(li, "l_orderkey", od, "o_orderkey",
                      "lineitem.l_orderkey->orders.o_orderkey")
        )
        .unionByName(
            _fk_audit(od, "o_custkey", cu, "c_custkey",
                      "orders.o_custkey->customer.c_custkey")
        )
    )


# ---------------------------------------------------------------------------
# Two-sample Kolmogorov–Smirnov drift (DQ extension, binless)
# ---------------------------------------------------------------------------

_KS_A = "click"
_KS_B = "view"
_KS_BUCKETS = 64
_KS_C05 = 1.358  # KS critical coefficient at alpha = 0.05


@query(
    "q144_ks_drift",
    oracle=f"""
    WITH s AS (
      SELECT value,
             CASE WHEN event_type = '{_KS_A}' THEN 1 ELSE 0 END AS ia
      FROM events WHERE event_type IN ('{_KS_A}', '{_KS_B}')
    ),
    v AS (
      SELECT value, CAST(SUM(ia) AS BIGINT) AS ca,
             CAST(COUNT(*) - SUM(ia) AS BIGINT) AS cb
      FROM s GROUP BY value
    ),
    n AS (
      SELECT CAST(SUM(ca) AS DOUBLE) AS na, CAST(SUM(cb) AS DOUBLE) AS nb
      FROM v
    ),
    c AS (
      SELECT CAST(SUM(ca) OVER (ORDER BY value) AS BIGINT) AS cum_a,
             CAST(SUM(cb) OVER (ORDER BY value) AS BIGINT) AS cum_b
      FROM v
    )
    SELECT CAST(n.na AS BIGINT) AS n_a, CAST(n.nb AS BIGINT) AS n_b,
           MAX(ABS((CAST(cum_a AS DOUBLE) / n.na)
                   - (CAST(cum_b AS DOUBLE) / n.nb))) AS ks_stat,
           {_KS_C05} * SQRT((n.na + n.nb) / (n.na * n.nb)) AS crit_05,
           MAX(ABS((CAST(cum_a AS DOUBLE) / n.na)
                   - (CAST(cum_b AS DOUBLE) / n.nb)))
             > ({_KS_C05} * SQRT((n.na + n.nb) / (n.na * n.nb))) AS drifted
    FROM c CROSS JOIN n
    GROUP BY n.na, n.nb
    """,
)
def q144_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift test (DQ extension): the
    BINLESS companion to q141's chi-square — ``D = sup |ECDF_A −
    ECDF_B|`` between two event segments' ``value`` distributions, with
    the α=0.05 decision threshold. KS sees shape shifts a fixed binning
    can wash out; chi2 sees reweighting within identical supports — a DQ
    suite runs both. Kolmogorov/Smirnov — public statistics.

    Exactness: ECDF numerators are exact integer cumulative counts;
    every output double is a correctly-rounded expression on them (MAX
    over identical doubles is order-free; SQRT is IEEE-exact), so the
    statistic — not just the verdict — hash-matches the oracle.

    Scale — the cumulative count is `queries/_ecdf.py::
    pooled_cumulative_counts`, the ONE definition of the bucketed
    two-pass prefix sum shared with q165/q166 (see its docstring for
    why never a global-order window).
    """
    from pyspark_streaming_base_spark.queries._ecdf import (
        pooled_cumulative_counts,
    )

    cum = pooled_cumulative_counts(_ks_value_counts(spark, sf_dir), _KS_BUCKETS)
    nad = F.col("na").cast("double")
    nbd = F.col("nb").cast("double")
    gap = F.abs(
        (F.col("cum_a").cast("double") / nad)
        - (F.col("cum_b").cast("double") / nbd)
    )
    crit = F.lit(_KS_C05) * F.sqrt((nad + nbd) / (nad * nbd))
    return (
        cum.select(gap.alias("gap"), "na", "nb")
        .groupBy("na", "nb")
        .agg(F.max("gap").alias("ks_stat"))
        .select(
            F.col("na").alias("n_a"),
            F.col("nb").alias("n_b"),
            "ks_stat",
            crit.alias("crit_05"),
            (F.col("ks_stat") > crit).alias("drifted"),
        )
    )


def _ks_value_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(value, ca, cb) for the two drift segments — shared input of the
    q144/q165/q166 nonparametric statistics."""
    from pyspark_streaming_base_spark.queries._tables import t as _t

    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type").isin(_KS_A, _KS_B))
        .select(
            "value",
            (F.col("event_type") == _KS_A).cast("bigint").alias("ia"),
        )
    )
    return ev.groupBy("value").agg(
        F.sum("ia").cast("bigint").alias("ca"),
        (F.count(F.lit(1)) - F.sum("ia")).cast("bigint").alias("cb"),
    )


# ---------------------------------------------------------------------------
# Epoch materialization: realize the temperature mixture (pipeline ext.)
# ---------------------------------------------------------------------------


@query(
    "q153_epoch_materialization",
    oracle="""
    WITH c AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY lang
    ),
    r AS (
      SELECT lang, n,
             CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS rs
      FROM c
    ),
    t AS (SELECT sum(rs) AS tot, sum(n) AS sn FROM r),
    f AS (
      SELECT lang, n, CAST(rs AS DOUBLE) / tot AS w,
             (CAST(rs AS DOUBLE) * CAST(sn AS DOUBLE))
               / (CAST(tot AS DOUBLE) * CAST(n AS DOUBLE)) AS f
      FROM r CROSS JOIN t
    ),
    per_doc AS (
      SELECT d.doc_id, d.lang, f.n, f.w,
             CAST(FLOOR(f.f) AS BIGINT)
             + CASE WHEN substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 4)
                         < printf('%04x',
                             CAST(FLOOR((f.f - FLOOR(f.f)) * 65536.0) AS BIGINT))
                    THEN 1 ELSE 0 END AS n_copies
      FROM documents d JOIN f ON d.lang = f.lang
    ),
    ep AS (
      SELECT lang, MAX(n) AS n_docs, MAX(w) AS w,
             CAST(SUM(n_copies) AS BIGINT) AS n_epoch
      FROM per_doc GROUP BY lang
    ),
    tote AS (SELECT SUM(n_epoch) AS te FROM ep)
    SELECT lang, CAST(n_docs AS BIGINT) AS n_docs, n_epoch,
           w AS target_weight,
           CAST(n_epoch AS DOUBLE) / te AS achieved_share
    FROM ep CROSS JOIN tote
    """,
)
def q153_epoch_materialization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch materialization (pipeline extension): REALIZE q126's
    temperature mixture as an actual training epoch — each document
    replicated ``floor(f)`` times plus one stochastic-rounding extra
    copy decided by its md5 prefix against ``frac(f)`` of the hash space
    (q128's deterministic hash-rate rule; no RNG, invariant 5), so the
    per-source epoch share converges to the target weight while every
    run, engine, and partitioning produces the SAME epoch. The audit
    compares achieved share vs target weight per source.

    The Spark side actually MATERIALIZES the epoch (sequence + explode
    per doc) and aggregates the exploded rows; the oracle states the
    same count declaratively (Σ n_copies) — equality proves the
    expansion is exactly the intended multiset.

    Scale: factors are a |sources|-row broadcast; the explode is a
    narrow map whose output is exactly the epoch (what the trainer
    reads anyway); no shuffle beyond the final audit aggregate.
    """
    d = t(spark, sf_dir, "documents")
    c = d.groupBy("lang").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    rs = F.floor(F.sqrt(F.col("n").cast("double")) * 1_000_000 + F.lit(0.5)).cast(
        "bigint"
    )
    r = c.select("lang", "n", rs.alias("rs"))
    tot = r.agg(F.sum("rs").alias("tot"), F.sum("n").alias("sn"))
    f = r.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n",
        (F.col("rs").cast("double") / F.col("tot")).alias("w"),
        (
            (F.col("rs").cast("double") * F.col("sn").cast("double"))
            / (F.col("tot").cast("double") * F.col("n").cast("double"))
        ).alias("f"),
    )
    # 4 LOWERCASE hex digits (the q128 convention — F.conv would emit
    # uppercase and break the string compare against lowercase md5)
    frac_hex = F.format_string(
        "%04x",
        F.floor((F.col("f") - F.floor(F.col("f"))) * F.lit(65536.0)).cast(
            "bigint"
        ),
    )
    per_doc = (
        d.select("doc_id", "lang")
        .join(F.broadcast(f), "lang")
        .withColumn(
            "n_copies",
            F.floor("f").cast("bigint")
            + (
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
                < frac_hex
            ).cast("bigint"),
        )
    )
    epoch = per_doc.select(
        "doc_id",
        "lang",
        "n",
        "w",
        F.explode(
            F.when(
                F.col("n_copies") >= 1,
                F.sequence(F.lit(1).cast("bigint"), F.col("n_copies")),
            ).otherwise(F.array().cast("array<bigint>"))
        ).alias("copy_ix"),
    )
    ep = epoch.groupBy("lang").agg(
        F.max("n").cast("bigint").alias("n_docs"),
        F.max("w").alias("w"),
        F.count(F.lit(1)).cast("bigint").alias("n_epoch"),
    )
    tote = ep.agg(F.sum("n_epoch").alias("te"))
    return ep.crossJoin(F.broadcast(tote)).select(
        "lang",
        "n_docs",
        "n_epoch",
        F.col("w").alias("target_weight"),
        (F.col("n_epoch").cast("double") / F.col("te")).alias("achieved_share"),
    )


_PROFILE_COLS = (
    "l_orderkey",
    "l_partkey",
    "l_suppkey",
    "l_linenumber",
    "l_quantity",
    "l_extendedprice",
    "l_discount",
    "l_tax",
    "l_returnflag",
    "l_linestatus",
    "l_shipdate",
)


@query(
    "q160_column_profile",
    oracle="""
    SELECT * FROM (
    """
    + "\n    UNION ALL\n    ".join(
        f"""SELECT '{c}' AS column_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
           CAST(COUNT(DISTINCT {c}) AS DOUBLE) / COUNT(*) AS distinct_ratio
    FROM lineitem"""
        for c in _PROFILE_COLS
    )
    + """
    )
    """,
)
def q160_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic table profiler (DQ extension): one row per column with
    null count, distinct count, and distinct ratio — the
    deequ/great-expectations "profile" primitive that seeds every
    expectation suite (which columns are keys, which are categorical,
    which leak nulls). Typed min/max are deliberately absent: rendering
    heterogeneous types to strings is engine-specific, and every metric
    here is an exact integer or integer ratio.

    Scale: ONE scan — all 11 columns' null counts and distinct counts
    run in a single aggregate (count_distinct expands to one Expand +
    partial aggs, map-side combined), and the 1×33-metric row unpivots
    driver-side to the long report. The oracle's 11-scan UNION ALL is
    the definitional form; the Spark plan reads the table once.
    """
    li = t(spark, sf_dir, "lineitem")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count(F.lit(1)).cast("bigint").alias(f"{c}__rows"),
            (F.count(F.lit(1)) - F.count(c)).cast("bigint").alias(f"{c}__null"),
            F.count_distinct(F.col(c)).cast("bigint").alias(f"{c}__dist"),
        ]
    one = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__rows, {c}__null, {c}__dist" for c in _PROFILE_COLS
    )
    long = one.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_args}) AS "
        "(column_name, n_rows, n_null, n_distinct)"
    )
    return long.select(
        "column_name",
        "n_rows",
        "n_null",
        "n_distinct",
        (F.col("n_distinct").cast("double") / F.col("n_rows")).alias(
            "distinct_ratio"
        ),
    )


_SKEW_KEYS = ("l_orderkey", "l_partkey", "l_suppkey")


@query(
    "q161_join_skew_report",
    oracle="""
    SELECT * FROM (
    """
    + "\n    UNION ALL\n    ".join(
        f"""SELECT '{c}' AS join_key, n_rows, n_keys, max_mult,
           CAST(n_rows AS DOUBLE) / n_keys AS avg_mult,
           CAST(max_mult AS DOUBLE) * n_keys / n_rows AS skew_factor,
           CAST(top10_rows AS DOUBLE) / n_rows AS hot10_share
    FROM (
      SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows,
             CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(MAX(cnt) AS BIGINT) AS max_mult,
             CAST(SUM(CASE WHEN rk <= 10 THEN cnt ELSE 0 END) AS BIGINT) AS top10_rows
      FROM (
        SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, {c}) AS rk
        FROM (SELECT {c}, CAST(COUNT(*) AS BIGINT) AS cnt
              FROM lineitem GROUP BY {c})
      )
    )"""
        for c in _SKEW_KEYS
    )
    + """
    )
    """,
)
def q161_join_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-skew diagnostic (scale-tuning extension): for each candidate
    fact-table join key, the multiplicity profile that decides the join
    strategy BEFORE the job runs — average vs maximum key multiplicity,
    the skew factor (max/avg: how much slower the hottest hash partition
    is than the mean, the number that says "salt this key"), and the row
    share of the 10 hottest keys (whether skew is one giant key or a
    warm head). This is the report behind SCALE.md's salting/AQE
    decisions, as a first-class query.

    Exactness: counts, integer ratios, deterministic (cnt DESC, key)
    top-10 tie-break.

    Scale: one groupBy per key (map-side combined) and everything after
    is key-domain-sized; the top-10 hot keys come from orderBy+limit
    (TakeOrderedAndProject — per-partition heaps, never a global rank
    window over the key domain, which at 100 TB is billions of rows).
    The three per-key profiles scan independently — at 100 TB run them
    as one pass with grouping sets if the scan dominates.
    """
    outs = []
    li = t(spark, sf_dir, "lineitem")
    for c in _SKEW_KEYS:
        counts = li.groupBy(c).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        top10 = (
            counts.orderBy(F.col("cnt").desc(), F.col(c))
            .limit(10)
            .agg(F.sum("cnt").cast("bigint").alias("top10_rows"))
        )
        prof = counts.agg(
            F.sum("cnt").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.max("cnt").cast("bigint").alias("max_mult"),
        ).crossJoin(F.broadcast(top10)).select(
            F.lit(c).alias("join_key"),
            "n_rows",
            "n_keys",
            "max_mult",
            (F.col("n_rows").cast("double") / F.col("n_keys")).alias("avg_mult"),
            (
                F.col("max_mult").cast("double")
                * F.col("n_keys")
                / F.col("n_rows")
            ).alias("skew_factor"),
            (F.col("top10_rows").cast("double") / F.col("n_rows")).alias(
                "hot10_share"
            ),
        )
        outs.append(prof)
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


@query(
    "q162_rank_correlation",
    oracle="""
    WITH s AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens,
             CAST(len(list_distinct(list_filter(string_split(text, ' '), x -> x <> ''))) AS DOUBLE)
               / len(list_filter(string_split(text, ' '), x -> x <> '')) AS distinct_ratio
      FROM documents
      WHERE len(list_filter(string_split(text, ' '), x -> x <> '')) > 0
    ), r AS (
      SELECT
        2 * RANK() OVER (ORDER BY n_tokens)
          + CAST(COUNT(*) OVER (PARTITION BY n_tokens) AS BIGINT) - 1 AS ra2,
        2 * RANK() OVER (ORDER BY distinct_ratio)
          + CAST(COUNT(*) OVER (PARTITION BY distinct_ratio) AS BIGINT) - 1 AS rb2
      FROM s
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM((ra2 - rb2) * (ra2 - rb2)) AS BIGINT) AS sum_d2_quarters,
           1.0 - 1.5 * SUM((ra2 - rb2) * (ra2 - rb2))
                 / (COUNT(*) * (CAST(COUNT(*) AS BIGINT) * COUNT(*) - 1))
             AS spearman_rho
    FROM r
    """,
)
def q162_rank_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Spearman rank correlation (analytics extension): does
    lexical diversity fall with document length? — the monotone-
    association check behind quality-score design (q51 weights) and
    drift comparisons, computed with ZERO float accumulation error.

    The trick: average tie-ranks are half-integers, so DOUBLED ranks
    ``ra2 = 2·rank + ties − 1`` are integers; Σd² in quarter units is a
    pure BIGINT sum (order-independent — no float-summation hazard),
    and ρ = 1 − 6·(Σd²/4)/(n(n²−1)) = 1 − 1.5·Σd²q/(n(n²−1)) is one
    deterministic division at the end. Same engine-exactness playbook
    as `_exact.py`'s scaled sums.

    Scale: NO corpus-sized window. Ranks come from the VALUE DOMAIN:
    avg-tie doubled rank of value v is ``2·(#rows below v) + ties + 1``,
    so each variable needs only its (value, count) table with a
    cumulative count — and both domains are bounded by construction
    (token counts by max document length L; distinct ratios are
    rationals d/t with t ≤ L, so ≤ O(L²) distinct values no matter the
    corpus size). The cumulative window runs over those bounded tables;
    rows re-attach by two equi-joins on the value (exact: both sides
    compute the identical expression). The fold is a 1-row aggregate.
    """
    from pyspark.sql import Window as W

    d = t(spark, sf_dir, "documents")
    toks = _q162_toks(F.col("text"))
    s = d.select(
        F.size(toks).cast("bigint").alias("n_tokens"),
        (
            F.size(F.array_distinct(toks)).cast("double")
            / F.size(toks)
        ).alias("distinct_ratio"),
    ).filter(F.col("n_tokens") > 0)

    def rank2_table(col: str) -> DataFrame:
        vd = s.groupBy(col).agg(F.count(F.lit(1)).cast("bigint").alias("_ties"))
        below = F.coalesce(
            F.sum("_ties").over(
                W.orderBy(col).rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        )
        return vd.select(
            col, (F.lit(2) * below + F.col("_ties") + 1).alias(f"_r2_{col}")
        )

    r = (
        s.join(rank2_table("n_tokens"), "n_tokens")
        .join(rank2_table("distinct_ratio"), "distinct_ratio")
        .select(
            F.col("_r2_n_tokens").alias("ra2"),
            F.col("_r2_distinct_ratio").alias("rb2"),
        )
    )
    d2 = (F.col("ra2") - F.col("rb2")) * (F.col("ra2") - F.col("rb2"))
    n = F.count(F.lit(1)).cast("bigint")
    return r.agg(
        n.alias("n"),
        F.sum(d2).cast("bigint").alias("sum_d2_quarters"),
        (
            F.lit(1.0)
            - F.lit(1.5)
            * F.sum(d2).cast("double")
            / (
                F.count(F.lit(1)).cast("double")
                * (
                    F.count(F.lit(1)).cast("double")
                    * F.count(F.lit(1)).cast("double")
                    - F.lit(1.0)
                )
            )
        ).alias("spearman_rho"),
    )


def _q162_toks(col):
    from pyspark_streaming_base_spark.functions.textops import tokens as _tk

    return _tk(col)


#: PPS sample size (q163) — the token-budget subsample's target count.
_PPS_K = 100

#: Contiguous doc_id ids per prefix-sum bucket for q163's two-pass
#: cumulative sum over HASH order (hash-prefix buckets keep bucket
#: populations balanced; 256 buckets regardless of corpus size).
_PPS_BUCKETS = 256


@query(
    "q163_pps_token_sample",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT)
               AS n_tokens,
             substring(md5(CAST(doc_id AS VARCHAR)), 1, 16) AS hk
      FROM documents
    ), cum AS (
      SELECT doc_id, n_tokens,
             CAST(SUM(n_tokens) OVER (ORDER BY hk, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
               AS BIGINT) AS cum_before,
             CAST(SUM(n_tokens) OVER () AS BIGINT) AS w
      FROM toks
    )
    SELECT doc_id, n_tokens, cum_before,
           CAST(
             GREATEST(0, LEAST({_PPS_K},
               (2 * {_PPS_K} * (cum_before + n_tokens) + w - 1) // (2 * w)))
             - GREATEST(0, LEAST({_PPS_K},
               (2 * {_PPS_K} * cum_before + w - 1) // (2 * w)))
             AS BIGINT) AS n_copies
    FROM cum
    WHERE
           GREATEST(0, LEAST({_PPS_K},
             (2 * {_PPS_K} * (cum_before + n_tokens) + w - 1) // (2 * w)))
           - GREATEST(0, LEAST({_PPS_K},
             (2 * {_PPS_K} * cum_before + w - 1) // (2 * w))) >= 1
    """,
)
def q163_pps_token_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probability-proportional-to-size sampling, EXACT (pipeline
    extension): draw ``k = 100`` docs with inclusion probability
    proportional to token count — systematic PPS (Madow 1949, the
    survey-sampling classic) over the md5-shuffled order: lay the docs
    on a 0..W token line (W = corpus tokens), drop k equally-spaced
    gridpoints at (2i+1)·W/(2k), select every doc whose token interval
    contains a gridpoint (a doc longer than W/k is selected multiple
    times — ``n_copies`` is its sampling weight, exactly like q153's
    epoch replication). This is the token-budget subsample a training
    pipeline runs ("give me ~1/k of the corpus, long docs proportionally
    more likely"), seedless and rerun-stable like every sampler here.

    Exactness: gridpoint membership counts collapse to the closed form
    f(x) = clamp((2kx + W − 1) div (2W), 0, k) evaluated at the interval
    ends — ALL integer arithmetic (no W/k division ever materializes),
    so both engines agree bit-for-bit.

    Scale: the cumulative sum runs as the q59 two-pass prefix sum over
    256 hash-prefix buckets (bounded carry table, never a corpus-wide
    window — the oracle's single OVER () is the definitional form);
    W folds to a 1-row broadcast.
    """
    d = t(spark, sf_dir, "documents")
    hk = F.md5(F.col("doc_id").cast("string")).substr(1, 16)
    base = d.select(
        "doc_id",
        F.size(tokens(F.col("text"))).cast("bigint").alias("n_tokens"),
        hk.alias("hk"),
        # first 2 hex chars of the SAME hash: bucket order == hash order
        F.conv(hk.substr(1, 2), 16, 10).cast("bigint").alias("bucket"),
    )
    w_local = (
        W.partitionBy("bucket")
        .orderBy("hk", "doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    local = base.withColumn(
        "local_cum", F.sum("n_tokens").over(w_local)
    ).persist()
    totals = local.groupBy("bucket").agg(F.max("local_cum").alias("bt"))
    w_carry = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, -1)
    carry = totals.select(
        "bucket",
        F.coalesce(F.sum("bt").over(w_carry), F.lit(0)).alias("carry_in"),
    )
    tot = totals.agg(F.sum("bt").cast("bigint").alias("w"))
    cum = (
        local.join(F.broadcast(carry), "bucket")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "n_tokens",
            (F.col("carry_in") + F.col("local_cum") - F.col("n_tokens"))
            .cast("bigint")
            .alias("cum_before"),
            "w",
        )
    )

    def f(x):
        # pure INTEGER floor-division — (raw − raw mod d)/d is an exact
        # multiple, so the final double division is exact; a naive
        # floor(raw / d) rounds the quotient BEFORE flooring and can
        # come out high by 1 on representation boundaries (the q96/q99
        # rounding lesson, applied to div)
        raw = (F.lit(2 * _PPS_K) * x + F.col("w") - 1).cast("bigint")
        d = (F.lit(2) * F.col("w")).cast("bigint")
        q = ((raw - F.pmod(raw, d)) / d).cast("bigint")
        return F.greatest(
            F.lit(0).cast("bigint"),
            F.least(F.lit(_PPS_K).cast("bigint"), q),
        )

    n_copies = f(F.col("cum_before") + F.col("n_tokens")) - f(F.col("cum_before"))
    return (
        cum.select(
            "doc_id",
            "n_tokens",
            "cum_before",
            n_copies.cast("bigint").alias("n_copies"),
        )
        .filter(F.col("n_copies") >= 1)
    )


_KCENTER_K = 16
_D2G_SQL = (
    "FLOOR(list_sum(list_transform(list_zip({a}, {b}), "
    "p -> (p[1] - p[2]) * (p[1] - p[2]))) * 1000000.0 + 0.5) / 1000000.0"
)


@query(
    "q164_kcenter_coreset",
    # ORACLE since r9 (rows-only before; the q44/q168/q140 recursive-CTE
    # precedent): with every pairwise d2 on the 10⁻⁶ grid
    # (operators/kcenter.py), the greedy farthest-point recursion is a
    # recursive CTE whose working table carries BOTH the per-vector
    # d2min state rows ('s') and one chosen-list/selection row ('c') —
    # each round: argmax of d2min excluding chosen (ties lowest id),
    # then one LEAST-fold of the state against the new center. One d2
    # per vector per round, the same O(k·n) the Spark operator pays.
    oracle=f"""
    WITH RECURSIVE
    e AS MATERIALIZED (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    st AS (
      SELECT 's' AS kind, CAST(1 AS BIGINT) AS rank, e.vec_id,
             {_D2G_SQL.format(a='e.v', b='c0.v')} AS d2min,
             CAST(NULL AS BIGINT[]) AS chosen, CAST(NULL AS BIGINT) AS cid,
             CAST(NULL AS DOUBLE) AS d2cov
      FROM e, (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 1) c0
      UNION ALL
      SELECT 'c', CAST(1 AS BIGINT), NULL, NULL,
             [c0.vec_id], c0.vec_id, 0.0
      FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 1) c0
      UNION ALL
      (
        WITH cur AS (SELECT * FROM st),
        ch AS (SELECT chosen, rank FROM cur WHERE kind = 'c'),
        nxt AS (
          SELECT s.vec_id, s.d2min
          FROM cur s, ch
          WHERE s.kind = 's' AND NOT list_contains(ch.chosen, s.vec_id)
          ORDER BY s.d2min DESC, s.vec_id LIMIT 1
        )
        SELECT 's', ch.rank + 1, s.vec_id,
               LEAST(s.d2min, {_D2G_SQL.format(a='ev.v', b='nv.v')}),
               NULL, NULL, NULL
        FROM cur s, ch, nxt, e nv, e ev
        WHERE s.kind = 's' AND ch.rank < {_KCENTER_K}
          AND nv.vec_id = nxt.vec_id AND ev.vec_id = s.vec_id
        UNION ALL
        SELECT 'c', ch.rank + 1, NULL, NULL,
               list_append(ch.chosen, nxt.vec_id), nxt.vec_id, nxt.d2min
        FROM ch, nxt WHERE ch.rank < {_KCENTER_K}
      )
    )
    SELECT rank, cid AS vec_id, d2cov AS d2_covered_r
    FROM st WHERE kind = 'c'
    """,
)
def q164_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset (Gonzalez 1985; ``operators/kcenter.py``):
    the 16 most mutually-distant embedding vectors in selection order,
    with the coverage radius² each pick closed — the diversity-first
    data-curation primitive (coreset seeds, active-learning batches,
    diverse eval panels) complementing SemDeDup's redundancy removal.

    ORACLE-checked since r9 (rows-only before): pairwise distances are
    10⁻⁶-gridded inside the operator, so the greedy argmax compares
    bit-identical doubles on both engines and the DuckDB recursive CTE
    replays the selection pick for pick. The numpy twin (identical
    start, grid, and (distance, lowest-id) tie-breaks) still pins the
    sequence independently.

    Scale: k scans with a ≤ k-row broadcast each, 1-row argmax state,
    localCheckpoint lineage cuts — nothing corpus-sized leaves the
    executors (`operators/kcenter.py` docstring has the full shape).
    """
    from pyspark_streaming_base_spark.operators.kcenter import kcenter_select

    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", dvec("embedding").alias("v")
    )
    sel = kcenter_select(emb, k=_KCENTER_K)
    return sel.select(
        "rank", "vec_id", dround(F.col("d2_covered"), 6).alias("d2_covered_r")
    )


@query(
    "q165_cvm_drift",
    oracle=f"""
    WITH s AS (
      SELECT value,
             CASE WHEN event_type = '{_KS_A}' THEN 1 ELSE 0 END AS ia
      FROM events WHERE event_type IN ('{_KS_A}', '{_KS_B}')
    ),
    v AS (
      SELECT value, CAST(SUM(ia) AS BIGINT) AS ca,
             CAST(COUNT(*) - SUM(ia) AS BIGINT) AS cb
      FROM s GROUP BY value
    ),
    n AS (
      SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb
      FROM v
    ),
    c AS (
      SELECT ca + cb AS w,
             CAST(SUM(ca) OVER (ORDER BY value) AS BIGINT) AS cum_a,
             CAST(SUM(cb) OVER (ORDER BY value) AS BIGINT) AS cum_b
      FROM v
    ),
    acc AS (
      SELECT SUM(
               CAST(w AS DECIMAL(38,0))
               * (CAST(nb AS DECIMAL(38,0)) * CAST(cum_a AS DECIMAL(38,0))
                  - CAST(na AS DECIMAL(38,0)) * CAST(cum_b AS DECIMAL(38,0)))
               * (CAST(nb AS DECIMAL(38,0)) * CAST(cum_a AS DECIMAL(38,0))
                  - CAST(na AS DECIMAL(38,0)) * CAST(cum_b AS DECIMAL(38,0)))
             ) AS t_num,
             CAST(COUNT(*) AS BIGINT) AS n_values,
             MAX(na) AS na, MAX(nb) AS nb
      FROM c CROSS JOIN n
    )
    SELECT na AS n_a, nb AS n_b, n_values,
           FLOOR((CAST(t_num AS DOUBLE) / (CAST(na AS DOUBLE) * CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) * CAST(nb AS DOUBLE) * CAST(na + nb AS DOUBLE))) * 100000000.0 + 0.5) / 100000000.0 AS cvm_r
    FROM acc
    """,
)
def q165_cvm_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Cramér–von Mises drift (DQ extension): the INTEGRATED
    squared ECDF gap between the q144 segments — where KS reads only the
    single worst point, CvM accumulates the whole curve, so a broad
    small shift (every quantile nudged) fires here before it fires KS.
    The tie-robust pooled-weight form: T = Σ_v w_v·(F_A(v) − F_B(v))²
    / (n_a + n_b), weights = pooled counts at each distinct value
    (Cramér 1928 / von Mises 1931 / Anderson 1962 — public statistics).

    Exactness: the numerator Σ w·(n_b·cumA − n_a·cumB)² is EXACT —
    the gap, its square, AND the weight product are computed entirely
    in DECIMAL(38,0) (no int64 intermediate: n_b·cumA alone reaches
    n_a·n_b, which wraps int64 past ~3e9 rows/segment, and the square
    reaches (n_a·n_b)²); the sum accumulates as DECIMAL(38,0) (the
    `_exact.py` decimal-accumulation scheme, so partition order cannot
    perturb it); one cast→double division at the end, `dround`-gridded.
    Exact while w·(n_a·n_b)² < 10³⁸, i.e. segments up to ~10¹⁶ rows.
    The statistic itself hash-matches, not just a verdict.

    Scale: identical shape to q144 (distinct value domain → two-pass
    bucketed prefix sum → 1-row fold); the decimal sum is map-side
    combinable like any sum.
    """
    from pyspark_streaming_base_spark.queries._ecdf import (
        pooled_cumulative_counts,
    )

    cum = pooled_cumulative_counts(_ks_value_counts(spark, sf_dir), _KS_BUCKETS)
    dec = "decimal(38,0)"
    gap_num = F.col("nb").cast(dec) * F.col("cum_a").cast(dec) - F.col(
        "na"
    ).cast(dec) * F.col("cum_b").cast(dec)
    term = (F.col("ca") + F.col("cb")).cast(dec) * gap_num * gap_num
    acc = (
        cum.select(term.alias("term"), "na", "nb")
        .groupBy("na", "nb")
        .agg(
            F.sum("term").alias("t_num"),
            F.count(F.lit(1)).cast("bigint").alias("n_values"),
        )
    )
    denom = (
        F.col("na").cast("double")
        * F.col("na").cast("double")
        * F.col("nb").cast("double")
        * F.col("nb").cast("double")
        * (F.col("na") + F.col("nb")).cast("double")
    )
    return acc.select(
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        "n_values",
        dround(F.col("t_num").cast("double") / denom, 8).alias("cvm_r"),
    )


@query(
    "q166_mann_whitney",
    oracle=f"""
    WITH s AS (
      SELECT value,
             CASE WHEN event_type = '{_KS_A}' THEN 1 ELSE 0 END AS ia
      FROM events WHERE event_type IN ('{_KS_A}', '{_KS_B}')
    ),
    v AS (
      SELECT value, CAST(SUM(ia) AS BIGINT) AS ca,
             CAST(COUNT(*) - SUM(ia) AS BIGINT) AS cb
      FROM s GROUP BY value
    ),
    c AS (
      SELECT ca, cb,
             CAST(SUM(ca) OVER (ORDER BY value) AS BIGINT) AS cum_a,
             CAST(SUM(cb) OVER (ORDER BY value) AS BIGINT) AS cum_b
      FROM v
    ),
    n AS (SELECT CAST(SUM(ca) AS BIGINT) AS na,
                 CAST(SUM(cb) AS BIGINT) AS nb FROM v),
    acc AS (
      SELECT CAST(SUM(ca * (2 * (cum_a + cum_b - ca - cb) + (ca + cb) + 1))
                  AS BIGINT) AS two_rank_sum_a,
             MAX(na) AS na, MAX(nb) AS nb
      FROM c CROSS JOIN n
    )
    SELECT na AS n_a, nb AS n_b,
           two_rank_sum_a - na * (na + 1) AS u2_a,
           CAST(two_rank_sum_a - na * (na + 1) AS DOUBLE)
             / CAST(2 * na * nb AS BIGINT) AS auc,
           2.0 * (CAST(two_rank_sum_a - na * (na + 1) AS DOUBLE)
             / CAST(2 * na * nb AS BIGINT)) - 1.0 AS rank_biserial
    FROM acc
    """,
)
def q166_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Mann–Whitney U / AUC drift (DQ extension) — the
    location-shift member of the nonparametric trio (q144 KS reads the
    worst ECDF point, q165 CvM the whole curve, this one the DIRECTION):
    ``auc = P(a > b) + ½P(a = b)`` — the probability a random sample-A
    value exceeds a random sample-B value, i.e. the common-language
    effect size / ROC-AUC of the segment label — plus the rank-biserial
    correlation ``2·auc − 1``. Mann & Whitney (1947) — public.

    Exactness: the q162 doubled-midrank trick — pooled tie midranks are
    half-integers, so DOUBLED rank sums are pure BIGINT
    (``2U_A = Σ ca·(2·pool_below + ties + 1) − n_a(n_a+1)``, all
    integers, order-independent); ``auc`` is one deterministic division
    of exact integers. The statistic hash-matches the oracle.

    Scale: the shared `queries/_ecdf.py` two-pass cumulative counts +
    a 1-row fold — identical shape to q144/q165.
    """
    from pyspark_streaming_base_spark.queries._ecdf import (
        pooled_cumulative_counts,
    )

    cum = pooled_cumulative_counts(_ks_value_counts(spark, sf_dir), _KS_BUCKETS)
    w = F.col("ca") + F.col("cb")
    pool_below = F.col("cum_a") + F.col("cum_b") - w
    r2 = F.lit(2) * pool_below + w + 1
    acc = (
        cum.select((F.col("ca") * r2).cast("bigint").alias("cr2"), "na", "nb")
        .groupBy("na", "nb")
        .agg(F.sum("cr2").cast("bigint").alias("two_rank_sum_a"))
    )
    u2a = (F.col("two_rank_sum_a") - F.col("na") * (F.col("na") + 1)).cast(
        "bigint"
    )
    auc = u2a.cast("double") / (F.lit(2) * F.col("na") * F.col("nb")).cast(
        "bigint"
    ).cast("double")
    return acc.select(
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        u2a.alias("u2_a"),
        auc.alias("auc"),
        (F.lit(2.0) * auc - F.lit(1.0)).alias("rank_biserial"),
    )


_QQ_DECILES = tuple(round(0.1 * i, 1) for i in range(1, 10))


@query(
    "q169_decile_qq",
    oracle=f"""
    WITH a AS (
      SELECT {", ".join(f"quantile_cont(value, {p}) AS qa{round(p*100)}" for p in _QQ_DECILES)},
             CAST(COUNT(*) AS BIGINT) AS n_a
      FROM events WHERE event_type = '{_KS_A}'
    ), b AS (
      SELECT {", ".join(f"quantile_cont(value, {p}) AS qb{round(p*100)}" for p in _QQ_DECILES)},
             CAST(COUNT(*) AS BIGINT) AS n_b
      FROM events WHERE event_type = '{_KS_B}'
    ), g AS (SELECT CAST(unnest(generate_series(1, 9)) AS BIGINT) AS d)
    SELECT d * 10 AS decile,
           CASE {" ".join(f"WHEN d = {i+1} THEN qa{round(p*100)}" for i, p in enumerate(_QQ_DECILES))} END AS q_a,
           CASE {" ".join(f"WHEN d = {i+1} THEN qb{round(p*100)}" for i, p in enumerate(_QQ_DECILES))} END AS q_b,
           CASE {" ".join(f"WHEN d = {i+1} THEN qa{round(p*100)} - qb{round(p*100)}" for i, p in enumerate(_QQ_DECILES))} END AS qq_gap,
           n_a, n_b
    FROM g CROSS JOIN a CROSS JOIN b
    """,
)
def q169_decile_qq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile Q–Q profile between the two drift segments (DQ extension):
    the quantile view of the nonparametric family — KS/CvM/U (q144/
    q165/q166) say WHETHER and in which direction the distributions
    differ; the Q–Q table says WHERE along the distribution (a tail-only
    shift and a uniform location shift produce the same verdicts but
    opposite Q–Q shapes, and the gap column is exactly what a monitoring
    dashboard plots).

    Exactness: the q26-verified linear-interpolation percentile on both
    engines; gaps are differences of identically-computed doubles — no
    rounding anywhere, the whole table hash-matches.

    Scale: two per-segment percentile aggregates through
    `operators/histogram.py::gated_percentiles` (exact below the 4M-row
    gate, sketch above — the q26 size-gate), then a 9-row reshape of two
    1-row broadcasts.
    """
    from pyspark_streaming_base_spark.operators.histogram import (
        gated_percentiles,
    )

    ev = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin(_KS_A, _KS_B)
    )
    wide = gated_percentiles(
        ev.select("event_type", "value"),
        "event_type",
        "value",
        percentiles=_QQ_DECILES,
    )
    names = [f"p{round(p * 100):d}" for p in _QQ_DECILES]
    a = wide.filter(F.col("event_type") == _KS_A).select(
        *[F.col(n).alias(f"qa{n[1:]}") for n in names],
        F.col("n_rows").alias("n_a"),
    )
    b = wide.filter(F.col("event_type") == _KS_B).select(
        *[F.col(n).alias(f"qb{n[1:]}") for n in names],
        F.col("n_rows").alias("n_b"),
    )
    both = a.crossJoin(F.broadcast(b))
    stacked = both.selectExpr(
        "stack(9, "
        + ", ".join(
            f"CAST({round(p * 100)} AS BIGINT), qa{round(p * 100)}, qb{round(p * 100)}"
            for p in _QQ_DECILES
        )
        + ") AS (decile, q_a, q_b)",
        "n_a",
        "n_b",
    )
    return stacked.select(
        "decile",
        "q_a",
        "q_b",
        (F.col("q_a") - F.col("q_b")).alias("qq_gap"),
        "n_a",
        "n_b",
    )

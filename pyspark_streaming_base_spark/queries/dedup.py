"""Deduplication operators (SURVEY.md §2C C16–C17): exact, MinHash+LSH,
n-gram Jaccard, SimHash.

Scale design: all near-dup paths avoid the O(n²) all-pairs comparison.
MinHash/LSH and SimHash bucket documents so only same-bucket candidates are
compared; the exact-Jaccard query restricts pairs to a blocking key. At
100 TB the blocking/banding join is the only shuffle and candidate
verification touches a tiny fraction of the cross product.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_streaming_base_spark.functions.textops import (
    hash60,
    tokens as _tokens,
    word_shingles as _shingles,
)
from pyspark_streaming_base_spark.operators.fuzzyjoin import (
    hamming_self_join,
    levenshtein_self_join,
)
from pyspark_streaming_base_spark.queries import query
from pyspark_streaming_base_spark.queries._exact import dround
from pyspark_streaming_base_spark.queries._tables import spread, t


@query(
    "q40_ngram_jaccard_pairs",
    oracle="""
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(len(list_intersect(a.toks, b.toks)) AS BIGINT) AS n_common,
           CAST(len(list_distinct(list_concat(a.toks, b.toks))) AS BIGINT) AS n_union,
           CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
             / len(list_distinct(list_concat(a.toks, b.toks))) AS jaccard
    FROM
      (SELECT doc_id, lang,
              list_distinct(list_filter(string_split(text, ' '), x -> x <> '')) AS toks
       FROM documents
       WHERE len(list_filter(string_split(text, ' '), x -> x <> '')) > 0) a
      JOIN
      (SELECT doc_id, lang,
              list_distinct(list_filter(string_split(text, ' '), x -> x <> '')) AS toks
       FROM documents
       WHERE len(list_filter(string_split(text, ' '), x -> x <> '')) > 0) b
      ON a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
            / len(list_distinct(list_concat(a.toks, b.toks))) >= 0.8
    """,
)
def q40_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-set Jaccard near-dup pairs within a language block (C17).

    Blocking on ``lang`` bounds the pair space; at scale the blocking key
    would be an LSH band (see q41) — this query is the exact verifier both
    for tests and for LSH candidates. Jaccard = |A∩B| / |A∪B| over distinct
    tokens; integer ratio → bit-exact double on both engines.
    """
    d = (
        t(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "lang",
            F.array_distinct(_tokens(F.col("text"))).alias("toks"),
            F.size(F.array_distinct(_tokens(F.col("text")))).alias("nt"),
        )
        # explicit empty-doc guard: nt = 0 would make jaccard 0/0 = NaN,
        # and Spark's NaN >= 0.8 is TRUE (NaN sorts greatest) while DuckDB
        # differs — a cross-engine divergence waiting for an empty fixture
        # row. Mirrored in the oracle's WHERE len(...) > 0.
        .filter(F.col("nt") > 0)
    )
    # spread the probe side: the fixture is a single row group, so without
    # this the broadcast pair join streams through ONE task and the whole
    # O(pairs) verification runs serially (measured 64 s → 7 s at sf0.1 on
    # 32 cores); a round-robin shuffle of the 5k source rows is free
    a = d.repartition(64).alias("a")
    b = d.alias("b")
    # size-ratio prefilter: J ≥ 0.8 implies min(|A|,|B|)/max(|A|,|B|) ≥ 0.8
    # (|A∩B| ≤ min, |A∪B| ≥ max), so 5·min ≥ 4·max is a pure-integer
    # necessary condition halving the pairs that reach the O(tokens)
    # array intersections. The oracle needs no mirror: the predicate is
    # implied by the final jaccard filter, so the result set is identical.
    j = a.join(
        b,
        (F.col("a.lang") == F.col("b.lang"))
        & (F.col("a.doc_id") < F.col("b.doc_id"))
        & (F.col("a.nt") * 5 >= F.col("b.nt") * 4)
        & (F.col("b.nt") * 5 >= F.col("a.nt") * 4),
    )
    n_common = F.size(F.array_intersect(F.col("a.toks"), F.col("b.toks")))
    n_union = F.size(F.array_union(F.col("a.toks"), F.col("b.toks")))
    jac = n_common.cast("double") / n_union
    return (
        j.select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            n_common.cast("bigint").alias("n_common"),
            n_union.cast("bigint").alias("n_union"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.8)
    )


#: MinHash parameters: 16 permutations in 4 bands of 4 rows.
_N_PERM = 16
_BAND_SIZE = 4


@query("q41_minhash_lsh_pairs", oracle=None)  # hash family is engine-specific
def q41_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH banding near-dup candidates, verified by exact Jaccard
    (C17). Rows-only driver check: the MinHash family (xxhash64 + salt) is
    Spark-specific, so no SQL oracle; correctness is covered by the pytest
    recall test against q40's exact pairs.

    Pipeline (all built-ins, no UDFs):
      1. shingle: distinct word 3-shingles per doc;
      2. signature: explode shingles → ``min(xxhash64(salt_i || shingle))``
         per doc for 16 salts — one narrow shuffle on doc_id;
      3. banding: 4 bands of 4 mins; hash each band → (band_idx, band_hash)
         bucket join — only same-bucket docs pair up (no cross product);
      4. verify candidates with exact Jaccard ≥ 0.8.

    Scale: the bucket join replaces the O(n²) comparison with
    O(n · bands) shuffle rows; hot buckets (boilerplate docs) are the skew
    case AQE splits.
    """
    # Signature pipeline: one definition in operators/minhash.py (shared
    # with the q45 pipeline stage and the persisted index) — per-row array
    # expressions, no explode-shuffle; the first exchange is the band join.
    from pyspark_streaming_base_spark.operators.minhash import minhash_bands

    # r13 (guide §2.5 input skew): the fixture table is ONE parquet
    # split, so the 16-permutation signature computation ran as a single
    # task per join side; spread() parallelizes it and is a no-op at
    # corpus scale (see _tables.spread). The same spread frame feeds the
    # verify sides below so their exchanges map in parallel too.
    docs = spread(t(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id")
    stacked = minhash_bands(docs)
    # SHUFFLE_HASH keeps AQE from picking a broadcast band join (measured
    # ~1.6× slower here, and the only legal shape at 100 TB where neither
    # side broadcasts). The signature pipeline computes once per join
    # side; at scale the signature table would be PERSISTED as the index
    # and both sides would read the materialization — locally, a
    # localCheckpoint was measured cost-neutral (write+read ≈ recompute)
    # so the query stays side-effect-free.
    stacked = stacked.hint("shuffle_hash")
    l, r = stacked.alias("l"), stacked.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"))
        .distinct()
    )
    # exact-Jaccard verification of candidates, over the SAME shingle sets
    # the MinHash signatures estimate (verifying on a different set — e.g.
    # unigrams — would make the filter incoherent with the candidate step).
    # Join candidate ids to the raw text FIRST (broadcast of the tiny
    # candidate set), so shingles are recomputed only for O(candidates)
    # rows, not the whole corpus.
    da = docs.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("text_a"))
    db = docs.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("text_b"))
    verified = (
        da.join(F.broadcast(cand), "doc_a")
        .join(db, "doc_b")
        .withColumn("sh_a", _shingles(F.col("text_a")))
        .withColumn("sh_b", _shingles(F.col("text_b")))
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("jaccard") >= 0.8)
        .select("doc_a", "doc_b", "jaccard")
    )
    return verified


@query(
    "q43_embedding_neardup",
    oracle="""
    SELECT doc_a, doc_b, sim_r
    FROM (
      SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
             FLOOR((
               list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
               / (SQRT(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
                  * SQRT(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))))) * 1000000.0 + 0.5) / 1000000.0 AS sim_r
      FROM embeddings a
      JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
    )
    WHERE sim_r >= 0.35
    """,
)
def q43_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within a blocking key (C17's
    semantic-dedup flavor: MinHash/SimHash catch lexical dups, cosine over
    embeddings catches paraphrases).

    Blocking on ``label`` bounds the pair space exactly like q40 blocks on
    ``lang``; at 100 TB the block key is an LSH bucket (q61's hyperplane
    signature) and this query is the exact verifier applied to candidate
    pairs only — never the raw cross product. Similarity is rounded to
    6 dp before thresholding: both engines fold the dot product in the
    same sequential order, so the rounded values agree bit-for-bit.
    Threshold 0.35 is calibrated to the synthetic fixture (weakly
    clustered labels; real near-dup corpora use ~0.9).
    """
    from pyspark_streaming_base_spark.queries.similarity import _dvec, cosine

    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _dvec("embedding").alias("vec")
    )
    a = emb.select(
        F.col("vec_id").alias("doc_a"), "label", F.col("vec").alias("vec_a")
    )
    b = emb.select(
        F.col("vec_id").alias("doc_b"), "label", F.col("vec").alias("vec_b")
    )
    pairs = a.join(b, ["label"]).filter(F.col("doc_a") < F.col("doc_b"))
    sim = dround(cosine(F.col("vec_a"), F.col("vec_b")))
    return (
        pairs.withColumn("sim_r", sim)
        .filter(F.col("sim_r") >= 0.35)
        .select("doc_a", "doc_b", "sim_r")
    )


#: q40's verified edge set as a reusable CTE body (same tokenization,
#: blocking, and 0.8 threshold as the q40 oracle) + its symmetric
#: closure — shared by the q44/q122/q127 oracles. ``AS MATERIALIZED`` is
#: LOAD-BEARING: DuckDB 1.0 inlines multiply-referenced CTEs, so without
#: it the recursive term re-runs the O(n²/lang) Jaccard join EVERY
#: closure iteration (measured: >60 CPU-min at sf0.1 inlined vs ~2 min
#: materialized).
#: q40's verified edge set as a standalone CTE fragment — the shared
#: base of every graph-family oracle (q44/q148 closure, q168 k-core).
_PAIRS_SQL = """
    pr AS MATERIALIZED (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM
        (SELECT doc_id, lang,
                list_distinct(list_filter(string_split(text, ' '), x -> x <> '')) AS toks
         FROM documents
         WHERE len(list_filter(string_split(text, ' '), x -> x <> '')) > 0) a
        JOIN
        (SELECT doc_id, lang,
                list_distinct(list_filter(string_split(text, ' '), x -> x <> '')) AS toks
         FROM documents
         WHERE len(list_filter(string_split(text, ' '), x -> x <> '')) > 0) b
        ON a.lang = b.lang AND a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
              / len(list_distinct(list_concat(a.toks, b.toks))) >= 0.8
    )
"""

_CLUSTER_CLOSURE_SQL = f"""
    {_PAIRS_SQL},
    ed AS MATERIALIZED (
      SELECT doc_a AS a, doc_b AS b FROM pr
      UNION ALL SELECT doc_b, doc_a FROM pr
    ),
    reach(a, b) AS (
      SELECT a, b FROM ed
      UNION
      SELECT r.a, e.b FROM reach r JOIN ed e ON r.b = e.a WHERE e.b <> r.a
    ),
    canon AS (
      SELECT a AS doc_id, LEAST(a, MIN(b)) AS canonical FROM reach GROUP BY a
    )
"""


@query(
    "q44_dedup_clusters",
    # connected components ARE SQL-expressible: the recursive transitive
    # closure of the (small, dup-family-bounded) verified pair set — so
    # the iterative Spark label propagation gets a full value-hash
    # oracle, not just the union-find pytest (upgraded rows-only → oracle
    # in r5; closure size is Σ|component|², bounded because components
    # are dup families, not the corpus)
    oracle=f"""
    WITH RECURSIVE {_CLUSTER_CLOSURE_SQL}
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(canonical AS BIGINT) AS canonical
    FROM canon
    """,
)
def q44_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive dedup clustering (C17 final stage): near-dup pairs are
    not transitive (A~B, B~C without A~C), so keep-one-per-group needs
    connected components over the pair graph. Emits (doc_id, canonical)
    for every clustered doc, canonical = min doc_id of its component —
    the keep-list is ``canonical == doc_id``.

    Pairs come from q40's exact lang-blocked Jaccard (the verified edge
    set); components via iterative min-label propagation
    (``operators/components.py`` — O(E) shuffle per round, lineage
    truncated per round, diameter-bounded). ORACLE-checked since r5: the
    DuckDB twin computes the same components via a recursive
    transitive-closure CTE, so the iterative Spark result is value-hash
    verified, with the union-find pytest as a second witness.
    """
    from pyspark_streaming_base_spark.operators.components import (
        connected_components,
    )

    pairs = q40_ngram_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    comp = connected_components(pairs, src="doc_a", dst="doc_b")
    return comp.select(
        F.col("id").cast("bigint").alias("doc_id"),
        F.col("component").cast("bigint").alias("canonical"),
    )


@query("q45_dedup_pipeline", oracle=None)  # composes iterative clustering; rows-only
def q45_dedup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full dedup pipeline composed end-to-end (capstone for C16+C17):

    1. normalize text (lower/strip/collapse — q64's transform);
    2. EXACT dedup on the normal form (keep min doc_id per norm-hash);
    3. NEAR-dup candidates among survivors via MinHash+LSH banding with
       exact-Jaccard verification (q41's machinery);
    4. transitive closure of near-dup pairs (connected components);
    5. emit the verdict per document: ``kept``, ``exact_dup`` (of its
       norm-group keeper), or ``near_dup`` (of its cluster canonical).

    Output: (doc_id, verdict, canonical). Rows-only driver check; every
    stage is individually oracle- or property-checked by q22/q40/q41/q44.
    Scale: each stage keeps its own shape (hash-groupBy / band join /
    O(E)-per-round components) — composing them adds no new shuffle class.
    """
    from pyspark_streaming_base_spark.operators.components import (
        connected_components,
    )

    from pyspark_streaming_base_spark.functions.textops import normalize

    d = t(spark, sf_dir, "documents")
    base = d.select("doc_id", "text", F.md5(normalize(F.col("text"))).alias("norm_fp"))
    keeper = base.groupBy("norm_fp").agg(F.min("doc_id").alias("keeper_id"))
    tagged = base.join(keeper, "norm_fp")
    survivors = tagged.filter(F.col("doc_id") == F.col("keeper_id")).select(
        "doc_id", "text"
    )

    # near-dup pairs among survivors: the SAME signature definition as q41
    # (operators/minhash.py), applied to the deduped corpus
    from pyspark_streaming_base_spark.operators.minhash import minhash_bands

    stacked = minhash_bands(survivors.select("doc_id", "text")).hint("shuffle_hash")
    l, r = stacked.alias("l"), stacked.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = survivors.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("ta"))
    sb = survivors.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("tb"))
    pairs = (
        sa.join(F.broadcast(cand), "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "j",
            F.size(F.array_intersect(_shingles(F.col("ta")), _shingles(F.col("tb")))).cast(
                "double"
            )
            / F.size(F.array_union(_shingles(F.col("ta")), _shingles(F.col("tb")))),
        )
        .filter(F.col("j") >= 0.8)
        .select("doc_a", "doc_b")
    )
    comp = connected_components(pairs, src="doc_a", dst="doc_b")

    verdict = (
        tagged.select("doc_id", "keeper_id")
        .join(comp.withColumnRenamed("id", "keeper_id"), "keeper_id", "left")
        .select(
            "doc_id",
            F.when(F.col("doc_id") != F.col("keeper_id"), F.lit("exact_dup"))
            .when(
                F.col("component").isNotNull()
                & (F.col("component") != F.col("keeper_id")),
                F.lit("near_dup"),
            )
            .otherwise(F.lit("kept"))
            .alias("verdict"),
            F.coalesce(F.col("component"), F.col("keeper_id"))
            .cast("bigint")
            .alias("canonical"),
        )
    )
    return verdict


#: SimHash banding: 4 × 16-bit bands over the 64-bit fingerprint. By
#: pigeonhole, two fingerprints within hamming distance ≤ bands−1 = 3
#: share at least one exact band, so the band join has perfect recall at
#: the _SIMHASH_MAX_HAMMING threshold.
_SIMHASH_BANDS = 4
_SIMHASH_BAND_BITS = 16
_SIMHASH_MAX_HAMMING = 3


def _simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, simhash): 64-bit SimHash from token hashes — for each bit,
    sum +1/−1 over tokens by bit value, sign → fingerprint bit. All
    built-ins: explode → per-bit conditional sums → bit reassembly. One
    explode + one groupBy(doc_id) shuffle. Shared by q42 (bucket stats)
    and q46 (banded near-dup pairs)."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.array_distinct(_tokens(F.col("text")))).alias("tok")
    )
    h = d.withColumn("th", F.xxhash64("tok"))
    # bit b contribution: +1 if bit set else -1; sum per doc
    bit_sums = h.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("th"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{b}")
            for b in range(64)
        ]
    )
    return bit_sums.select(
        "doc_id",
        reduce(
            lambda acc, b: acc.bitwiseOR(
                F.when(F.col(f"b{b}") > 0, F.shiftleft(F.lit(1).cast("bigint"), b)).otherwise(
                    F.lit(0).cast("bigint")
                )
            ),
            range(64),
            F.lit(0).cast("bigint"),
        ).alias("simhash"),
    )


@query("q42_simhash_buckets", oracle=None)  # hash family is engine-specific
def q42_simhash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprints + bucket sizes (C17 SimHash variant).

    Buckets on the top 16 bits group likely-similar docs. Rows-only check
    (hash family is engine-specific); pytest asserts identical docs share
    fingerprints. The pair-emitting path is q46.

    Scale: one explode + one groupBy(doc_id) shuffle (see
    :func:`_simhash_fingerprints`); bucket stats are a second narrow
    aggregation — no pairwise comparisons at all.
    """
    fp = _simhash_fingerprints(spark, sf_dir)
    buckets = fp.withColumn("bucket", F.shiftrightunsigned(F.col("simhash"), 48))
    return buckets.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.min("doc_id").cast("bigint").alias("min_doc_id"),
    )


@query("q46_simhash_neardup_pairs", oracle=None)  # hash family engine-specific
def q46_simhash_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: banded candidate generation + hamming
    verification (C17 — completes the SimHash path beyond q42's bucket
    stats; pairs feed :func:`connected_components` exactly like q40/q44,
    asserted in pytest).

    Pipeline (all built-ins):
      1. 64-bit fingerprints (:func:`_simhash_fingerprints`);
      2. band each fingerprint into 4 × 16-bit keys; equi-join docs that
         agree EXACTLY on any band — by pigeonhole this has perfect recall
         for pairs within hamming distance ≤ 3;
      3. verify candidates with ``bit_count(a XOR b) ≤ 3`` — the 8-byte
         fingerprints travel with the banded rows, so verification is a
         single JVM expression, no second join;
      4. dedup multi-band matches on the pair key.

    Rows-only driver check (the hash family is Spark-specific); quality is
    pinned in pytest by the two guaranteed properties: the output EQUALS
    the brute-force hamming-≤3 pair set (banding completeness), and every
    exact-token-dup pair from q40 (J = 1.0 ⇒ identical fingerprints) is
    emitted with hamming 0. The 64-bit/d=3 configuration is the published
    web-dedup operating point — it targets NEAR-IDENTICAL documents;
    looser J ≥ 0.8 near-dups are MinHash's regime (q41), measured here at
    ~3% recall on the short-doc fixture, by design not a defect.

    Scale: the band equi-join replaces the O(n²) comparison with
    O(n · bands) shuffle rows of ~24 B each; ``shuffle_hash`` on both
    sides keeps the self-join's shared fingerprint subtree reusable and a
    100 TB build side legal (broadcast would not be); hot bands
    (boilerplate-heavy corpora) are the skew case AQE splits.
    """
    fp = _simhash_fingerprints(spark, sf_dir)
    mask = (1 << _SIMHASH_BAND_BITS) - 1
    bands = fp.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(
                            F.col("simhash"), i * _SIMHASH_BAND_BITS
                        )
                        .bitwiseAND(F.lit(mask))
                        .alias("bv"),
                    )
                    for i in range(_SIMHASH_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "simhash", F.col("bb.band").alias("band"), F.col("bb.bv").alias("bv"))

    a, b = bands.alias("a"), bands.alias("b")
    cand = a.hint("shuffle_hash").join(
        b.hint("shuffle_hash"),
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bv") == F.col("b.bv"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    )
    ham = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    ).cast("bigint")
    return (
        cand.select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= _SIMHASH_MAX_HAMMING)
        .groupBy("doc_a", "doc_b")
        .agg(F.min("hamming").cast("bigint").alias("hamming"))
    )


#: duplicate-span window width in tokens (q107)
_SPAN_W = 16


@query(
    "q107_dup_span_detection",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS tk
      FROM documents
    ),
    wins AS (
      SELECT doc_id,
             CAST(concat('0x', substring(
               md5(array_to_string(list_slice(tk, i, i + 15), ' ')),
               1, 15)) AS BIGINT) AS h
      FROM toks, unnest(range(1, len(tk) - 16 + 2)) AS u(i)
      WHERE len(tk) >= 16
    ),
    spans AS (
      SELECT h, min(doc_id) <> max(doc_id) AS dup FROM wins GROUP BY h
    )
    SELECT w.doc_id,
           CAST(count(*) AS BIGINT) AS n_windows,
           CAST(count(*) FILTER (WHERE s.dup) AS BIGINT) AS n_dup_windows,
           CAST(count(*) FILTER (WHERE s.dup) AS DOUBLE) / count(*) AS dup_frac
    FROM wins w JOIN spans s USING (h)
    GROUP BY w.doc_id
    """,
)
def q107_dup_span_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level duplicate-span detection (C17 extension).

    The document-level near-dup queries (q40–q46) miss the common
    training-data pathology of *partially* copied text — boilerplate
    paragraphs repeated across otherwise-distinct documents. The public
    exact-substring approach hashes every W-token window and marks a
    window duplicated when it occurs in more than one document; a doc's
    ``dup_frac`` is the fraction of its windows that are duplicated
    (suffix-array variants find the same spans; rolling window hashes
    are the shuffle-friendly formulation).

    Plan shape (JOIN-FREE — the r5 skew fix): tokens → per-row
    window-hash array (one higher-order ``transform`` over ``sequence``,
    JVM-side; the hash is ``textops.hash60`` — the first 60 bits of the
    window md5 as an int64, ~4× fewer exchange-key bytes than the
    32-hex-char md5 string and int64 compares in the aggregate; the
    oracle computes the identical key) → ONE explode → ``groupBy(hash)``
    keeping (min doc, max
    doc, window count). A hash is cross-doc-duplicated iff min ≠ max —
    and when it is NOT, every one of its windows belongs to the one doc
    ``min`` names, so per-doc UNIQUE-window counts fall straight out of
    the hash-keyed aggregate with NO join back to the window multiset:
    ``n_dup = n_windows − n_unique``. Per-doc totals are the closed
    form ``size(tk) − W + 1`` (a map-only branch — r11; the explode is
    built ONCE), so the only join left is doc-keyed: map branch ⟕
    unique-count aggregate (≤ one row per doc each).

    Why this beats the textbook agg + join-back: a join-back on the hash
    key re-shuffles the full window multiset AND concentrates a
    boilerplate corpus's hot hashes in single join partitions that AQE
    CANNOT split (skew-join rewriting requires bare shuffle children;
    an aggregate-above-shuffle child disqualifies it — verified
    empirically in ``test_aqe_skew.py``). Aggregates are immune: hot
    keys partial-combine map-side. No pairwise comparison anywhere:
    cost is O(total windows) — the shape that survives a 100 TB
    boilerplate-heavy crawl.
    """
    toks = _tokens(F.col("text"))
    # r13 (guide §2.5 input skew): spread the single-split fixture scan
    # — the per-doc window hashing (~size(tk) md5s per doc) otherwise
    # runs in ONE task; no-op at corpus scale (see _tables.spread).
    d = (
        spread(t(spark, sf_dir, "documents"), "doc_id")
        .select("doc_id", toks.alias("tk"))
        .filter(F.size("tk") >= _SPAN_W)
    )
    wins = d.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("tk") - _SPAN_W + 1),
                lambda i: hash60(
                    F.concat_ws(" ", F.slice(F.col("tk"), i, _SPAN_W))
                ),
            )
        ).alias("h"),
    )
    per_h = wins.groupBy("h").agg(
        F.min("doc_id").alias("d0"),
        F.max("doc_id").alias("d1"),
        F.count(F.lit(1)).alias("c"),
    )
    uniq = (
        per_h.filter(F.col("d0") == F.col("d1"))
        .groupBy(F.col("d0").alias("doc_id"))
        .agg(F.sum("c").alias("n_uniq"))
    )
    # Per-doc window totals are ARITHMETIC — size(tk) − W + 1 — so the
    # totals branch is a map-only second pass over the scan, not a
    # second explode: r11 killed the duplicate Generate (the plan used
    # to hash every window TWICE because the totals aggregate re-derived
    # the exploded multiset; the window count was a closed form all
    # along).
    totals = d.select(
        "doc_id",
        (F.size("tk") - F.lit(_SPAN_W - 1)).cast("bigint").alias("n_windows"),
    )
    n_dup = (F.col("n_windows") - F.coalesce(F.col("n_uniq"), F.lit(0))).cast(
        "bigint"
    )
    return (
        totals.join(uniq, "doc_id", "left")
        .select(
            "doc_id",
            "n_windows",
            n_dup.alias("n_dup_windows"),
            (n_dup.cast("double") / F.col("n_windows")).alias("dup_frac"),
        )
    )


@query(
    "q108_fuzzy_hamming_join",
    oracle="""
    WITH p AS (
      SELECT p_partkey, p_name FROM part
      WHERE p_name IS NOT NULL AND len(p_name) >= 3
    )
    SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
           CAST(hamming(a.p_name, b.p_name) AS BIGINT) AS dist
    FROM p a JOIN p b
      ON a.p_partkey < b.p_partkey AND len(a.p_name) = len(b.p_name)
    WHERE CASE WHEN len(a.p_name) = len(b.p_name)
               THEN hamming(a.p_name, b.p_name) ELSE NULL END <= 2
    """,
)
def q108_fuzzy_hamming_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string self-join: part-name pairs within Hamming distance 2
    (C17/entity-resolution extension).

    Candidate generation is the pigeonhole segment blocking from
    ``operators/fuzzyjoin.py`` — 3 contiguous segments per name, pairs
    must share one segment at the same position — an EQUI-join, never
    all-pairs, with zero recall loss (any two equal-length strings
    within distance 2 agree on at least one of 3 segments). The oracle
    is the brute-force definition, so the hash match doubles as the
    exactness proof at fixture scale; `test_fuzzy_join.py` re-proves it
    on adversarial hypothesis inputs.
    """
    p = t(spark, sf_dir, "part").select("p_partkey", "p_name")
    return hamming_self_join(
        p, id_col="p_partkey", str_col="p_name", max_dist=2
    )


@query(
    "q124_fuzzy_levenshtein_join",
    oracle="""
    WITH p AS (
      SELECT p_partkey, p_name FROM part
      WHERE p_name IS NOT NULL AND len(p_name) >= 2
    )
    SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
    FROM p a JOIN p b
      ON a.p_partkey < b.p_partkey
     AND abs(len(a.p_name) - len(b.p_name)) <= 1
    WHERE levenshtein(a.p_name, b.p_name) <= 1
    """,
)
def q124_fuzzy_levenshtein_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy self-join: part-name pairs within Levenshtein
    distance 1 (C17/entity-resolution extension — the indel-tolerant
    upgrade of q108's substitution-only Hamming join, closing the gap
    ``operators/fuzzyjoin.py`` documented).

    Candidate generation is PassJoin's shifted-substring blocking
    (``levenshtein_self_join``): index strings split into k+1 segments,
    probe strings enumerate length-targeted substrings within ±k of each
    segment's home position — a pure EQUI-join on (length, slot,
    substring), never all-pairs, with ZERO recall loss. The oracle is
    the brute-force definition, so the hash match doubles as the
    exactness proof at fixture scale; ``test_fuzzy_join.py`` re-proves
    it on adversarial hypothesis inputs including indel-heavy strings.
    """
    p = t(spark, sf_dir, "part").select("p_partkey", "p_name")
    return levenshtein_self_join(
        p, id_col="p_partkey", str_col="p_name", max_dist=1
    )


@query("q125_semantic_dedup", oracle=None)  # iterative k-means clusters
def q125_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication (C17/C18 bridge — the
    published embedding-space recipe: k-means the corpus, then remove
    within-cluster near-duplicates by cosine similarity). Lexical dedup
    (q40/q41) misses paraphrases; this catches them.

    The pair machinery is ``operators/semdedup.py::semdedup_removed`` —
    size-GATED so the candidate space is bounded by construction
    (≤ (threshold/2 + 1)·n pairs whatever the cluster skew): clusters
    over the member threshold are LSH-sub-bucketed, and cells even LSH
    cannot split (identical-vector masses) collapse exact-dup values and
    star-pair group minima. All pair exchanges are keys-only; vectors
    re-attach per candidate. Fixture clusters are ≤ ~250 members — far
    under the 10k default threshold — so this query IS the exact policy
    (removed iff a lower-id same-cluster vector is within tau), which
    the pytest twin mirrors in numpy bit-for-bit given the
    q94-verified assignment; the gated tiers are pinned separately in
    ``tests/test_semdedup.py`` and priced in ``tools/scale_smoke.py``.
    Rows-only for the driver (float Lloyd is engine-specific).

    Incremental deployments don't rerun this Lloyd loop per crawl batch:
    ``operators/semdedup.py::build_semdedup_index`` freezes the refined
    centroids once and ``append_semdedup_index`` assigns ONLY new
    vectors (O(batch)), with incremental == from-scratch pinned in
    ``tests/test_semdedup.py`` — the same add()-after-train() contract
    as the MinHash/IVF/IVFADC indexes. This query IS the from-scratch
    definition the index parity is proven against.
    """
    from pyspark_streaming_base_spark.functions.vectorops import dvec
    from pyspark_streaming_base_spark.operators.semdedup import semdedup_removed
    from pyspark_streaming_base_spark.queries.pipeline import kmeans_assign

    tau = 0.35  # calibrated to the weakly-clustered synthetic fixture
    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", dvec("embedding").alias("v")
    )
    assigned = kmeans_assign(spark, sf_dir).select("vec_id", "cid").join(emb, "vec_id")
    removed = semdedup_removed(assigned, tau).withColumn("_rm", F.lit(True))
    return (
        assigned.join(removed, "vec_id", "left")
        .select(
            "vec_id",
            F.col("cid").cast("bigint").alias("cluster"),
            F.coalesce(~F.col("_rm"), F.lit(True)).alias("kept"),
        )
    )


from pyspark_streaming_base_spark.queries.text import (  # noqa: E402
    _SPLIT_TEST_HEX as _TEST_HEX,
    _SPLIT_VAL_HEX as _VAL_HEX,
)


@query(
    "q127_leakage_safe_split",
    # the canonical ids come from the SAME recursive-closure CTE as the
    # q44 oracle (upgraded rows-only → oracle in r5), so the whole
    # leakage-safe assignment is value-hash checked
    oracle=f"""
    WITH RECURSIVE {_CLUSTER_CLOSURE_SQL}
    SELECT d.doc_id, d.lang,
           CAST(COALESCE(c.canonical, d.doc_id) AS BIGINT) AS canonical,
           CASE WHEN substring(md5(CAST(COALESCE(c.canonical, d.doc_id)
                                        AS VARCHAR)), 1, 4) < '{_VAL_HEX}'
                THEN 'val'
                WHEN substring(md5(CAST(COALESCE(c.canonical, d.doc_id)
                                        AS VARCHAR)), 1, 4) < '{_TEST_HEX}'
                THEN 'test'
                ELSE 'train' END AS split
    FROM documents d LEFT JOIN canon c ON d.doc_id = c.doc_id
    """,
)
def q127_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-aware train/val/test split (training-pipeline extension):
    q49's md5-threshold split assigns each doc independently, which lets
    two NEAR-DUPLICATES straddle train and test — the classic silent
    leakage path benchmark-decontamination misses. Fix: split by the
    doc's dedup-cluster CANONICAL id (q44's connected components), so an
    entire near-dup family lands in one split; singletons are their own
    canonical and reproduce q49's assignment exactly (pinned in pytest).

    Scale: one left join of the corpus against the (small) clustered-doc
    set plus the same hash-threshold expression as q49 — no new shuffle
    class. Oracle-checked since r5 via the recursive-closure canonical
    CTE (q44's oracle), so the full assignment is value-hash verified.
    """
    d = t(spark, sf_dir, "documents").select("doc_id", "lang")
    clusters = q44_dedup_clusters(spark, sf_dir)
    canon = F.coalesce(F.col("canonical"), F.col("doc_id"))
    hk = F.md5(canon.cast("string")).substr(1, 4)
    from pyspark_streaming_base_spark.queries.text import (
        _SPLIT_TEST_HEX,
        _SPLIT_VAL_HEX,
    )

    return (
        d.join(clusters, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            canon.cast("bigint").alias("canonical"),
            F.when(hk < _SPLIT_VAL_HEX, "val")
            .when(hk < _SPLIT_TEST_HEX, "test")
            .otherwise("train")
            .alias("split"),
        )
    )


@query(
    "q122_cluster_representatives",
    # closure CTE (q44's oracle) × q51's quality expression × a keeper
    # window — upgraded rows-only → oracle in r5
    oracle=f"""
    WITH RECURSIVE {_CLUSTER_CLOSURE_SQL},
    q AS (
      SELECT doc_id,
             0.45 * (CAST(len(list_distinct(list_filter(string_split(text, ' '), x -> x <> ''))) AS DOUBLE)
                     / len(list_filter(string_split(text, ' '), x -> x <> '')))
             + 0.35 * LEAST(CAST(n_chars AS DOUBLE) / 500.0, 1.0)
             + 0.2 * (CASE WHEN len(list_filter(string_split(text, ' '), x -> x <> '')) >= 10
                           THEN 1.0 ELSE 0.0 END) AS quality
      FROM documents
      WHERE len(list_filter(string_split(text, ' '), x -> x <> '')) > 0
    ),
    scored AS (
      SELECT c.doc_id, c.canonical, q.quality
      FROM canon c JOIN q ON c.doc_id = q.doc_id
    ),
    k AS (
      SELECT canonical, doc_id AS keeper_id,
             ROW_NUMBER() OVER (PARTITION BY canonical
                                ORDER BY quality DESC, doc_id ASC) AS rn,
             COUNT(*) OVER (PARTITION BY canonical) AS cluster_size
      FROM scored
    )
    SELECT s.doc_id,
           CAST(s.canonical AS BIGINT) AS cluster,
           CAST(k.keeper_id AS BIGINT) AS keeper_id,
           s.doc_id = k.keeper_id AS kept,
           s.quality AS quality_score,
           CAST(k.cluster_size AS BIGINT) AS cluster_size
    FROM scored s JOIN (SELECT * FROM k WHERE rn = 1) k
      ON s.canonical = k.canonical
    """,
)
def q122_cluster_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-based keeper selection (the dedup DECISION step): for each
    near-dup cluster keep the HIGHEST-QUALITY member, not the lowest id
    — the policy production dedup actually wants (the min-id canonical
    of q44 is an arbitrary survivor; quality-ranked selection keeps the
    longest/most-diverse copy of boilerplate families).

    Composition: q44's transitive clusters × q51's quality scores →
    ``max_by`` per component with a (score, -doc_id) tie-break. Emits
    every clustered doc with its cluster keeper and whether it survives.
    Oracle-checked since r5 (closure CTE × q51's quality SQL × a keeper
    window); the pytest twin additionally proves one keeper per cluster
    and keeper-maximality.
    """
    from pyspark_streaming_base_spark.queries.text import q51_quality_score

    clusters = q44_dedup_clusters(spark, sf_dir)
    quality = q51_quality_score(spark, sf_dir).select(
        "doc_id", F.col("quality").alias("quality_score")
    )
    scored = clusters.join(quality, "doc_id")
    keepers = scored.groupBy("canonical").agg(
        F.max_by(
            "doc_id",
            F.struct(F.col("quality_score"), (-F.col("doc_id")).alias("tb")),
        ).alias("keeper_id"),
        F.max("quality_score").alias("keeper_score"),
        F.count(F.lit(1)).cast("bigint").alias("cluster_size"),
    )
    return (
        scored.join(keepers, "canonical")
        .select(
            "doc_id",
            F.col("canonical").cast("bigint").alias("cluster"),
            F.col("keeper_id").cast("bigint").alias("keeper_id"),
            (F.col("doc_id") == F.col("keeper_id")).alias("kept"),
            "quality_score",
            "cluster_size",
        )
    )


@query(
    "q132_allpairs_cosine_join",
    oracle="""
    WITH base AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ), sh AS (
      SELECT doc_id,
             CASE WHEN len(toks) >= 3
                  THEN list_distinct([array_to_string(list_slice(toks, i, i + 2), ' ')
                                      for i in generate_series(1, len(toks) - 2)])
                  ELSE [array_to_string(toks, ' ')] END AS sg
      FROM base WHERE len(toks) > 0
    ), sized AS (
      SELECT doc_id, CAST(len(sg) AS BIGINT) AS n FROM sh
    ), ex AS (
      SELECT doc_id, unnest(sg) AS s FROM sh
    -- exhaustive RELATIONAL form of the all-pairs definition: a pair
    -- meeting the threshold has c >= ceil(0.6*sqrt(na*nb)) >= 1, i.e.
    -- shares a shingle, so grouping the shingle self-join loses nothing
    -- -- and DuckDB runs it 200x faster than 12.5M list_intersect calls
    -- at sf0.1 (3 s vs 11 min single-threaded)
    ), pairs AS (
      SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS c
      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT p.ia AS id_a, p.ib AS id_b, p.c AS n_common,
           sa.n AS n_a, sb.n AS n_b,
           p.c / sqrt(CAST(sa.n * sb.n AS DOUBLE)) AS cosine
    FROM pairs p
      JOIN sized sa ON sa.doc_id = p.ia
      JOIN sized sb ON sb.doc_id = p.ib
    WHERE p.c * p.c * 25 >= 9 * sa.n * sb.n
    """,
)
def q132_allpairs_cosine_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs set-cosine near-dup join with prefix filtering
    (C17 extension; ``operators/allpairs.py``).

    The lossless counterpart of q41/q42 that needs NO blocking attribute
    (q40 relies on ``lang``) and NO hash family: every pair of documents
    whose distinct word-3-shingle sets have cosine >= 0.6, found by the
    All-Pairs/PPJoin prefix-filter equi-join — candidates must share one
    of each doc's rarest ``n - ceil(tau^2 n) + 1`` shingles — then
    verified with the exact integer test ``25 c^2 >= 9 n_a n_b``.

    The oracle is the brute-force definition, so the value-hash match IS
    the zero-recall-loss proof (the q108/q124 pattern). ``cosine`` is an
    exact-integer ratio through IEEE-correctly-rounded sqrt/divide —
    bit-identical across engines without rounding helpers.

    Scale: prefix-element equi-join (keys-only, AQE-splittable) + one
    verify pass over deduped candidates; see the operator docstring.
    """
    from pyspark_streaming_base_spark.operators.allpairs import (
        cosine_set_self_join,
    )

    d = (
        t(spark, sf_dir, "documents")
        .filter(F.size(_tokens(F.col("text"))) > 0)
        .select("doc_id", _shingles(F.col("text")).alias("sg"))
    )
    return cosine_set_self_join(d, "doc_id", "sg", tau_num=3, tau_den=5)


@query(
    "q135_clustering_coefficient",
    oracle="""
    WITH tt AS (
      SELECT doc_id, lang,
             list_distinct(list_filter(string_split(text, ' '), x -> x <> '')) AS toks
      FROM documents
      WHERE len(list_filter(string_split(text, ' '), x -> x <> '')) > 0
    ), edges AS (
      SELECT a.doc_id AS u, b.doc_id AS v
      FROM tt a JOIN tt b ON a.lang = b.lang AND a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
              / len(list_distinct(list_concat(a.toks, b.toks))) >= 0.8
    ), deg AS (
      SELECT id, CAST(count(*) AS BIGINT) AS degree
      FROM (SELECT u AS id FROM edges UNION ALL SELECT v AS id FROM edges)
      GROUP BY id
    ), tri AS (
      -- exhaustive u < v < w enumeration over the canonical edge list
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM edges e1
      JOIN edges e2 ON e2.u = e1.u AND e2.v > e1.v
      JOIN edges e3 ON e3.u = e1.v AND e3.v = e2.v
    ), pv AS (
      SELECT id, CAST(count(*) AS BIGINT) AS triangles
      FROM (SELECT a AS id FROM tri UNION ALL
            SELECT b FROM tri UNION ALL
            SELECT c FROM tri)
      GROUP BY id
    )
    SELECT d.id AS doc_id, d.degree,
           COALESCE(pv.triangles, CAST(0 AS BIGINT)) AS triangles,
           CASE WHEN d.degree >= 2
                THEN 2.0 * COALESCE(pv.triangles, CAST(0 AS BIGINT))
                     / (d.degree * (d.degree - 1))
                ELSE 0.0 END AS coeff
    FROM deg d LEFT JOIN pv ON pv.id = d.id
    """,
)
def q135_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document triangle counts + local clustering coefficient over
    the q40 near-dup graph (C17/graph extension;
    ``operators/triangles.py``).

    The community-density signal a dedup policy wants BEFORE collapsing
    transitive clusters (q44): a triangle-dense neighborhood is a true
    duplicate family; a triangle-free chain is borderline-match drift
    that min-label propagation would over-merge. Coefficient =
    2·T / (deg·(deg−1)) — an exact integer ratio, bit-identical across
    engines.

    Spark side: degree-ordered wedge enumeration (Schank-Wagner /
    Suri-Vassilvitskii) — O(E^{3/2}) wedge volume on any degree
    distribution; the oracle is the exhaustive u<v<w 3-way self-join, so
    the value-hash match proves the oriented enumeration finds every
    triangle exactly once.
    """
    from pyspark_streaming_base_spark.operators.triangles import (
        triangle_counts,
    )

    edges = q40_ngram_jaccard_pairs(spark, sf_dir).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    return triangle_counts(edges).withColumnRenamed("id", "doc_id")


# ---------------------------------------------------------------------------
# C4-style segment-level dedup with reconstruction (C17 extension)
# ---------------------------------------------------------------------------

#: Fixed-width "line" for line-level dedup over the synthetic corpus: the
#: testdata text has no newlines, so consecutive 8-token segments stand in
#: for the lines/sentences C4 dedups on. The operator is width-agnostic.
_SEG_W = 8


@query(
    "q137_segment_dedup_rebuild",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ),
    seg0 AS (
      SELECT doc_id, toks,
             unnest(range(0, (len(toks) + {_SEG_W} - 1) // {_SEG_W}))
               AS g
      FROM base WHERE len(toks) > 0
    ),
    seg AS (
      SELECT doc_id, CAST(g AS BIGINT) AS g,
             array_to_string(
               list_slice(toks, g * {_SEG_W} + 1, g * {_SEG_W} + {_SEG_W}),
               ' ') AS seg
      FROM seg0
    ),
    marked AS (
      SELECT doc_id, g, seg,
             ROW_NUMBER() OVER (
               PARTITION BY CAST(concat('0x', substring(md5(seg), 1, 15))
                                 AS BIGINT)
               ORDER BY doc_id, g)
               AS occ_rank
      FROM seg
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_segs,
           CAST(COUNT(*) FILTER (WHERE occ_rank > 1) AS BIGINT) AS n_removed,
           md5(COALESCE(
             string_agg(seg, ' ' ORDER BY g) FILTER (WHERE occ_rank = 1),
             '')) AS kept_fp
    FROM marked
    GROUP BY doc_id
    """,
)
def q137_segment_dedup_rebuild(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style segment-level exact dedup WITH document reconstruction
    (C17 extension): split every document into fixed-width token
    segments, keep only the FIRST corpus-wide occurrence of each segment
    text (first = lowest (doc_id, position) — the C4 keeper rule), and
    rebuild each document from its surviving segments in order. Output
    per doc: segment count, removed count, and the md5 fingerprint of the
    rebuilt text — the remove-and-rebuild step that follows q107's
    span DETECTION (q107 reports duplicated spans; this one edits the
    corpus). Raffel et al., "Exploring the Limits of Transfer Learning"
    (C4, 2020) — public.

    Determinism: the keeper is a ROW_NUMBER window ordered on the unique
    (doc_id, g); reconstruction concatenates via array_sort over the
    unique in-doc position, so the rebuilt string (and its md5) is exact
    cross-engine. The keeper window partitions on ``textops.hash60`` of
    the segment (both engines compute the identical 60-bit key), i.e.
    segment identity is its 60-bit fingerprint — the standard
    hash-based-dedup contract; see ``hash60``'s collision note.

    Scale: one narrow posexplode → ONE shuffle for the keeper window,
    PARTITIONED ON AN INT64 KEY (hot boilerplate segments are plain AQE
    skew; every in-partition sort compare is an int64 compare, not a
    ~48-char string compare) → one doc-keyed aggregate. The segment text
    still rides the exchange as payload — the rebuild needs it — so the
    key switch buys compare cost here, not bytes (q107/q185 buy both).
    """
    from pyspark.sql import Window as W

    toks = _tokens(F.col("text"))
    base = (
        t(spark, sf_dir, "documents")
        .select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") > 0)
    )
    seg = base.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.ceil(F.size("toks") / F.lit(_SEG_W)).cast("int") - 1,
                ),
                lambda g: F.concat_ws(
                    " ", F.slice(F.col("toks"), g * _SEG_W + 1, _SEG_W)
                ),
            )
        ).alias("g", "seg"),
    ).select("doc_id", F.col("g").cast("bigint").alias("g"), "seg")
    marked = seg.withColumn(
        "occ_rank",
        F.row_number().over(
            W.partitionBy(hash60(F.col("seg"))).orderBy("doc_id", "g")
        ),
    )
    kept_structs = F.array_sort(
        F.collect_list(
            F.when(F.col("occ_rank") == 1, F.struct("g", "seg"))
        )
    )
    return marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_segs"),
        F.sum((F.col("occ_rank") > 1).cast("bigint"))
        .cast("bigint")
        .alias("n_removed"),
        F.md5(
            F.array_join(
                F.transform(kept_structs, lambda s: s["seg"]), " "
            )
        ).alias("kept_fp"),
    )


@query(
    "q148_cluster_size_histogram",
    oracle=f"""
    WITH RECURSIVE {_CLUSTER_CLOSURE_SQL}
    , sizes AS (
      SELECT canonical, CAST(COUNT(*) AS BIGINT) AS cluster_size
      FROM canon GROUP BY canonical
    )
    SELECT cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(cluster_size * COUNT(*) AS BIGINT) AS n_docs,
           CAST((cluster_size - 1) * COUNT(*) AS BIGINT) AS n_removable
    FROM sizes
    GROUP BY cluster_size
    """,
)
def q148_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-savings report (C17 extension): the cluster-size
    distribution of the near-dup graph — for each size, how many
    families, how many documents they hold, and how many are REMOVABLE
    (size − 1 per family: everything but the canonical). This is the
    number a pipeline owner reads before paying for a dedup pass —
    projected reclaim by family size, and the long-tail/giant-component
    shape that decides keeper policy. Composes q44's components
    (singletons excluded on both sides: un-paired docs form no cluster).

    Scale: q44's machinery + two size-bounded aggregates (clusters, then
    sizes) — nothing beyond the closure's own cost.
    """
    sizes = q44_dedup_clusters(spark, sf_dir).groupBy("canonical").agg(
        F.count(F.lit(1)).cast("bigint").alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
        (F.col("cluster_size") * F.count(F.lit(1)))
        .cast("bigint")
        .alias("n_docs"),
        ((F.col("cluster_size") - 1) * F.count(F.lit(1)))
        .cast("bigint")
        .alias("n_removable"),
    )


#: q156's directed containment pairs as a standalone CTE fragment —
#: shared by the q156 oracle and the q173 measure-overlap oracle.
_CONTAINMENT_PAIRS_SQL = """
    sh AS MATERIALIZED (
      SELECT doc_id, lang,
             CASE WHEN len(toks) >= 3
                  THEN list_distinct([array_to_string(list_slice(toks, i, i + 2), ' ')
                                      for i in generate_series(1, len(toks) - 2)])
                  ELSE [array_to_string(toks, ' ')] END AS shingles
      FROM (SELECT doc_id, lang,
                   list_filter(string_split(text, ' '), x -> x <> '') AS toks
            FROM documents) WHERE len(toks) > 0
    ),
    cp AS MATERIALIZED (
      SELECT a.doc_id AS doc_small, b.doc_id AS doc_big,
             CAST(len(list_intersect(a.shingles, b.shingles)) AS BIGINT) AS n_common,
             CAST(len(a.shingles) AS BIGINT) AS n_small,
             CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
               / len(a.shingles) AS containment
      FROM sh a JOIN sh b
        ON a.lang = b.lang AND a.doc_id <> b.doc_id
           AND 10 * len(b.shingles) >= 9 * len(a.shingles)
      WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
              / len(a.shingles) >= 0.9
    )
"""


@query(
    "q156_containment_pairs",
    oracle=f"""
    WITH {_CONTAINMENT_PAIRS_SQL}
    SELECT doc_small, doc_big, n_common, n_small, containment FROM cp
    """,
)
def q156_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASYMMETRIC near-dup: token-set containment C(A→B) = |A∩B| / |A|
    ≥ 0.9 over word 3-shingle sets — doc_small's phrases live (almost)
    inside doc_big's
    (C17 extension). Catches the subset/truncation duplicates symmetric
    Jaccard misses: a snippet inside a full article has high containment
    but LOW Jaccard (the union is article-sized), so a Jaccard-0.8 gate
    never pairs them. Containment search is Broder's (1997) second
    resemblance measure; LSH Ensemble (Zhu et al., VLDB 2016) is the
    standard index for it at scale.

    Directional output: (doc_small ⊂ doc_big). Same lang blocking and
    O(pairs)-bounded verify as q40; the size prefilter here is the
    containment implication |B| ≥ 0.9·|A| (|A∩B| ≤ |B|), pure-integer
    (10·|B| ≥ 9·|A|) and implied by the final filter, so the oracle
    needs no mirror beyond the same join predicate. Containment is an
    integer ratio → bit-exact double on both engines, no rounding.

    Scale: blocking on lang stands in for an LSH-Ensemble partition; the
    candidate join carries token ARRAYS only for same-block pairs that
    survive the size gate, and the verify is O(candidate pairs), never
    O(n²) over the corpus.
    """
    d = (
        t(spark, sf_dir, "documents")
        # 3-shingle sets, not unigram vocabularies: on any corpus with a
        # bounded vocabulary (this fixture, OCR output, code) token SETS
        # saturate and containment degenerates toward 1 for most pairs;
        # shingles keep the measure about shared PHRASES
        # empty-doc guard on TOKEN count, like q40: the <3-token fallback
        # shingle of a blank doc is [''], never empty, so a guard on the
        # shingle count alone is vacuous — two blank same-lang docs would
        # pair at containment 1.0 on the '' shingle while the oracle's
        # WHERE len(toks) > 0 drops them. Filter before projecting text
        # away; nt stays the shingle count (the containment denominator).
        .filter(F.size(_tokens(F.col("text"))) > 0)
        .select(
            "doc_id",
            "lang",
            _shingles(F.col("text")).alias("shingles"),
            F.size(_shingles(F.col("text"))).alias("nt"),
        )
    )
    # spread the probe side (single-row-group fixture; see q40)
    a = d.repartition(64).alias("a")
    b = d.alias("b")
    j = a.join(
        b,
        (F.col("a.lang") == F.col("b.lang"))
        & (F.col("a.doc_id") != F.col("b.doc_id"))
        & (F.lit(10) * F.col("b.nt") >= F.lit(9) * F.col("a.nt")),
    )
    n_common = F.size(F.array_intersect(F.col("a.shingles"), F.col("b.shingles")))
    containment = n_common.cast("double") / F.col("a.nt")
    return (
        j.select(
            F.col("a.doc_id").alias("doc_small"),
            F.col("b.doc_id").alias("doc_big"),
            n_common.cast("bigint").alias("n_common"),
            F.col("a.nt").cast("bigint").alias("n_small"),
            containment.alias("containment"),
        )
        .filter(F.col("containment") >= 0.9)
    )


@query(
    "q168_kcore",
    # the iterative peel HAS a declarative fixed-point (the q44
    # precedent: rows-only → recursive-CTE oracle): each recursion round
    # carries the full SURVIVOR set (DuckDB's working table is exactly
    # the previous round), the strict-shrink guard stops at the
    # fixpoint, and one final peel application handles the
    # empty-core edge case (guard stops one round late there)
    oracle=f"""
    WITH RECURSIVE {_PAIRS_SQL},
    adj AS MATERIALIZED (
      SELECT doc_a AS id, doc_b AS nb FROM pr
      UNION ALL SELECT doc_b, doc_a FROM pr
    ),
    surv AS (
      SELECT 0 AS round, id FROM (SELECT DISTINCT id FROM adj)
      UNION ALL
      SELECT nx.round, nx.id FROM (
        SELECT s.round + 1 AS round, adj.id
        FROM adj, (SELECT DISTINCT round FROM surv) s
        WHERE adj.id IN (SELECT id FROM surv)
          AND adj.nb IN (SELECT id FROM surv)
        GROUP BY s.round, adj.id
        HAVING COUNT(*) >= 2
      ) nx
      WHERE (SELECT COUNT(*) FROM surv) > (
        SELECT COUNT(*) FROM (
          SELECT adj.id FROM adj
          WHERE adj.id IN (SELECT id FROM surv)
            AND adj.nb IN (SELECT id FROM surv)
          GROUP BY adj.id
          HAVING COUNT(*) >= 2
        )
      )
    ),
    lastround AS (SELECT MAX(round) AS r FROM surv),
    core AS (
      SELECT adj.id FROM adj
      WHERE adj.id IN (SELECT id FROM surv, lastround WHERE round = lastround.r)
        AND adj.nb IN (SELECT id FROM surv, lastround WHERE round = lastround.r)
      GROUP BY adj.id
      HAVING COUNT(*) >= 2
    )
    SELECT CAST(adj.id AS BIGINT) AS doc_id,
           CAST(COUNT(*) AS BIGINT) AS core_degree
    FROM adj
    WHERE adj.id IN (SELECT id FROM core)
      AND adj.nb IN (SELECT id FROM core)
    GROUP BY adj.id
    """,
)
def q168_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-core of the q40 near-dup graph (C17/graph extension;
    ``operators/kcore.py``): iteratively peel degree-<2 documents until
    a fixpoint — what survives is the dense duplication backbone
    (mirror farms, boilerplate families), separated from the chain-like
    periphery that q44's single-edge transitivity merges anyway. The
    fourth member of the graph family: components (global), PageRank
    (influence), triangles (local density), k-core (global density).
    Seidman 1983 — public.

    ORACLE-checked since r9 (rows-only before): DuckDB's recursive
    working table is exactly "the previous round", so the peel is a
    recursive CTE over survivor ROUNDS with a strict-shrink guard as
    the fixpoint test — aggregation over the working table is legal in
    DuckDB, unlike strict-standard engines. The pytest twin still peels
    the same graph in Python sets, vertex-for-vertex.

    Scale: each peel round = one map-side-combined degree aggregate +
    two anti-joins, lineage cut per round (the components.py
    iteration budget); rounds bounded by the peel depth.
    """
    from pyspark_streaming_base_spark.operators.kcore import kcore

    edges = q40_ngram_jaccard_pairs(spark, sf_dir).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    return kcore(edges, k=2).withColumnRenamed("id", "doc_id")


@query(
    "q172_cross_source_dup_matrix",
    oracle=f"""
    WITH {_PAIRS_SQL}
    SELECT LEAST(da.source, db.source) AS source_x,
           GREATEST(da.source, db.source) AS source_y,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT pr.doc_a) + COUNT(DISTINCT pr.doc_b) AS BIGINT)
             AS n_docs_involved
    FROM pr
    JOIN documents da ON da.doc_id = pr.doc_a
    JOIN documents db ON db.doc_id = pr.doc_b
    GROUP BY 1, 2
    """,
)
def q172_cross_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHICH crawls duplicate each other (C17 extension): the near-dup
    pair mass of q40's verified edge set, folded to an (unordered)
    source×source matrix — the diagonal is each source's internal
    duplication, off-diagonal cells say "these two feeds overlap; stop
    paying to ingest both". q159 compares sources by token-distribution
    overlap (could be coincidence of topic); this counts actual
    verified near-duplicate DOCUMENT pairs between them, the number a
    data-acquisition owner acts on.

    Exactness: pure joins + integer counts (`n_docs_involved` counts
    each side's distinct endpoints — a doc pairing twice counts once
    per side). Scale: the expensive part IS q40 (already blocked and
    size-gated); this adds two broadcast-able id→source joins and a
    source²-bounded aggregate.
    """
    pr = q40_ngram_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    src = t(spark, sf_dir, "documents").select("doc_id", "source")
    j = (
        pr.join(src.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("source", "sa"), "doc_a")
        .join(src.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("source", "sb"), "doc_b")
    )
    return (
        j.select(
            F.least("sa", "sb").alias("source_x"),
            F.greatest("sa", "sb").alias("source_y"),
            "doc_a",
            "doc_b",
        )
        .groupBy("source_x", "source_y")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            (F.countDistinct("doc_a") + F.countDistinct("doc_b"))
            .cast("bigint")
            .alias("n_docs_involved"),
        )
    )


@query(
    "q173_dedup_measure_overlap",
    oracle=f"""
    WITH {_PAIRS_SQL},
    {_CONTAINMENT_PAIRS_SQL},
    ju AS (SELECT doc_a, doc_b FROM pr),
    cu AS (
      SELECT DISTINCT LEAST(doc_small, doc_big) AS doc_a,
             GREATEST(doc_small, doc_big) AS doc_b
      FROM cp
    ),
    u AS (
      SELECT COALESCE(j.doc_a, c.doc_a) AS doc_a,
             COALESCE(j.doc_b, c.doc_b) AS doc_b,
             (j.doc_a IS NOT NULL) AS in_j,
             (c.doc_a IS NOT NULL) AS in_c
      FROM ju j FULL OUTER JOIN cu c
        ON j.doc_a = c.doc_a AND j.doc_b = c.doc_b
    )
    SELECT d.lang,
           CAST(SUM(CASE WHEN in_j AND in_c THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
           CAST(SUM(CASE WHEN in_j AND NOT in_c THEN 1 ELSE 0 END) AS BIGINT) AS n_jaccard_only,
           CAST(SUM(CASE WHEN in_c AND NOT in_j THEN 1 ELSE 0 END) AS BIGINT) AS n_containment_only
    FROM u JOIN documents d ON d.doc_id = u.doc_a
    GROUP BY d.lang
    """,
)
def q173_dedup_measure_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHAT each dedup measure uniquely catches (C17 extension): the
    per-language overlap matrix between symmetric Jaccard ≥ 0.8 pairs
    (q40) and containment ≥ 0.9 pairs (q156, undirected-normalized) —
    `n_jaccard_only` are mutual-overlap near-dups (shared vocabulary,
    but no 90%-phrase-containment either way: q40 works on token SETS,
    q156 on 3-shingle PHRASES), `n_containment_only` are the subset/
    truncation duplicates symmetric Jaccard structurally misses (the
    reason q156 exists). The report a dedup-policy owner reads to
    decide whether running BOTH measures pays — measured on the actual
    corpus, not asserted from theory (on this fixture the token-soup
    docs make Jaccard the wide net and containment the precise one).

    Exactness: set operations on two already-exact pair sets + integer
    counts (lang attaches via the lower endpoint; pairs are same-lang
    by construction on both measures). Scale: the expensive parts ARE
    q40/q156 (blocked, size-gated); this adds one pair-keyed full-outer
    join and a lang-sized aggregate — keys-only throughout.
    """
    ju = q40_ngram_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    cu = (
        q156_containment_pairs(spark, sf_dir)
        .select(
            F.least("doc_small", "doc_big").alias("doc_a"),
            F.greatest("doc_small", "doc_big").alias("doc_b"),
        )
        .distinct()
    )
    u = (
        ju.withColumn("in_j", F.lit(True))
        .join(
            cu.withColumn("in_c", F.lit(True)),
            ["doc_a", "doc_b"],
            "full_outer",
        )
        .select(
            "doc_a",
            F.coalesce("in_j", F.lit(False)).alias("in_j"),
            F.coalesce("in_c", F.lit(False)).alias("in_c"),
        )
    )
    lang = t(spark, sf_dir, "documents").select("doc_id", "lang")
    return (
        u.join(lang.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .groupBy("lang")
        .agg(
            F.sum(F.when(F.col("in_j") & F.col("in_c"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_both"),
            F.sum(F.when(F.col("in_j") & ~F.col("in_c"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_jaccard_only"),
            F.sum(F.when(F.col("in_c") & ~F.col("in_j"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_containment_only"),
        )
    )


@query(
    "q174_keeper_policy_report",
    oracle=f"""
    WITH RECURSIVE {_CLUSTER_CLOSURE_SQL},
    toks AS (
      SELECT c.doc_id, c.canonical,
             CAST(len(list_filter(string_split(d.text, ' '), x -> x <> ''))
                  AS BIGINT) AS nt
      FROM canon c JOIN documents d ON d.doc_id = c.doc_id
    ),
    ranked AS (
      SELECT doc_id, canonical, nt,
             (doc_id = canonical) AS keep_low,
             (ROW_NUMBER() OVER (PARTITION BY canonical
                                 ORDER BY nt DESC, doc_id) = 1) AS keep_long
      FROM toks
    )
    SELECT policy,
           CAST(COUNT(DISTINCT canonical) AS BIGINT) AS n_clusters,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(nt) AS BIGINT) AS tokens_total,
           CAST(SUM(CASE WHEN kept THEN nt ELSE 0 END) AS BIGINT) AS tokens_kept,
           CAST(SUM(CASE WHEN kept THEN 0 ELSE nt END) AS BIGINT) AS tokens_dropped
    FROM (
      SELECT 'lowest_id' AS policy, canonical, nt, keep_low AS kept FROM ranked
      UNION ALL
      SELECT 'longest_doc', canonical, nt, keep_long FROM ranked
    )
    GROUP BY policy
    """,
)
def q174_keeper_policy_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHICH keeper policy to run (C17 extension): for each dedup-family
    keeper rule — keep-lowest-id (q44's canonical, the reproducibility
    default) vs keep-longest-doc (the token-retention default, ties on
    lowest id) — the documents and TOKENS kept/dropped across the q44
    near-dup clusters. q148 says how much a dedup pass reclaims; this
    says what each policy's reclaim COSTS in training tokens — the
    number that decides the keeper rule before anyone deletes anything.

    Exactness: integer counts end-to-end (token counts via the one
    shared tokenizer); the longest-doc rank ties on doc_id. Scale: q44's
    closure + one token-count join + a per-cluster window over
    cluster-sized partitions (dup families, never the corpus) + a 2-row
    fold.
    """
    clusters = q44_dedup_clusters(spark, sf_dir)
    nt = t(spark, sf_dir, "documents").select(
        "doc_id", F.size(_tokens(F.col("text"))).cast("bigint").alias("nt")
    )
    from pyspark.sql import Window as W

    ranked = (
        clusters.join(nt, "doc_id")
        .withColumn("keep_low", F.col("doc_id") == F.col("canonical"))
        .withColumn(
            "keep_long",
            F.row_number().over(
                W.partitionBy("canonical").orderBy(F.col("nt").desc(), "doc_id")
            )
            == 1,
        )
    )
    both = ranked.select(
        F.lit("lowest_id").alias("policy"), "canonical", "nt",
        F.col("keep_low").alias("kept"),
    ).unionByName(
        ranked.select(
            F.lit("longest_doc").alias("policy"), "canonical", "nt",
            F.col("keep_long").alias("kept"),
        )
    )
    return both.groupBy("policy").agg(
        F.countDistinct("canonical").cast("bigint").alias("n_clusters"),
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("kept"), 1).otherwise(0)).cast("bigint").alias("n_kept"),
        F.sum("nt").cast("bigint").alias("tokens_total"),
        F.sum(F.when(F.col("kept"), F.col("nt")).otherwise(0))
        .cast("bigint")
        .alias("tokens_kept"),
        F.sum(F.when(F.col("kept"), 0).otherwise(F.col("nt")))
        .cast("bigint")
        .alias("tokens_dropped"),
    )


@query(
    "q183_cluster_density_audit",
    oracle=f"""
    WITH RECURSIVE {_CLUSTER_CLOSURE_SQL},
    sizes AS (
      SELECT canonical, CAST(COUNT(*) AS BIGINT) AS sz
      FROM canon GROUP BY canonical
    ),
    per_cluster AS (
      SELECT c.canonical, CAST(COUNT(*) AS BIGINT) AS n_pairs
      FROM pr p JOIN canon c ON c.doc_id = p.doc_a
      GROUP BY c.canonical
    )
    SELECT s.sz AS cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(p.n_pairs) AS BIGINT) AS verified_pairs,
           CAST(COUNT(*) * s.sz * (s.sz - 1) / 2 AS BIGINT) AS possible_pairs,
           CAST(SUM(p.n_pairs) AS DOUBLE)
             / (COUNT(*) * s.sz * (s.sz - 1) / 2) AS mean_density,
           CAST(MIN(p.n_pairs) AS BIGINT) AS min_cluster_pairs,
           CAST(MIN(p.n_pairs) AS DOUBLE) / (s.sz * (s.sz - 1) / 2)
             AS min_density
    FROM sizes s JOIN per_cluster p ON p.canonical = s.canonical
    GROUP BY s.sz
    """,
)
def q183_cluster_density_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge DENSITY inside the transitive near-dup clusters, bucketed by
    cluster size (C17 quality audit) — the over-merge diagnostic for
    closure-based dedup: transitive closure promotes A~B~C chains into
    one cluster whether or not A~C verifies, so a size-k cluster backed
    by only k−1 verified pairs (density → 2/k) is a CHAIN — likely two
    distinct documents bridged by a hybrid — while density ≈ 1 means a
    genuine duplicate family. Reports, per cluster size: cluster count,
    verified q40 pairs inside them vs the C(k,2) possible, the mean
    density, and the sparsest cluster's pair count/density — the number
    that says whether ``canonical``-keeper deletion (q174's policies) is
    safe or is about to delete non-duplicates that merely chained.

    Exactness: integer pair/cluster counts; densities are single
    divisions of exact integers (possible_pairs uses integer k(k−1)/2 —
    k or k−1 is even, so the division is exact on both engines).

    Scale: pairs and components are the ALREADY-BLOCKED q40/q44
    machinery (pair mass is dup-family-bounded, never corpus²); the
    audit adds one doc-keyed join of pairs to their component label, a
    component-sized aggregate, and a size-bucketed fold over #clusters
    rows. Pairs need no both-endpoint check: components are closed over
    the pair set, so doc_a's component IS the pair's component.
    """
    pairs = q40_ngram_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    clusters = q44_dedup_clusters(spark, sf_dir)
    sizes = clusters.groupBy("canonical").agg(
        F.count(F.lit(1)).cast("bigint").alias("sz")
    )
    per_cluster = (
        pairs.join(
            clusters.select(
                F.col("doc_id").alias("doc_a"), "canonical"
            ),
            "doc_a",
        )
        .groupBy("canonical")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    )
    possible = F.col("sz") * (F.col("sz") - 1) / F.lit(2)
    per = sizes.join(per_cluster, "canonical")
    return per.groupBy(F.col("sz").alias("cluster_size")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
        F.sum("n_pairs").cast("bigint").alias("verified_pairs"),
        (F.count(F.lit(1)) * F.first(possible)).cast("bigint").alias(
            "possible_pairs"
        ),
        (
            F.sum("n_pairs").cast("double")
            / (F.count(F.lit(1)) * F.first(possible))
        ).alias("mean_density"),
        F.min("n_pairs").cast("bigint").alias("min_cluster_pairs"),
        (F.min("n_pairs").cast("double") / F.first(possible)).alias(
            "min_density"
        ),
    )


@query(
    "q185_dup_span_by_source",
    oracle="""
    WITH toks AS (
      SELECT source, doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS tk
      FROM documents
    ),
    wins AS (
      SELECT source, doc_id,
             CAST(concat('0x', substring(
               md5(array_to_string(list_slice(tk, i, i + 15), ' ')),
               1, 15)) AS BIGINT) AS h
      FROM toks, unnest(range(1, len(tk) - 16 + 2)) AS u(i)
      WHERE len(tk) >= 16
    ),
    sh AS (
      SELECT source, h, CAST(COUNT(*) AS BIGINT) AS c,
             MIN(doc_id) AS d0s, MAX(doc_id) AS d1s
      FROM wins GROUP BY source, h
    ),
    g AS (
      SELECT h, CAST(COUNT(*) AS BIGINT) AS ns,
             CAST(SUM(c) AS BIGINT) AS tot,
             MIN(d0s) AS dmin, MAX(d1s) AS dmax
      FROM sh GROUP BY h
    )
    SELECT sh.source,
           CAST(SUM(c) AS BIGINT) AS n_windows,
           CAST(SUM(CASE WHEN g.tot > 1 THEN c ELSE 0 END) AS BIGINT)
             AS n_repeated,
           CAST(SUM(CASE WHEN g.dmin <> g.dmax THEN c ELSE 0 END) AS BIGINT)
             AS n_cross_doc,
           CAST(SUM(CASE WHEN g.ns > 1 THEN c ELSE 0 END) AS BIGINT)
             AS n_cross_source,
           CAST(SUM(CASE WHEN g.tot > 1 THEN c ELSE 0 END) AS DOUBLE)
             / CAST(SUM(c) AS DOUBLE) AS repeated_frac,
           CAST(SUM(CASE WHEN g.dmin <> g.dmax THEN c ELSE 0 END) AS DOUBLE)
             / CAST(SUM(c) AS DOUBLE) AS cross_doc_frac,
           CAST(SUM(CASE WHEN g.ns > 1 THEN c ELSE 0 END) AS DOUBLE)
             / CAST(SUM(c) AS DOUBLE) AS cross_source_frac
    FROM sh JOIN g USING (h)
    GROUP BY sh.source
    """,
)
def q185_dup_span_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-span MASS per source, three tiers (C17 extension) —
    q107's window-hash machinery rolled up to the feed level, the Dolma
    duplicate-n-gram fraction as a per-source report: of each source's
    16-token windows, the fraction occurring more than once anywhere
    (repeated — includes within-doc boilerplate), in more than one
    document (cross_doc — q107's rule), and in more than one SOURCE
    (cross_source — the feed-mirroring tier q178 detects by prefix and
    this measures by exact span mass). A source with high repeated_frac
    but low cross_source_frac has internal template rot (fix the feed);
    high cross_source_frac means the source duplicates the rest of the
    corpus (drop or down-weight it — q126's mixture decision).

    Exactness: integer window counts + single divisions.

    Scale: ONE explode to window hashes (O(total windows), the q107
    budget; ``textops.hash60`` int64 keys — the corpus-sized exchange
    carries 8-byte keys, not 32-hex-char md5 strings) → hash aggregate
    keyed (source, h) — hot boilerplate hashes partial-combine map-side
    (the q107 skew argument) → the per-hash rollup as a WINDOW over
    that aggregate (partitions are ≤ |sources| rows; the exchange on h
    carries one-row-per-(source,h) aggregates, never the window
    multiset — and no join side re-derives the explode) → a
    catalog-sized fold.
    """
    toks = _tokens(F.col("text"))
    d = (
        t(spark, sf_dir, "documents")
        .select("source", "doc_id", toks.alias("tk"))
        .filter(F.size("tk") >= _SPAN_W)
    )
    wins = d.select(
        "source",
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("tk") - _SPAN_W + 1),
                lambda i: hash60(
                    F.concat_ws(" ", F.slice(F.col("tk"), i, _SPAN_W))
                ),
            )
        ).alias("h"),
    )
    sh = wins.groupBy("source", "h").agg(
        F.count(F.lit(1)).cast("bigint").alias("c"),
        F.min("doc_id").alias("d0s"),
        F.max("doc_id").alias("d1s"),
    )
    # The per-hash rollup rides a WINDOW over the (source, h) aggregate
    # instead of a second aggregate branch: a separate `sh.groupBy(h)`
    # cannot reuse sh's exchange (different keys), so Spark re-derived
    # the whole explode pipeline for the join's other side — every
    # window hashed TWICE (caught in the r11 plan audit). The window
    # partition is ≤ |sources| rows per hash, exchanged as one-row-per-
    # (source, h) aggregates, never the window multiset.
    from pyspark.sql import Window as W

    w_h = W.partitionBy("h")
    g = sh.select(
        "source",
        "c",
        F.count(F.lit(1)).over(w_h).cast("bigint").alias("ns"),
        F.sum("c").over(w_h).cast("bigint").alias("tot"),
        F.min("d0s").over(w_h).alias("dmin"),
        F.max("d1s").over(w_h).alias("dmax"),
    )
    rep = F.when(F.col("tot") > 1, F.col("c")).otherwise(F.lit(0))
    xdoc = F.when(F.col("dmin") != F.col("dmax"), F.col("c")).otherwise(F.lit(0))
    xsrc = F.when(F.col("ns") > 1, F.col("c")).otherwise(F.lit(0))
    return (
        g.groupBy("source")
        .agg(
            F.sum("c").cast("bigint").alias("n_windows"),
            F.sum(rep).cast("bigint").alias("n_repeated"),
            F.sum(xdoc).cast("bigint").alias("n_cross_doc"),
            F.sum(xsrc).cast("bigint").alias("n_cross_source"),
            (F.sum(rep).cast("double") / F.sum("c").cast("double")).alias(
                "repeated_frac"
            ),
            (F.sum(xdoc).cast("double") / F.sum("c").cast("double")).alias(
                "cross_doc_frac"
            ),
            (F.sum(xsrc).cast("double") / F.sum("c").cast("double")).alias(
                "cross_source_frac"
            ),
        )
    )


@query(
    "q190_token_yield_ladder",
    oracle=f"""
    WITH base AS (
      SELECT source, doc_id,
             TRIM(regexp_replace(regexp_replace(LOWER(text),
                  '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm,
             list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents
    ),
    sized AS (
      SELECT source, doc_id, norm, toks,
             CAST(len(toks) AS BIGINT) AS nt
      FROM base
    ),
    keeper AS (
      SELECT source, doc_id, toks, nt,
             ROW_NUMBER() OVER (
               PARTITION BY CAST(concat('0x', substring(md5(norm), 1, 15))
                                 AS BIGINT)
               ORDER BY doc_id) AS rn
      FROM sized
    ),
    surv AS (SELECT * FROM keeper WHERE rn = 1),
    seg0 AS (
      SELECT source, doc_id, toks,
             unnest(range(0, (CAST(nt AS INTEGER) + {_SEG_W} - 1) // {_SEG_W}))
               AS g
      FROM surv WHERE nt > 0
    ),
    seg AS (
      SELECT source, doc_id, CAST(g AS BIGINT) AS g,
             array_to_string(
               list_slice(toks, g * {_SEG_W} + 1, g * {_SEG_W} + {_SEG_W}),
               ' ') AS seg,
             CAST(len(list_slice(toks, g * {_SEG_W} + 1,
                                 g * {_SEG_W} + {_SEG_W})) AS BIGINT)
               AS seg_nt
      FROM seg0
    ),
    segk AS (
      SELECT source, seg_nt,
             ROW_NUMBER() OVER (
               PARTITION BY CAST(concat('0x', substring(md5(seg), 1, 15))
                                 AS BIGINT)
               ORDER BY doc_id, g) AS occ
      FROM seg
    ),
    t_seg AS (
      SELECT source, CAST(SUM(seg_nt) FILTER (WHERE occ = 1) AS BIGINT)
               AS tokens_after_segment_dedup
      FROM segk GROUP BY source
    ),
    t_raw AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(nt) AS BIGINT) AS raw_tokens
      FROM sized GROUP BY source
    ),
    t_doc AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS docs_after_doc_dedup,
             CAST(SUM(nt) AS BIGINT) AS tokens_after_doc_dedup
      FROM surv GROUP BY source
    )
    SELECT t_raw.source, n_docs, raw_tokens,
           docs_after_doc_dedup, tokens_after_doc_dedup,
           COALESCE(tokens_after_segment_dedup, 0)
             AS tokens_after_segment_dedup,
           CAST(tokens_after_doc_dedup AS DOUBLE) / raw_tokens
             AS doc_dedup_yield,
           CAST(COALESCE(tokens_after_segment_dedup, 0) AS DOUBLE)
             / raw_tokens AS segment_dedup_yield
    FROM t_raw
    JOIN t_doc USING (source)
    LEFT JOIN t_seg USING (source)
    """,
)
def q190_token_yield_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-token YIELD LADDER per source (C17/training-econ
    extension, r11): how many tokens each feed actually contributes
    after the standard dedup passes run in sequence — raw → exact
    whole-document dedup (first occurrence by doc_id of the q22-style
    normalized text, deduped CORPUS-WIDE so mirror feeds pay, not just
    internal repeats) → C4 segment-level dedup (q137's keeper rule, on
    the doc-dedup survivors). The two yield fractions are the numbers a
    mixture designer multiplies into q126-style sampling weights: a
    source with high raw volume but low segment yield is boilerplate
    masquerading as data.

    Exactness: integer token counts end to end; two closing divisions.
    Both keeper windows partition on ``textops.hash60`` (the identical
    60-bit key on both engines — q137's contract and collision note).

    Scale (audited in PLANS.md): the normalized text never shuffles —
    it is consumed into the 8-byte ``hk`` at the scan. Catalyst splits
    the ladder into a SLIM doc-count branch (column pruning drops the
    token arrays; the keeper exchange carries (hk, source, doc_id, nt)
    only) and a segment branch whose doc-keeper exchange carries the
    token arrays as payload — the segment tier needs them, and any
    join-back alternative shuffles the same bytes on doc_id instead.
    Both keeper rank-filters compile to ``WindowGroupLimit``: each map
    partition pre-keeps only its first row per key BEFORE the
    exchange, so duplicate mass is dropped map-side. The segment
    exchange itself is slim (shk int64 + counts; segment text consumed
    into the hash). At 100 TB, cut the token-payload carry with a
    survivor-id Bloom re-scan (``operators/bloom.py``, the q139
    machinery) so payloads stay scan-local. Hot boilerplate segments
    are plain AQE skew (aggregate-free window partitions).
    """
    from pyspark.sql import Window as W

    from pyspark_streaming_base_spark.functions.textops import normalize

    base = t(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        hash60(normalize(F.col("text"))).alias("hk"),
        _tokens(F.col("text")).alias("toks"),
    ).withColumn("nt", F.size("toks").cast("bigint"))

    keeper = base.withColumn(
        "rn", F.row_number().over(W.partitionBy("hk").orderBy("doc_id"))
    )
    surv = keeper.filter(F.col("rn") == 1).select(
        "source", "doc_id", "toks", "nt"
    )

    seg = surv.filter(F.col("nt") > 0).select(
        "source",
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(0),
                    F.ceil(F.col("nt") / F.lit(_SEG_W)).cast("int") - 1,
                ),
                lambda g: F.slice(F.col("toks"), g * _SEG_W + 1, _SEG_W),
            )
        ).alias("g", "segtoks"),
    ).select(
        "source",
        "doc_id",
        F.col("g").cast("bigint").alias("g"),
        hash60(F.concat_ws(" ", F.col("segtoks"))).alias("shk"),
        F.size("segtoks").cast("bigint").alias("seg_nt"),
    )
    segk = seg.withColumn(
        "occ", F.row_number().over(W.partitionBy("shk").orderBy("doc_id", "g"))
    )
    t_seg = (
        segk.filter(F.col("occ") == 1)
        .groupBy("source")
        .agg(F.sum("seg_nt").cast("bigint").alias("tokens_after_segment_dedup"))
    )
    t_raw = base.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("nt").cast("bigint").alias("raw_tokens"),
    )
    t_doc = surv.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("docs_after_doc_dedup"),
        F.sum("nt").cast("bigint").alias("tokens_after_doc_dedup"),
    )
    out = (
        t_raw.join(t_doc, "source")
        .join(t_seg, "source", "left")
        .select(
            "source",
            "n_docs",
            "raw_tokens",
            "docs_after_doc_dedup",
            "tokens_after_doc_dedup",
            F.coalesce("tokens_after_segment_dedup", F.lit(0))
            .cast("bigint")
            .alias("tokens_after_segment_dedup"),
            (
                F.col("tokens_after_doc_dedup").cast("double")
                / F.col("raw_tokens").cast("double")
            ).alias("doc_dedup_yield"),
            (
                F.coalesce("tokens_after_segment_dedup", F.lit(0)).cast(
                    "double"
                )
                / F.col("raw_tokens").cast("double")
            ).alias("segment_dedup_yield"),
        )
    )
    return out


@query(
    "q191_split_leakage_audit",
    # the same recursive-closure CTE as the q44/q127 oracles + q49's
    # md5 split rule — the whole audit is value-hash checked
    oracle=f"""
    WITH RECURSIVE {_CLUSTER_CLOSURE_SQL},
    m AS (
      SELECT c.canonical, d.lang,
             CASE WHEN substring(md5(CAST(c.doc_id AS VARCHAR)), 1, 4)
                       < '{_VAL_HEX}' THEN 'val'
                  WHEN substring(md5(CAST(c.doc_id AS VARCHAR)), 1, 4)
                       < '{_TEST_HEX}' THEN 'test'
                  ELSE 'train' END AS split
      FROM canon c JOIN documents d ON c.doc_id = d.doc_id
    ),
    g1 AS (
      SELECT lang, canonical, split, CAST(COUNT(*) AS BIGINT) AS ni
      FROM m GROUP BY lang, canonical, split
    ),
    g2 AS (
      SELECT lang, canonical,
             CAST(SUM(ni) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS n_splits,
             CAST(SUM(ni * (ni - 1)) AS BIGINT) AS same2
      FROM g1 GROUP BY lang, canonical
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(COUNT(*) FILTER (WHERE n_splits > 1) AS BIGINT)
             AS leaky_clusters,
           CAST(SUM(n * (n - 1) - same2) // 2 AS BIGINT) AS leaky_pairs,
           CAST(COALESCE(SUM(n) FILTER (WHERE n_splits > 1), 0) AS BIGINT)
             AS leaky_docs
    FROM g2 GROUP BY lang
    """,
)
def q191_split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-split NEAR-DUP leakage audit (C17/training-econ extension,
    r12): how much train/test contamination the naive per-doc split rule
    (q49's md5(doc_id) thresholds) actually incurs on this corpus — the
    measured hazard q127's canonical-keyed assignment exists to prevent
    (the q183 pattern: q183 audits q44's over-merge, this audits q49's
    leakage). Per language: near-dup clusters (q44's verified
    components, lang-blocked by construction), clusters straddling ≥2
    splits, the straddling PAIR count (every such pair is a
    train-sees-test document pair benchmark decontamination misses —
    exact n-gram checks catch none of them, the members are near-, not
    exact, duplicates), and the docs inside leaky clusters.

    leaky_pairs per cluster is pure integer math — C(n,2) minus the
    same-split pairs ΣC(nᵢ,2), computed as (n(n−1) − Σnᵢ(nᵢ−1)) div 2
    (even by construction; integer div, the q189 rule). Under q127's
    rule this table is zeros by construction: a whole cluster shares
    its canonical's split.

    Scale: q44's component table (dup families, not the corpus) joined
    once to (doc_id, lang), two map-side-combinable aggregates keyed by
    (lang, canonical[, split]) — no new shuffle class; the split is a
    pure hash function of doc_id (no RNG, invariant 5).
    """
    from pyspark_streaming_base_spark.queries.text import (
        _SPLIT_TEST_HEX,
        _SPLIT_VAL_HEX,
    )

    clusters = q44_dedup_clusters(spark, sf_dir)
    d = t(spark, sf_dir, "documents").select("doc_id", "lang")
    hk = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
    split = (
        F.when(hk < _SPLIT_VAL_HEX, "val")
        .when(hk < _SPLIT_TEST_HEX, "test")
        .otherwise("train")
    )
    m = clusters.join(d, "doc_id").select("lang", "canonical", split.alias("split"))
    g1 = m.groupBy("lang", "canonical", "split").agg(
        F.count(F.lit(1)).cast("bigint").alias("ni")
    )
    g2 = g1.groupBy("lang", "canonical").agg(
        F.sum("ni").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_splits"),
        F.sum(F.col("ni") * (F.col("ni") - 1)).cast("bigint").alias("same2"),
    )
    return g2.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
        F.count(F.when(F.col("n_splits") > 1, 1))
        .cast("bigint")
        .alias("leaky_clusters"),
        F.expr("CAST(sum(n * (n - 1) - same2) div 2 AS BIGINT)").alias(
            "leaky_pairs"
        ),
        F.coalesce(F.sum(F.when(F.col("n_splits") > 1, F.col("n"))), F.lit(0))
        .cast("bigint")
        .alias("leaky_docs"),
    )

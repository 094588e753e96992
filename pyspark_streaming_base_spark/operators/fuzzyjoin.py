"""Fuzzy (approximate-string) self-join with pigeonhole segment blocking.

Entity-resolution / record-linkage primitive: find all id pairs whose
string attribute is within Hamming distance ``k`` — WITHOUT the O(n²)
all-pairs comparison. The blocking rule is the pigeonhole principle used
by the published segment-based similarity-join family (PassJoin et al.):
split each string into ``k+1`` contiguous segments; two equal-length
strings within Hamming distance ``k`` differ in at most ``k`` positions,
so at least one of the ``k+1`` segments is position-for-position
identical. Candidate generation is therefore an EQUI-join on
``(length, segment_index, segment_value)`` — every true pair is
guaranteed to be a candidate (no recall loss; proven by the
brute-force-equivalence tests), and only candidates pay the O(length)
exact verification.

Two distances, two blocking rules:

* :func:`hamming_self_join` — equal-length substitution distance; the
  plain pigeonhole applies (segments stay put), candidate keys are
  ``(length, seg_idx, seg_value)``.
* :func:`levenshtein_self_join` — full edit distance (PassJoin's
  shifted-substring enumeration, Li/Deng/Feng PVLDB 2011): with indels
  an unedited segment of ``s`` still appears as a substring of ``r``,
  but shifted by the net indels before it — at most ``k`` positions.
  So the probe side enumerates, for every indexable target length
  ``l ∈ [|r|-k, |r|+k]`` and segment slot, the substrings of ``r``
  starting within ±k of the segment's home position, and candidates are
  again a pure EQUI-join on ``(l, seg_idx, substring)``. Every true
  pair is admitted (the shift bound is exhaustive), so recall loss is
  zero — proven by the brute-force-equivalence tests — and only
  candidates pay the O(length²) exact verification.

Scale shape, in order of leverage:

1. **Distinct-string domain** (``_group_identical``): the blocking/
   verify machinery runs on DISTINCT strings only; identical-string
   groups expand back afterwards (``_expand_groups``), a double explode
   whose fan-out IS the answer. On duplicate-heavy corpora candidate
   volume shrinks quadratically with the duplication factor — measured
   on part names at sf0.1 (20 000 rows, 64 distinct): 31M id-pair
   candidates → ~2 000 string pairs, q108 19.5 s → 1.4 s and q124
   37.5 s → 1.3 s with hash-identical output.
2. **Keys only in the exchanges**: the segment join and pair dedup
   carry (id, length, slot, segment) with the full strings projected
   away; strings re-attach by id for verification only (the same
   keys-only-payload rule as the LSH probe join in
   ``queries/similarity.py``; string payloads in the exchange OOMed a
   1 GB heap before this).
3. **Dedup before verify**: a pair matching m blocking keys is verified
   once, not m times (measured 3× faster on the pre-dedup domain).
4. Bucket sizes are bounded by segment-value frequency — skewed
   segments split like any AQE equi-join (proven in
   ``test_aqe_skew.py``) — and verification is JVM-side (``zip_with``
   char compare / banded built-in ``levenshtein``) over deduplicated
   candidate rows only. Probe-side enumeration is a constant factor —
   (2k+1) lengths × (k+1) segments × a tight ⌊(k±Δ)/2⌋ shift window —
   never O(n²).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hamming_distance(a: Column, b: Column) -> Column:
    """Position-wise mismatch count of two equal-length strings
    (JVM-side: char zip + conditional sum, no Python)."""
    return F.aggregate(
        F.zip_with(
            F.split(a, ""),
            F.split(b, ""),
            lambda x, y: F.when(x != y, 1).otherwise(0),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )


def _segments(df: DataFrame, id_col: str, str_col: str, n_seg: int) -> DataFrame:
    """Explode each row into its ``n_seg`` contiguous segments.

    Segment ``i`` (1-based) starts at ``1 + (i-1)*q + min(i-1, r)`` with
    length ``q + (i <= r)`` where ``q, r = divmod(length, n_seg)`` — the
    canonical even split (first ``r`` segments one char longer).
    """
    L = F.length(F.col(str_col))
    q, r = (L / n_seg).cast("int"), L % n_seg
    i = F.col("_seg_idx")
    start = 1 + (i - 1) * q + F.least(i - 1, r)
    seg_len = q + F.when(i <= r, 1).otherwise(0)
    return (
        df.select(
            F.col(id_col),
            F.col(str_col),
            L.alias("_len"),
            F.explode(F.sequence(F.lit(1), F.lit(n_seg))).alias("_seg_idx"),
        )
        .withColumn("_seg", F.col(str_col).substr(start, seg_len))
    )


def hamming_self_join(
    df: DataFrame,
    id_col: str,
    str_col: str,
    max_dist: int,
    out_a: str = "id_a",
    out_b: str = "id_b",
    dist_col: str = "dist",
) -> DataFrame:
    """All pairs ``(id_a < id_b)`` with equal-length ``str_col`` values
    within Hamming distance ``max_dist``. Exact (no recall loss): the
    ``max_dist + 1``-segment pigeonhole blocking admits every true pair.
    """
    if max_dist < 0:
        raise ValueError("max_dist must be >= 0")
    n_seg = max_dist + 1
    base = df.select(F.col(id_col), F.col(str_col)).filter(
        F.col(str_col).isNotNull() & (F.length(str_col) >= n_seg)
    )
    groups = _group_identical(base, id_col, str_col)
    reps = groups.select(F.col("_rep").alias(id_col), F.col(str_col))
    # keys-only candidate generation OVER THE DISTINCT-STRING DOMAIN:
    # the strings never enter the segment join or the pair dedup, and
    # identical strings participate exactly once (see module docstring)
    segs = _segments(reps, id_col, str_col, n_seg).select(
        id_col, "_len", "_seg_idx", "_seg"
    )
    a, b = segs.alias("a"), segs.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a._len") == F.col("b._len"))
            & (F.col("a._seg_idx") == F.col("b._seg_idx"))
            & (F.col("a._seg") == F.col("b._seg"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias(out_a),
            F.col(f"b.{id_col}").alias(out_b),
        )
        # a pair sharing m segments appears m times: dedup the KEYS-ONLY
        # multiset BEFORE attaching strings and verifying (measured: on
        # duplicate-heavy corpora the matching pairs are exactly the ones
        # with dup factor k+1, so verify-first triples the distance work)
        .dropDuplicates([out_a, out_b])
    )
    rep_pairs = _attach_and_verify(
        cand,
        reps,
        id_col,
        str_col,
        hamming_distance,
        max_dist,
        out_a,
        out_b,
        dist_col,
    )
    return _expand_groups(
        rep_pairs, base, groups, id_col, str_col, out_a, out_b, dist_col
    )


def _group_identical(base: DataFrame, id_col: str, str_col: str) -> DataFrame:
    """(string, _rep = min id): one row per distinct string value.

    The similarity machinery then runs on the DISTINCT-VALUE DOMAIN only
    — the decisive optimization on duplicate-heavy corpora, where the
    candidate pair space shrinks QUADRATICALLY with the duplication
    factor (measured on part names at sf0.1: 20 000 rows but 64 distinct
    strings → the segment join's 31M id-pair candidates collapse to
    ~2 000 string pairs; the published similarity-join literature calls
    this value-level deduplication). Group expansion afterwards is
    O(output rows) — work proportional to the answer, which no algorithm
    avoids. Deliberately NO collect_list here: a 10⁸-duplicate value
    would put a 10⁸-element array in one row — expansion uses joins
    instead (:func:`_expand_groups`), keeping every row O(1)."""
    return base.groupBy(str_col).agg(F.min(id_col).alias("_rep"))


def _expand_groups(
    rep_pairs: DataFrame,
    base: DataFrame,
    groups: DataFrame,
    id_col: str,
    str_col: str,
    out_a: str,
    out_b: str,
    dist_col: str,
) -> DataFrame:
    """Expand representative-level pairs back to id-level pairs, with
    JOINS only (every row stays O(1) — no per-group id arrays):

    * WITHIN a group: identical strings are all at distance 0 — a
      self-equi-join of ``base`` on the string value with ``id < id``
      emits every ``C(|g|, 2)`` pair; a hot value is a skewed equi-join
      partition, exactly what AQE splits (bare shuffle children);
    * ACROSS groups: each verified (rep_a, rep_b, dist) pair joins the
      (id, rep) membership table twice, fanning out to ``|g_a| × |g_b|``
      id pairs with the same distance (distinct strings, so dist ≥ 1 and
      the pair cannot also arise within).

    Ids interleave across groups, so the output order is normalized with
    least/greatest. No dedup needed: the sources are disjoint by
    construction."""
    l, r = base.alias("l"), base.alias("r")
    within = (
        l.join(
            r,
            (F.col(f"l.{str_col}") == F.col(f"r.{str_col}"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias(out_a),
            F.col(f"r.{id_col}").alias(out_b),
        )
        .withColumn(dist_col, F.lit(0).cast("bigint"))
    )
    memb = base.join(groups, str_col).select(F.col(id_col), F.col("_rep"))
    ma = memb.select(F.col("_rep").alias(out_a), F.col(id_col).alias("_ia"))
    mb = memb.select(F.col("_rep").alias(out_b), F.col(id_col).alias("_ib"))
    cross = (
        rep_pairs.join(ma, out_a)
        .join(mb, out_b)
        .select(
            F.least("_ia", "_ib").alias(out_a),
            F.greatest("_ia", "_ib").alias(out_b),
            dist_col,
        )
    )
    return within.unionByName(cross)


def _attach_and_verify(
    cand: DataFrame,
    base: DataFrame,
    id_col: str,
    str_col: str,
    distance,
    max_dist: int,
    out_a: str,
    out_b: str,
    dist_col: str,
) -> DataFrame:
    """Re-attach the two strings to the deduplicated (id_a, id_b)
    candidate frame by id equi-joins and keep pairs within ``max_dist``.
    Dedup-before-verify is deliberate and MEASURED: on duplicate-heavy
    corpora the surviving pairs are exactly the ones that matched on
    every blocking key (dup factor k+1 / (k+1)(2k+1)), so verify-first
    multiplies the distance work where it is densest — q108 at sf0.1 ran
    74 s verify-first vs 25 s dedup-first. The dedup exchange itself is
    keys-only (16 B/row). AQE broadcasts the base side when small; at
    corpus scale the attach joins are plain hash joins on the id key."""
    sa = base.select(F.col(id_col).alias(out_a), F.col(str_col).alias("_sa"))
    sb = base.select(F.col(id_col).alias(out_b), F.col(str_col).alias("_sb"))
    d = distance(F.col("_sa"), F.col("_sb"))
    return (
        cand.join(sa, out_a)
        .join(sb, out_b)
        .withColumn(dist_col, d.cast("bigint"))
        # >= 0 admits the threshold form of levenshtein, which returns
        # -1 (after an early-exit banded DP) when the distance exceeds
        # the bound; plain distances are always >= 0, so this is inert
        # for them
        .filter((F.col(dist_col) >= 0) & (F.col(dist_col) <= max_dist))
        .select(out_a, out_b, dist_col)
    )


def levenshtein_self_join(
    df: DataFrame,
    id_col: str,
    str_col: str,
    max_dist: int,
    out_a: str = "id_a",
    out_b: str = "id_b",
    dist_col: str = "dist",
) -> DataFrame:
    """All pairs ``(id_a < id_b)`` with ``levenshtein(str) <= max_dist``,
    over strings of length ≥ ``max_dist + 1`` (shorter strings cannot
    host a non-empty segment per slot; filter both sides identically in
    any oracle). Exact — zero recall loss:

    * index side: each string ``s`` split into ``k+1`` even segments,
      keyed by ``(|s|, seg_idx, seg_value)``;
    * probe side: each string ``r`` emits, for every target length
      ``l ∈ [|r|-k, |r|+k]`` and segment slot of an ``l``-length string,
      the substrings of ``r`` of that segment's length starting within
      ±k of the segment's home position (net indel shift of an unedited
      segment is bounded by the total edit budget k);
    * pigeonhole: ≤ k edits over k+1 segments leaves one segment of
      ``s`` untouched, and it appears among r's enumerated substrings —
      so the equi-join admits every true pair, one direction sufficing
      (the guarantee holds per ordered pair; ``id < id`` keeps probe=a,
      index=b).

    Verification is Spark's built-in ``levenshtein`` (JVM DP) on
    deduplicated candidates only.
    """
    if max_dist < 0:
        raise ValueError("max_dist must be >= 0")
    k, n_seg = max_dist, max_dist + 1
    base = df.select(F.col(id_col), F.col(str_col)).filter(
        F.col(str_col).isNotNull() & (F.length(str_col) >= n_seg)
    )
    # distinct-string domain + group expansion (see _group_identical)
    groups = _group_identical(base, id_col, str_col)
    reps = groups.select(F.col("_rep").alias(id_col), F.col(str_col))
    segs = _segments(reps, id_col, str_col, n_seg).select(
        id_col, "_len", "_seg_idx", "_seg"
    )

    L = F.length(F.col(str_col))
    probes = (
        reps.select(
            F.col(id_col),
            F.col(str_col),
            L.alias("_rlen"),
            F.explode(F.sequence(L - k, L + k)).alias("_l"),
        )
        .filter(F.col("_l") >= n_seg)  # only lengths the index can hold
        .select(
            id_col,
            str_col,
            "_rlen",
            "_l",
            F.explode(F.sequence(F.lit(1), F.lit(n_seg))).alias("_seg_idx"),
        )
    )
    # segment geometry of an _l-length string (same split as _segments)
    q = (F.col("_l") / n_seg).cast("int")
    r = F.col("_l") % n_seg
    i = F.col("_seg_idx")
    p = 1 + (i - 1) * q + F.least(i - 1, r)
    seg_len = q + F.when(i <= r, 1).otherwise(0)
    # TIGHT shift window (the PassJoin length-aware bound): the start
    # shift of an unedited segment is (insertions − deletions) before
    # it; with I − D = Δ = |r| − l and I + D ≤ k, I ≤ ⌊(k+Δ)/2⌋ and
    # D ≤ ⌊(k−Δ)/2⌋, so shift ∈ [−⌊(k−Δ)/2⌋, ⌊(k+Δ)/2⌋]. At k=1 the
    # dominant equal-length case needs shift 0 ONLY (an indel pair
    # cannot keep the length) — ~3× fewer candidates than a naive ±k
    # window, zero recall loss (hypothesis-swept).
    delta = F.col("_rlen") - F.col("_l")
    s_lo = -F.floor((F.lit(k) - delta) / 2).cast("int")
    s_hi = F.floor((F.lit(k) + delta) / 2).cast("int")
    lo = F.greatest(F.lit(1), p + s_lo)
    hi = F.least(F.col("_rlen") - seg_len + 1, p + s_hi)
    probes = (
        probes.withColumn("_seg_len", seg_len)
        .withColumn(
            "_w",
            # sequence(lo, hi) with lo > hi would COUNT DOWN — emit an
            # empty window instead (segment longer than the probe string)
            F.explode(
                F.when(lo <= hi, F.sequence(lo, hi)).otherwise(
                    F.array().cast("array<int>")
                )
            ),
        )
        .withColumn("_sub", F.col(str_col).substr(F.col("_w"), F.col("_seg_len")))
        # keys-only from here: the probe string served its purpose
        .select(id_col, "_l", "_seg_idx", "_sub")
    )

    cand = (
        probes.alias("a")
        .join(
            segs.alias("b"),
            (F.col("a._l") == F.col("b._len"))
            & (F.col("a._seg_idx") == F.col("b._seg_idx"))
            & (F.col("a._sub") == F.col("b._seg"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias(out_a),
            F.col(f"b.{id_col}").alias(out_b),
        )
        # a pair can match via several (length, slot, shift) keys: dedup
        # the keys-only multiset BEFORE the O(length^2) DP so each
        # candidate is verified once (measured faster than verify-first
        # at sf0.1: 34 s vs 45 s)
        .dropDuplicates([out_a, out_b])
    )
    rep_pairs = _attach_and_verify(
        cand,
        reps,
        id_col,
        str_col,
        # threshold form: banded DP that early-exits past max_dist and
        # returns -1 — O(length·k) per verify instead of O(length²)
        lambda a, b: F.levenshtein(a, b, max_dist),
        max_dist,
        out_a,
        out_b,
        dist_col,
    )
    return _expand_groups(
        rep_pairs, base, groups, id_col, str_col, out_a, out_b, dist_col
    )

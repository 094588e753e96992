"""All-pairs set-similarity self-join with prefix filtering.

The exact (zero-recall-loss, no-hash-family) similarity join: find every
id pair whose element SETS have cosine similarity

    cos(x, y) = |x ∩ y| / sqrt(|x|·|y|)  >=  tau

WITHOUT the O(n²) all-pairs comparison and WITHOUT an approximate
blocking key. This is the published All-Pairs / PPJoin prefix-filtering
design (Bayardo, Ma, Srikant WWW'07; Xiao, Wang, Lin, Yu WWW'08): order
every set's elements by one global canonical order (ascending document
frequency — rarest first — tie-broken by value), and observe that a pair
meeting the threshold MUST share an element inside each side's short
"prefix" under that order.

Why it is lossless (the prefix-filter lemma): with the pair's required
overlap ``alpha = ceil(tau * sqrt(|x|·|y|))``, the canonical result is
that the ``(|x| - alpha + 1)``-prefix of x and the ``(|y| - alpha + 1)``-
prefix of y must contain a COMMON element (if all common elements sat in
x's last ``alpha - 1`` positions, fewer than alpha could exist). A record
does not know its partner's size, but the size filter
``|y| >= tau² · |x|`` (implied by ``alpha <= min(|x|,|y|)``) bounds the
worst case: ``alpha >= ceil(tau² · |x|)``, so the per-record prefix

    p(x) = |x| - ceil(tau² · |x|) + 1

is always long enough. Candidate generation is therefore a pure
EQUI-join of prefix elements — every qualifying pair is admitted by
construction (pinned by the brute-force-equivalence tests and the
brute-force DuckDB oracle of q132), and only candidates pay the exact
intersection.

Complements the rest of the dedup family: q40 blocks on an ATTRIBUTE
(lang — needs one to exist), MinHash/SimHash (q41/q42) are approximate,
and this operator is exact with a data-derived blocking key. The rarest
element of a near-dup pair is what meets in the join, so candidate
volume is bounded by sum-of-squares of PREFIX-element frequencies — the
low-df tail of the vocabulary, not the stopword head.

Scale shape:

1. **Keys-only exchanges**: the df-rank join, the prefix self-join and
   the pair dedup carry (id, element, n) only; element arrays re-attach
   by id for the single verification pass (the fuzzyjoin rule).
2. **Prefix-bounded candidates**: only ``|x| - ceil(tau²|x|) + 1``
   elements per record enter the join (~(1 - tau²)·|x| — at tau = 0.9,
   19% of the corpus's element occurrences), and they are each record's
   RAREST elements, so bucket sizes concentrate on low df. Hot-element
   buckets are plain equi-join skew — AQE-splittable.
3. **Exact integer threshold**: with ``tau = num/den`` rational, both
   the size filter and the final test are pure int64 comparisons
   (``den²·c² >= num²·|x|·|y|``) — no float epsilon, engine-portable.
   Overflow-safe while ``den·|x| < 3·10⁹`` (ANSI mode fails loudly).
4. One df-count shuffle (vocabulary-sized), one per-record window to
   take prefixes (record-sized partitions), one prefix equi-join, two
   id-joins for verify. No global vocabulary rank table: the order only
   needs to be consistent, so (df, element) sorts WITHIN each record.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _ceil_div(n: Column, num: int, den: int) -> Column:
    """ceil(n·num/den) as bigint: floor((n·num + den − 1) / den)."""
    return F.floor((n * F.lit(num) + F.lit(den - 1)) / F.lit(den)).cast("bigint")


def _sets(df: DataFrame, id_col: str, set_col: str) -> DataFrame:
    elems = F.array_distinct(F.col(set_col))
    return df.select(
        F.col(id_col).alias("_id"),
        elems.alias("_elems"),
        F.size(elems).cast("bigint").alias("_n"),
    ).filter(F.col("_n") > 0)


def prefix_elements(
    df: DataFrame, id_col: str, set_col: str, tau_num: int, tau_den: int
) -> DataFrame:
    """The ``(_id, _e, _n)`` prefix rows that candidate generation
    equi-joins on — each record's rarest ``n - ceil(tau²·n) + 1``
    elements under the global (df asc, element asc) order. Exposed so
    tests can pin the PRUNING (which elements enter the join), not just
    the final answer (which verification would fix regardless)."""
    if not (0 < tau_num <= tau_den):
        raise ValueError(f"tau must be in (0, 1]: got {tau_num}/{tau_den}")
    n2, d2 = tau_num * tau_num, tau_den * tau_den
    tok = _sets(df, id_col, set_col).select(
        "_id", "_n", F.explode("_elems").alias("_e")
    )
    dfreq = tok.groupBy("_e").agg(F.count(F.lit(1)).alias("_df"))
    w = Window.partitionBy("_id").orderBy("_df", "_e")
    return (
        tok.join(dfreq, "_e")
        .withColumn("_pos", F.row_number().over(w))
        .filter(
            F.col("_pos")
            <= F.col("_n") - _ceil_div(F.col("_n"), n2, d2) + F.lit(1)
        )
        .select("_id", "_e", "_n")
    )


def cosine_set_self_join(
    df: DataFrame,
    id_col: str,
    set_col: str,
    tau_num: int,
    tau_den: int,
) -> DataFrame:
    """All id pairs whose distinct-element sets have cosine similarity
    ``>= tau_num/tau_den``, by prefix-filtered equi-join + exact verify.

    ``set_col`` is an array column; elements are deduplicated here, and
    ids with empty sets are excluded (cosine with an empty set is 0/0).
    Returns ``(id_a, id_b, n_common, n_a, n_b, cosine)`` with
    ``id_a < id_b``; ``cosine = n_common / sqrt(n_a·n_b)`` is a ratio of
    exact integers through IEEE-correctly-rounded sqrt/divide, so it is
    bit-identical across engines (safe for value-hash oracles).
    """
    if not (0 < tau_num <= tau_den):
        raise ValueError(
            f"tau must be in (0, 1]: got {tau_num}/{tau_den}"
        )
    n2, d2 = tau_num * tau_num, tau_den * tau_den
    sets = _sets(df, id_col, set_col)
    # canonical global order = (df asc, element asc); applied per record,
    # so no global rank materialization. Prefix keeps the first
    # n - ceil(tau²·n) + 1 elements — the record's rarest.
    prefix = prefix_elements(df, id_col, set_col, tau_num, tau_den)
    a, b = prefix.alias("a"), prefix.alias("b")
    # size filter: alpha <= min requires den²·min >= num²·max
    cands = (
        a.join(
            b,
            (F.col("a._e") == F.col("b._e"))
            & (F.col("a._id") < F.col("b._id"))
            & (
                F.least(F.col("a._n"), F.col("b._n")) * d2
                >= F.greatest(F.col("a._n"), F.col("b._n")) * n2
            ),
        )
        .select(
            F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b")
        )
        .distinct()  # a pair sharing m prefix elements verifies once
    )
    sa = sets.select(
        F.col("_id").alias("id_a"),
        F.col("_elems").alias("_ea"),
        F.col("_n").alias("n_a"),
    )
    sb = sets.select(
        F.col("_id").alias("id_b"),
        F.col("_elems").alias("_eb"),
        F.col("_n").alias("n_b"),
    )
    c = F.size(F.array_intersect(F.col("_ea"), F.col("_eb"))).cast("bigint")
    return (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("n_common", c)
        .filter(
            F.col("n_common") * F.col("n_common") * F.lit(d2)
            >= F.lit(n2) * F.col("n_a") * F.col("n_b")
        )
        .select(
            "id_a",
            "id_b",
            "n_common",
            "n_a",
            "n_b",
            (
                F.col("n_common")
                / F.sqrt((F.col("n_a") * F.col("n_b")).cast("double"))
            ).alias("cosine"),
        )
    )

"""cosine_set_self_join: prefix filtering must lose NO pairs — the result
equals the brute-force all-pairs cosine definition exactly — and the plan
must be an equi-join, never a cartesian product (the q108/q124 contract,
for the set-similarity family)."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
import pytest

from pyspark_streaming_base_spark.operators.allpairs import (
    cosine_set_self_join,
)
from pyspark_streaming_base_spark.plans import formatted_plan

from pyspark.sql import functions as F


def _brute(rows, num, den):
    """All-pairs definition on python sets: (id_a, id_b, c, na, nb) for
    every pair with den²·c² >= num²·na·nb; empty sets excluded."""
    out = set()
    sets = [(i, set(s)) for i, s in rows if s]
    for x, (ia, sa) in enumerate(sets):
        for ib, sb in sets[x + 1 :]:
            lo, hi = min(ia, ib), max(ia, ib)
            c = len(sa & sb)
            if den * den * c * c >= num * num * len(sa) * len(sb):
                out.add((lo, hi, c, len(sa if lo == ia else sb),
                         len(sb if hi == ib else sa)))
    return out


def _run(spark, rows, num, den):
    df = spark.createDataFrame(rows, "id long, s array<string>")
    got = cosine_set_self_join(df, "id", "s", tau_num=num, tau_den=den)
    return {(r.id_a, r.id_b, r.n_common, r.n_a, r.n_b) for r in got.collect()}


def test_exactness_on_fixed_corpus(spark):
    rows = [
        (1, ["a", "b", "c", "d"]),
        (2, ["a", "b", "c", "e"]),   # c=3, cos=0.75 vs 1
        (3, ["a", "b", "c", "d"]),   # identical to 1
        (4, ["x", "y"]),             # disjoint from all
        (5, ["a"]),                  # tiny: size filter kicks in
        (6, []),                     # empty: excluded
        (7, ["b", "c", "d", "a", "a"]),  # dup elements: deduped == 1
    ]
    for num, den in ((1, 2), (3, 5), (4, 5), (1, 1)):
        assert _run(spark, rows, num, den) == _brute(
            [(i, s) for i, s in rows], num, den
        ), f"tau={num}/{den}"


def test_cosine_value_matches_definition(spark):
    rows = [(1, ["a", "b", "c", "d"]), (2, ["a", "b", "c", "e"])]
    df = spark.createDataFrame(rows, "id long, s array<string>")
    [r] = cosine_set_self_join(df, "id", "s", tau_num=1, tau_den=2).collect()
    assert r.cosine == pytest.approx(3 / math.sqrt(16), abs=0)
    assert (r.n_common, r.n_a, r.n_b) == (3, 4, 4)


def test_invalid_tau_raises(spark):
    df = spark.createDataFrame([(1, ["a"])], "id long, s array<string>")
    for num, den in ((0, 5), (6, 5), (-1, 5)):
        with pytest.raises(ValueError):
            cosine_set_self_join(df, "id", "s", tau_num=num, tau_den=den)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(
    corpora=st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=0, max_size=8),
        min_size=0,
        max_size=20,
    ),
    tau=st.sampled_from([(1, 2), (3, 5), (7, 10), (9, 10), (1, 1)]),
)
def test_equals_bruteforce_property(spark, corpora, tau):
    """Random small-alphabet corpora maximize collisions/duplicates —
    exactly where a broken prefix bound would drop pairs."""
    num, den = tau
    rows = [(i, s) for i, s in enumerate(corpora)]
    assert _run(spark, rows, num, den) == _brute(rows, num, den)


def test_no_cartesian_in_plan(spark):
    df = spark.createDataFrame(
        [(i, [f"t{i}", f"t{i+1}", "common"]) for i in range(50)],
        "id long, s array<string>",
    )
    plan = formatted_plan(cosine_set_self_join(df, "id", "s", 3, 5))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_prefix_actually_prunes(spark):
    """The blocking must not degenerate to all-pairs: on a corpus whose
    only shared element is a universal stopword, that element must sort
    LAST (highest df) and fall outside every prefix — so the candidate
    join has nothing to match on. Pins the pruning itself via the
    exposed prefix stage, not just the final answer (which verification
    would fix regardless)."""
    from pyspark_streaming_base_spark.operators.allpairs import (
        prefix_elements,
    )

    # 30 docs: 9 unique elements each + "the" shared by all. tau=9/10
    # => prefix length = 10 - ceil(8.1) + 1 = 2: the two rarest per doc,
    # never "the" (df=30 vs df=1).
    rows = [
        (i, [f"u{i}_{j}" for j in range(9)] + ["the"]) for i in range(30)
    ]
    df = spark.createDataFrame(rows, "id long, s array<string>")
    pref = prefix_elements(df, "id", "s", 9, 10).collect()
    assert len(pref) == 60  # 2 per doc
    assert all(r._e != "the" for r in pref)  # stopword pruned everywhere
    # => zero candidates (every prefix element has df=1), zero output
    assert cosine_set_self_join(df, "id", "s", 9, 10).count() == 0


def test_registered_query_matches_brute_force_at_sf0001(spark):
    """q132 on the real fixture vs an in-Spark brute force (array join on
    doc_id inequality) — the oracle's equivalence, independent of DuckDB."""
    from pyspark_streaming_base_spark.functions.textops import word_shingles
    from pyspark_streaming_base_spark.queries._tables import t
    from pyspark_streaming_base_spark.queries.dedup import (
        q132_allpairs_cosine_join,
    )

    sf_dir = "/root/testdata/sf0.001"
    got = {
        (r.id_a, r.id_b, r.n_common, r.n_a, r.n_b)
        for r in q132_allpairs_cosine_join(spark, sf_dir).collect()
    }
    toks = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    d = (
        t(spark, sf_dir, "documents")
        .filter(F.size(toks) > 0)
        .select(
            "doc_id",
            word_shingles(F.col("text")).alias("sg"),
            F.size(word_shingles(F.col("text"))).cast("bigint").alias("n"),
        )
    )
    a, b = d.alias("a"), d.alias("b")
    c = F.size(F.array_intersect(F.col("a.sg"), F.col("b.sg"))).cast("bigint")
    brute = {
        (r.id_a, r.id_b, r.n_common, r.n_a, r.n_b)
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            c.alias("n_common"),
            F.col("a.n").alias("n_a"),
            F.col("b.n").alias("n_b"),
        )
        .filter(
            F.col("n_common") * F.col("n_common") * 25
            >= 9 * F.col("n_a") * F.col("n_b")
        )
        .collect()
    }
    assert got == brute and len(got) > 0

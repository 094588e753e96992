"""hamming_self_join: pigeonhole segment blocking must lose NO pairs —
the result equals the brute-force all-pairs definition exactly — and the
plan must be an equi-join, never a cartesian product."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
import pytest

from pyspark_streaming_base_spark.operators.fuzzyjoin import (
    hamming_distance,
    hamming_self_join,
    levenshtein_self_join,
)
from pyspark_streaming_base_spark.plans import formatted_plan

from pyspark.sql import functions as F


def _brute(rows, k):
    out = set()
    for i, (ia, sa) in enumerate(rows):
        for ib, sb in rows[i + 1 :]:
            if sa is None or sb is None or len(sa) != len(sb):
                continue
            if len(sa) < k + 1:
                continue  # operator contract: strings shorter than k+1 excluded
            d = sum(1 for x, y in zip(sa, sb) if x != y)
            if d <= k:
                out.add((min(ia, ib), max(ia, ib), d))
    return out


def _run(spark, rows, k):
    df = spark.createDataFrame(rows, "id long, s string")
    got = hamming_self_join(df, "id", "s", max_dist=k)
    return {(r.id_a, r.id_b, r.dist) for r in got.collect()}


def test_exactness_on_fixed_corpus(spark):
    rows = [
        (1, "abcdef"),
        (2, "abcdxf"),  # d=1 vs 1
        (3, "azcdxf"),  # d=1 vs 2, d=2 vs 1
        (4, "zzzzzz"),  # far
        (5, "abcdef"),  # d=0 vs 1
        (6, "abc"),     # different length: never matches the 6-char group
        (7, None),      # null excluded
        (8, "abd"),     # d=1 vs 6
    ]
    for k in (0, 1, 2):
        assert _run(spark, rows, k) == _brute(rows, k), f"k={k}"


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(
    strs=st.lists(
        st.text(alphabet="abc", min_size=0, max_size=7), min_size=0, max_size=25
    ),
    k=st.integers(min_value=0, max_value=3),
)
def test_equals_bruteforce_property(spark, strs, k):
    rows = [(i, s) for i, s in enumerate(strs)]
    assert _run(spark, rows, k) == _brute(rows, k)


def test_no_cartesian_in_plan(spark):
    df = spark.createDataFrame(
        [(i, f"name{i:04d}") for i in range(50)], "id long, s string"
    )
    plan = formatted_plan(hamming_self_join(df, "id", "s", max_dist=2))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pair_uniqueness(spark):
    # identical strings share ALL segments; the pair must still appear once
    df = spark.createDataFrame([(1, "aaaa"), (2, "aaaa")], "id long, s string")
    got = hamming_self_join(df, "id", "s", max_dist=1).collect()
    assert [(r.id_a, r.id_b, r.dist) for r in got] == [(1, 2, 0)]


def test_hamming_distance_expression(spark):
    df = spark.createDataFrame([("kitten", "sitten")], "a string, b string")
    assert df.select(
        hamming_distance(F.col("a"), F.col("b")).alias("d")
    ).first().d == 1


def test_rejects_negative_dist(spark):
    df = spark.createDataFrame([(1, "a")], "id long, s string")
    with pytest.raises(ValueError):
        hamming_self_join(df, "id", "s", max_dist=-1)


# -- levenshtein_self_join (PassJoin shifted-substring blocking) -----------


def _lev(a, b):
    m, n = len(a), len(b)
    dp = list(range(n + 1))
    for i in range(1, m + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, n + 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return dp[n]


def _brute_lev(rows, k):
    out = set()
    for i, (ia, sa) in enumerate(rows):
        for ib, sb in rows[i + 1 :]:
            if sa is None or sb is None:
                continue
            if len(sa) < k + 1 or len(sb) < k + 1:
                continue  # operator contract: strings shorter than k+1 excluded
            d = _lev(sa, sb)
            if d <= k:
                out.add((min(ia, ib), max(ia, ib), d))
    return out


def _run_lev(spark, rows, k):
    df = spark.createDataFrame(rows, "id long, s string")
    got = levenshtein_self_join(df, "id", "s", max_dist=k)
    return {(r.id_a, r.id_b, r.dist) for r in got.collect()}


def test_lev_exactness_on_indel_corpus(spark):
    rows = [
        (1, "abcdef"),
        (2, "abcdeef"),  # insertion: d=1 vs 1
        (3, "abcdf"),    # deletion: d=1 vs 1
        (4, "abcdxf"),   # substitution: d=1 vs 1
        (5, "abcdef"),   # d=0 vs 1
        (6, "fedcba"),   # far
        (7, None),       # null excluded
        (8, "bcdef"),    # prefix deletion: d=1 vs 1 (shift stresses window)
    ]
    for k in (0, 1, 2):
        assert _run_lev(spark, rows, k) == _brute_lev(rows, k), f"k={k}"


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(
    strs=st.lists(
        st.text(alphabet="ab", min_size=0, max_size=7), min_size=0, max_size=20
    ),
    k=st.integers(min_value=0, max_value=2),
)
def test_lev_equals_bruteforce_property(spark, strs, k):
    # tiny alphabet maximizes near-miss density: the hardest recall test
    rows = [(i, s) for i, s in enumerate(strs)]
    assert _run_lev(spark, rows, k) == _brute_lev(rows, k)


def test_lev_no_cartesian_in_plan(spark):
    df = spark.createDataFrame(
        [(i, f"name{i:04d}") for i in range(50)], "id long, s string"
    )
    plan = formatted_plan(levenshtein_self_join(df, "id", "s", max_dist=1))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_lev_pair_uniqueness(spark):
    # identical strings match via every (length, slot, shift) key; the
    # pair must still appear exactly once
    df = spark.createDataFrame([(1, "aaaa"), (2, "aaaa")], "id long, s string")
    got = levenshtein_self_join(df, "id", "s", max_dist=1).collect()
    assert [(r.id_a, r.id_b, r.dist) for r in got] == [(1, 2, 0)]


def test_lev_rejects_negative_dist(spark):
    df = spark.createDataFrame([(1, "a")], "id long, s string")
    with pytest.raises(ValueError):
        levenshtein_self_join(df, "id", "s", max_dist=-1)

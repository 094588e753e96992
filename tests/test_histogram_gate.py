"""Size-gated equi-depth histogram / percentiles (operators/histogram.py,
q116/q26): the exact branch must be bit-identical to the plain ntile /
percentile formulation, the sketch branch must respect the published
rank-error bound, and the per-key gate must route each key to exactly
one branch inside one plan."""

from __future__ import annotations

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from pyspark_streaming_base_spark.operators.histogram import (
    equidepth_histogram,
    gated_percentiles,
)
from pyspark_streaming_base_spark.queries._tables import t

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    df = t(spark, SF, "events").select("event_type", "value", "event_id").cache()
    df.count()
    return df


def _exact_reference(events, n_buckets=10):
    w = W.partitionBy("event_type").orderBy("value", "event_id")
    return (
        events.select(
            "event_type",
            "value",
            F.ntile(n_buckets).over(w).cast("bigint").alias("bucket"),
        )
        .groupBy("event_type", "bucket")
        .agg(
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        )
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_exact_branch_identical_to_ntile(events):
    got = equidepth_histogram(
        events, "event_type", "value", tie_col="event_id"
    )
    assert _rows(got) == _rows(_exact_reference(events))


def test_sketch_branch_bucket_depths_and_bounds(events):
    """threshold=0 forces EVERY key through the sketch: per-key totals
    must be preserved exactly, all 10 buckets populated, and each
    bucket's depth within the approx_percentile rank-error envelope."""
    got = equidepth_histogram(
        events, "event_type", "value", tie_col="event_id", exact_threshold=0
    ).collect()
    totals = {
        r.event_type: r["count"]
        for r in events.groupBy("event_type").count().collect()
    }
    by_key = {}
    for r in got:
        by_key.setdefault(r.event_type, []).append(r)
    assert set(by_key) == set(totals)
    for key, rows in by_key.items():
        n = totals[key]
        assert sum(r.n_rows for r in rows) == n  # no row lost or doubled
        assert sorted(r.bucket for r in rows) == list(range(1, 11))
        # rank error per cut point is <= n/accuracy (= n/10000); allow a
        # couple of extra rows for value ties at cut boundaries
        tol = max(4, (2 * n) // 10_000)
        for r in rows:
            assert abs(r.n_rows - n / 10) <= tol, (key, r.bucket, r.n_rows, n)
        # bucket value ranges are ordered: lo/hi non-decreasing by bucket
        ordered = sorted(rows, key=lambda r: r.bucket)
        for a, b in zip(ordered, ordered[1:]):
            assert a.hi <= b.lo or abs(a.hi - b.lo) < 1e-9


def test_mixed_gate_routes_each_key_once(spark):
    """One key under and one key over the threshold in the same call:
    the small key reproduces exact ntile, the big key is sketch-bucketed,
    and no key appears in both branches."""
    small = [("a", float(v), v) for v in range(20)]
    big = [("b", float(v % 997) + v * 1e-9, v) for v in range(5000)]
    df = spark.createDataFrame(
        small + big, "k string, value double, event_id long"
    )
    got = equidepth_histogram(
        df, "k", "value", tie_col="event_id", n_buckets=4, exact_threshold=100
    ).collect()
    a_rows = sorted((r for r in got if r.k == "a"), key=lambda r: r.bucket)
    b_rows = sorted((r for r in got if r.k == "b"), key=lambda r: r.bucket)
    # exact branch: 20 rows into 4 buckets of exactly 5
    assert [r.n_rows for r in a_rows] == [5, 5, 5, 5]
    assert [r.bucket for r in a_rows] == [1, 2, 3, 4]
    # sketch branch: totals preserved, all buckets populated
    assert sum(r.n_rows for r in b_rows) == 5000
    assert [r.bucket for r in b_rows] == [1, 2, 3, 4]
    for r in b_rows:
        assert abs(r.n_rows - 1250) <= 30


def test_gated_percentiles_exact_matches_plain(spark):
    li = t(spark, SF, "lineitem")
    got = {
        r.l_returnflag: (r.p50, r.p90, r.n_rows)
        for r in gated_percentiles(
            li, "l_returnflag", "l_extendedprice", percentiles=(0.5, 0.9)
        ).collect()
    }
    want = {
        r.l_returnflag: (r.p50, r.p90, r.n_rows)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, 0.5)").alias("p50"),
            F.expr("percentile(l_extendedprice, 0.9)").alias("p90"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        )
        .collect()
    }
    assert got == want  # bit-exact: same branch, same function


def test_gated_percentiles_sketch_within_rank_error(spark):
    li = t(spark, SF, "lineitem")
    approx = {
        r.l_returnflag: (r.p50, r.p90)
        for r in gated_percentiles(
            li, "l_returnflag", "l_extendedprice", exact_threshold=0
        ).collect()
    }
    vals = {}
    for r in li.select("l_returnflag", "l_extendedprice").collect():
        vals.setdefault(r.l_returnflag, []).append(r.l_extendedprice)
    for flag, xs in vals.items():
        xs.sort()
        n = len(xs)
        for p, got in zip((0.5, 0.9), approx[flag]):
            # percentile_approx returns a REAL element within n/accuracy
            # ranks of the target
            target = int(p * (n - 1))
            tol = max(2, (2 * n) // 10_000)
            lo = xs[max(0, target - tol)]
            hi = xs[min(n - 1, target + tol)]
            assert lo <= got <= hi, (flag, p, got, lo, hi)

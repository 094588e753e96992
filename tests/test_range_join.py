"""banded_range_join must be row-multiset-equivalent to the nested-loop
join it replaces, and must actually plan as a hash join on the band key."""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from pyspark_streaming_base_spark.operators.rangejoin import banded_range_join
from pyspark_streaming_base_spark.plans import formatted_plan


def _multiset(df, cols):
    return Counter(tuple(r[c] for c in cols) for r in df.select(*cols).collect())


def _points(spark, vals):
    return spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)] or [(0, -1e9)], "pid long, v double"
    )


def _intervals(spark, pairs):
    rows = [(i, float(min(a, b)), float(max(a, b))) for i, (a, b) in enumerate(pairs)]
    return spark.createDataFrame(rows or [(0, 1.0, 0.0)], "iid long, lo double, hi double")


def test_banded_equals_nested_loop(spark):
    pts = _points(spark, [0.5, 3.0, 7.25, 10.0, 99.9, -4.5])
    ivs = _intervals(spark, [(0, 5), (5, 10), (-10, -1), (98, 120), (7, 7.5)])
    plain = pts.crossJoin(ivs).filter((F.col("v") >= F.col("lo")) & (F.col("v") <= F.col("hi")))
    banded = banded_range_join(pts, ivs, "v", "lo", "hi", band_width=2.5)
    cols = ["pid", "iid"]
    assert _multiset(banded, cols) == _multiset(plain, cols)


def test_banded_plans_hash_join_not_nested_loop(spark):
    pts = _points(spark, range(50))
    ivs = _intervals(spark, [(i, i + 3) for i in range(30)])
    plan = formatted_plan(banded_range_join(pts, ivs, "v", "lo", "hi", band_width=4.0))
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_banded_rejects_bad_args(spark):
    df = spark.range(1).selectExpr("id AS v", "id AS lo", "id AS hi")
    with pytest.raises(ValueError):
        banded_range_join(df, df, "v", "lo", "hi", band_width=0)
    with pytest.raises(ValueError):
        banded_range_join(df, df, "v", "lo", "hi", band_width=1, how="left")


@given(
    vals=st.lists(st.integers(-50, 50), min_size=0, max_size=40),
    pairs=st.lists(
        st.tuples(st.integers(-50, 50), st.integers(-50, 50)), min_size=0, max_size=20
    ),
    width=st.sampled_from([1.0, 3.0, 7.5, 100.0]),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_banded_matches_nested_loop_random(spark, vals, pairs, width):
    pts = _points(spark, vals)
    ivs = _intervals(spark, pairs)
    plain = pts.crossJoin(ivs).filter((F.col("v") >= F.col("lo")) & (F.col("v") <= F.col("hi")))
    banded = banded_range_join(pts, ivs, "v", "lo", "hi", band_width=width)
    cols = ["pid", "iid"]
    assert _multiset(banded, cols) == _multiset(plain, cols)

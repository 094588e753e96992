"""salted_join must be row-multiset-equivalent to the plain join it
replaces — on skewed data (the case it exists for) and on arbitrary
random layouts (hypothesis), for both inner and left joins."""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from pyspark_streaming_base_spark.operators.salting import salted_join


def _multiset(df):
    return Counter(tuple(r) for r in df.collect())


def test_salted_inner_join_on_skewed_key(spark):
    # 90% of left rows share one hot key — the motivating skew shape.
    left = spark.range(2000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 10 != 0, 7).otherwise(F.col("id") % 50).alias("k"),
    )
    right = spark.range(50).select(
        F.col("id").alias("k"), (F.col("id") * 100).alias("payload")
    )
    plain = left.join(right, ["k"], "inner").select("k", "row_id", "payload")
    salted = salted_join(
        left, right, on=["k"], salt_on="row_id", how="inner", salt_buckets=8
    ).select("k", "row_id", "payload")
    assert _multiset(salted) == _multiset(plain)


def test_salted_left_join_keeps_unmatched(spark):
    left = spark.range(100).select(
        F.col("id").alias("row_id"), (F.col("id") % 60).alias("k")
    )
    right = spark.range(30).select(  # keys 30..59 unmatched
        F.col("id").alias("k"), F.lit("x").alias("payload")
    )
    plain = left.join(right, ["k"], "left").select("k", "row_id", "payload")
    salted = salted_join(
        left, right, on=["k"], salt_on="row_id", how="left", salt_buckets=4
    ).select("k", "row_id", "payload")
    assert _multiset(salted) == _multiset(plain)


def test_null_salt_on_spreads_and_preserves_rows(spark):
    # salt_on NULL must not collapse to one bucket, and must not lose rows
    left = spark.createDataFrame(
        [(None, 1)] * 200 + [(i, 1) for i in range(20)], "row_id long, k long"
    ).repartition(8)
    right = spark.createDataFrame([(1, 99)], "k long, payload long")
    out = salted_join(
        left, right, on=["k"], salt_on="row_id", how="inner", salt_buckets=4
    )
    assert out.count() == 220
    salts = left.selectExpr(
        "CAST(pmod(monotonically_increasing_id(), 4) AS INT) AS s"
    ).where("row_id IS NULL")
    assert salts.select("s").distinct().count() > 1


def test_salted_join_rejects_outer(spark):
    df = spark.range(1)
    with pytest.raises(ValueError):
        salted_join(df, df, on=["id"], salt_on="id", how="full")


@given(
    lefts=st.lists(st.integers(0, 5), min_size=0, max_size=50),
    rights=st.lists(st.integers(0, 5), min_size=0, max_size=20),
    how=st.sampled_from(["inner", "left"]),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
def test_salted_join_matches_plain_join(spark, lefts, rights, how):
    left = spark.createDataFrame(
        [(i, k) for i, k in enumerate(lefts)] or [(0, -1)], "row_id long, k long"
    )
    right = spark.createDataFrame(
        [(k, i) for i, k in enumerate(rights)] or [(-2, 0)], "k long, payload long"
    )
    plain = left.join(right, ["k"], how).select("k", "row_id", "payload")
    salted = salted_join(
        left, right, on=["k"], salt_on="row_id", how=how, salt_buckets=3
    ).select("k", "row_id", "payload")
    assert _multiset(salted) == _multiset(plain)

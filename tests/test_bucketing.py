"""Bucketed co-located join — the SCALE.md deployment claim, proven.

SCALE.md's 100 TB checklist says "bucket the fact tables on their
dominant join key at write time to delete the co-location shuffle
entirely". This test actually does it: writes two tables bucketed by the
join key into a temp warehouse, joins them, and asserts the physical
plan contains NO shuffle on either side of the join — the sort-merge
join reads pre-bucketed files directly.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pyspark_streaming_base_spark.plans import formatted_plan, shuffle_count
from pyspark_streaming_base_spark.queries._tables import t

from tests.conftest import SF_SMALL


@pytest.fixture()
def warehouse(spark, tmp_path):
    # bucket files land in the session warehouse; saveAsTable is required
    # (bucketing metadata lives in the catalog, not the parquet footer).
    # Disable auto-broadcast so the sf0.001 fixture exercises the same
    # sort-merge path a 100 TB fact⋈fact join takes — broadcast would
    # trivially avoid the shuffle and prove nothing about bucketing.
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    names = ["b_lineitem", "b_orders"]
    yield names
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
    for n in names:
        spark.sql(f"DROP TABLE IF EXISTS {n}")


def test_bucketed_join_has_no_shuffle(spark, warehouse):
    n_buckets = 4
    li = t(spark, SF_SMALL, "lineitem").select("l_orderkey", "l_quantity")
    od = t(spark, SF_SMALL, "orders").select("o_orderkey", "o_totalprice")
    (
        li.write.mode("overwrite")
        .bucketBy(n_buckets, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("b_lineitem")
    )
    (
        od.write.mode("overwrite")
        .bucketBy(n_buckets, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("b_orders")
    )

    joined = (
        spark.table("b_lineitem")
        .join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderkey")
        .agg(F.sum("l_quantity").alias("qty"), F.max("o_totalprice").alias("price"))
    )

    plan = formatted_plan(joined)
    assert "SortMergeJoin" in plan, plan
    # bucketed-on-the-join-key tables satisfy the join's distribution
    # requirement from storage: the ONLY exchange allowed is the final
    # aggregation's — and since the agg key IS the bucket key, even that
    # one is satisfied. Zero exchanges end to end.
    assert shuffle_count(joined) == 0, plan

    # and the answer matches the unbucketed formulation
    plain = (
        t(spark, SF_SMALL, "lineitem")
        .join(
            t(spark, SF_SMALL, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderkey")
        .agg(F.sum("l_quantity").alias("qty"), F.max("o_totalprice").alias("price"))
    )
    got = {r.o_orderkey: (r.qty, r.price) for r in joined.collect()}
    expect = {r.o_orderkey: (r.qty, r.price) for r in plain.collect()}
    assert got == expect

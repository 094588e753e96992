"""Partition pruning evidence: static pruning and dynamic partition
pruning (DPP) against a hive-partitioned layout.

The driver fixtures are single-file unpartitioned parquet, so these
tests build a partitioned copy (orders by order year) in tmp and assert
the two behaviors that matter most at 100 TB:

* a literal predicate on the partition column prunes at PLAN time
  (PartitionFilters, not a post-scan filter);
* a selective dim-side filter prunes the fact scan at RUN time via DPP
  (``dynamicpruning`` subquery in the scan's partition filters).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyspark_streaming_base_spark.queries._tables import t

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def part_orders(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("part") / "orders_by_year")
    (
        t(spark, SF_SMALL, "orders")
        .withColumn("o_year", F.year("o_orderdate"))
        .write.partitionBy("o_year")
        .parquet(root)
    )
    return root


def test_static_partition_pruning(spark, part_orders):
    df = spark.read.parquet(part_orders).filter(F.col("o_year") == 1996)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "o_year" in plan.split("PartitionFilters")[1][:200]
    # correctness: only that year's rows
    years = {r["o_year"] for r in df.select("o_year").distinct().collect()}
    assert years == {1996}


def test_constraint_propagation_makes_literal_dim_filters_static(spark, part_orders):
    """A literal filter on the join key propagates through the equi-join
    and prunes the fact scan at PLAN time — no DPP subquery needed."""
    fact = spark.read.parquet(part_orders)
    dim = (
        t(spark, SF_SMALL, "orders")
        .withColumn("o_year", F.year("o_orderdate"))
        .filter(F.col("o_year") == 1997)
        .select(F.col("o_year").alias("d_year"))
        .distinct()
    )
    joined = fact.join(dim, fact["o_year"] == dim["d_year"])
    plan = joined._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters")[1][:120]
    assert "1997" in pf  # static prune, inferred from the dim's filter
    years = {r["o_year"] for r in joined.select("o_year").distinct().collect()}
    assert years == {1997}


def test_dynamic_partition_pruning(spark, part_orders):
    """When the partition set is only computable at RUN time (dim filtered
    on a non-join column), the fact scan must carry a DPP subquery."""
    fact = spark.read.parquet(part_orders)
    dim = (
        t(spark, SF_SMALL, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.year("o_orderdate").alias("d_year"))
        .distinct()
        .filter(F.col("d_year") % 3 == 0)
    )
    joined = fact.join(F.broadcast(dim), fact["o_year"] == dim["d_year"])
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()
    expect_years = {r["d_year"] for r in dim.collect()}
    got_years = {r["o_year"] for r in joined.select("o_year").distinct().collect()}
    assert got_years == expect_years

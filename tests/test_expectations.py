"""Unit tests for operators/expectations.py (DQ pass/quarantine split)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyspark_streaming_base_spark.operators.expectations import (
    VIOLATIONS_COL,
    apply_expectations,
    split,
    violation_counts,
)


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(
        [(1, 10.0), (2, -3.0), (3, None), (4, 200.0)],
        ["id", "amount"],
    )


def rules():
    return {
        "amount_positive": F.col("amount") > 0,
        "amount_bounded": F.col("amount") < 100,
        "id_known": F.col("id").isNotNull(),
    }


def test_split_partitions_rows(spark, df):
    tagged = apply_expectations(df, rules())
    ok, bad = split(tagged)
    assert ok.count() + bad.count() == df.count()
    assert set(ok.columns) == set(df.columns)  # tag column dropped
    assert {r["id"] for r in ok.collect()} == {1}
    got = {r["id"]: sorted(r[VIOLATIONS_COL]) for r in bad.collect()}
    # NULL amount fails BOTH amount rules (unknown is not acceptable)
    assert got == {
        2: ["amount_positive"],
        3: ["amount_bounded", "amount_positive"],
        4: ["amount_bounded"],
    }


def test_violation_counts(spark, df):
    tagged = apply_expectations(df, rules())
    counts = {r["rule"]: r["n_violations"] for r in violation_counts(tagged).collect()}
    # zero-violation rules are absent from the metrics
    assert counts == {"amount_positive": 2, "amount_bounded": 2}


def test_apply_expectations_errors(spark, df):
    with pytest.raises(ValueError):
        apply_expectations(df, {})
    tagged = apply_expectations(df, rules())
    with pytest.raises(ValueError):
        apply_expectations(tagged, rules())


def test_streaming_append_legal(spark, df, tmp_path):
    """Tagging is a pure projection, so it is append-legal on a stream."""
    src = str(tmp_path / "src")
    df.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    tagged = apply_expectations(stream, rules())
    ok, bad = split(tagged)
    q = (
        ok.writeStream.format("memory")
        .queryName("dq_ok_sink")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    assert spark.sql("SELECT count(*) n FROM dq_ok_sink").collect()[0]["n"] == 1

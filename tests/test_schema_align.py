"""Schema reconciliation: safe-cast whitelist, missing/extra policy,
heterogeneous union."""

from __future__ import annotations

import pytest
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from pyspark_streaming_base_spark.operators.schema_align import (
    align_schema,
    diff_schema,
    union_aligned,
)

TARGET = StructType(
    [
        StructField("id", LongType()),
        StructField("amount", DoubleType()),
        StructField("note", StringType()),
    ]
)


def test_align_widens_fills_and_drops(spark):
    df = spark.createDataFrame(
        [(1, 10, "x", "junk")],
        StructType(
            [
                StructField("id", IntegerType()),
                StructField("amount", IntegerType()),
                StructField("note", StringType()),
                StructField("extra", StringType()),
            ]
        ),
    )
    out = align_schema(df, TARGET)
    assert out.schema == TARGET
    row = out.collect()[0]
    assert (row["id"], row["amount"], row["note"]) == (1, 10.0, "x")


def test_align_missing_becomes_null_or_errors(spark):
    df = spark.createDataFrame([(1,)], StructType([StructField("id", LongType())]))
    out = align_schema(df, TARGET)
    assert out.collect()[0]["amount"] is None
    with pytest.raises(ValueError, match="missing column"):
        align_schema(df, TARGET, on_missing="error")


def test_align_extra_error_policy(spark):
    df = spark.createDataFrame(
        [(1, 1.0, "x", "junk")], "id BIGINT, amount DOUBLE, note STRING, extra STRING"
    )
    with pytest.raises(ValueError, match="unexpected columns"):
        align_schema(df, TARGET, on_extra="error")


def test_align_refuses_narrowing_casts(spark):
    # string → long would parse-or-null: lossy, must raise
    df = spark.createDataFrame(
        [("1", 1.0, "x")], "id STRING, amount DOUBLE, note STRING"
    )
    with pytest.raises(ValueError, match="unsafe cast"):
        align_schema(df, TARGET)
    # long → double loses precision above 2^53: must raise
    tgt = StructType([StructField("id", DoubleType())])
    df2 = spark.createDataFrame([(1,)], "id BIGINT")
    with pytest.raises(ValueError, match="unsafe cast"):
        align_schema(df2, tgt)
    # int → double is exact: allowed
    df3 = spark.createDataFrame([(1,)], "id INT")
    assert align_schema(df3, tgt).collect()[0]["id"] == 1.0


def test_union_aligned_heterogeneous(spark):
    a = spark.createDataFrame([(1, 5, "a")], "id INT, amount INT, note STRING")
    b = spark.createDataFrame([(2, 7.5)], "id BIGINT, amount DOUBLE")
    out = union_aligned(TARGET, a, b)
    assert out.schema == TARGET
    got = {r["id"]: (r["amount"], r["note"]) for r in out.collect()}
    assert got == {1: (5.0, "a"), 2: (7.5, None)}


def test_diff_schema_report(spark):
    df = spark.createDataFrame([(1, "x", "y")], "id INT, note STRING, extra STRING")
    missing, extra, retyped = diff_schema(df, TARGET)
    assert missing == ["amount"]
    assert extra == ["extra"]
    assert retyped == ["id"]


def test_align_property_random_type_pairs(spark):
    """Property: for every (src, dst) primitive-type pair, align_schema
    either performs a value-preserving cast (safe pairs) or raises —
    never a silent lossy conversion."""
    import itertools

    from pyspark_streaming_base_spark.operators.schema_align import _is_safe_cast
    from pyspark.sql.types import (
        ByteType,
        DateType,
        FloatType,
        ShortType,
        StructField,
        TimestampType,
    )

    types = [
        ByteType(),
        ShortType(),
        IntegerType(),
        LongType(),
        FloatType(),
        DoubleType(),
        StringType(),
    ]
    probe = 37  # representable exactly in every numeric type above
    for src_t, dst_t in itertools.product(types, repeat=2):
        if isinstance(src_t, StringType) and not isinstance(dst_t, StringType):
            continue  # string source only aligns to string
        if isinstance(src_t, StringType):
            val = "37"
        elif isinstance(src_t, (FloatType, DoubleType)):
            val = float(probe)
        else:
            val = probe
        df = spark.createDataFrame(
            [(val,)], StructType([StructField("x", src_t)])
        )
        tgt = StructType([StructField("x", dst_t)])
        if _is_safe_cast(src_t, dst_t):
            out = align_schema(df, tgt).collect()[0]["x"]
            assert str(out) in ("37", "37.0"), (src_t, dst_t, out)
        else:
            with pytest.raises(ValueError, match="unsafe cast"):
                align_schema(df, tgt)
    # sanity: the matrix contains both safe and unsafe pairs
    assert _is_safe_cast(IntegerType(), DoubleType())
    assert not _is_safe_cast(LongType(), DoubleType())
    assert _is_safe_cast(DateType(), TimestampType())

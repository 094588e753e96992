"""Overflow-regime proof for `_ecdf.pooled_cumulative_counts`'
DECIMAL(38,0) b-channel (q187's cumulative-revenue path at the
SCALE.md 100 TB design point, where the 10⁶-scaled corpus revenue
total is ~10²² > 2⁶³).

Synthetic per-value `cb` weights sit near 2⁶³ so that the very first
prefix-sum step already exceeds int64; the decimal channel must carry
the exact total while the int64 count channel (`ca`/`cum_a`) stays
untouched.
"""

from decimal import Decimal

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pyspark_streaming_base_spark.queries._ecdf import (
    pooled_cumulative_counts,
)

# Eight per-value weights near int64 max (2**63 - 1 = 9223372036854775807):
# any two of them summed overflow int64; all eight sum to ~5.9e19.
_NEAR_MAX = [9223372036854775807 - k for k in range(8)]


@pytest.fixture(scope="module")
def frame(spark):
    schema = T.StructType(
        [
            T.StructField("value", T.LongType(), False),
            T.StructField("ca", T.LongType(), False),
            T.StructField("cb", T.DecimalType(38, 0), False),
        ]
    )
    rows = [(i * 10, 1, Decimal(w)) for i, w in enumerate(_NEAR_MAX)]
    return spark.createDataFrame(rows, schema)


def test_decimal_b_channel_survives_past_int64(frame):
    out = (
        pooled_cumulative_counts(frame, b_type="decimal(38,0)")
        .orderBy("value")
        .collect()
    )
    assert [r["cum_a"] for r in out] == list(range(1, 9))
    expected_cum = []
    acc = 0
    for w in _NEAR_MAX:
        acc += w
        expected_cum.append(acc)
    got_cum = [int(r["cum_b"]) for r in out]
    assert got_cum == expected_cum
    assert got_cum[-1] > 2**63 - 1  # the regime int64 cannot reach
    assert all(int(r["nb"]) == expected_cum[-1] for r in out)
    assert all(r["na"] == 8 for r in out)


def test_decimal_channel_types(frame):
    out = pooled_cumulative_counts(frame, b_type="decimal(38,0)")
    types = dict(out.dtypes)
    assert types["cum_b"] == "decimal(38,0)"
    assert types["nb"] == "decimal(38,0)"
    assert types["cum_a"] == "bigint"
    assert types["na"] == "bigint"


def test_int64_channel_overflows_loudly_under_ansi(spark, frame):
    """The pre-r12 int64 form fails LOUD (not wrapped) in ANSI mode on
    the same weights — documents why the decimal channel exists."""
    bi = frame.withColumn("cb", F.col("cb").cast("bigint"))
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        with pytest.raises(Exception, match="(?i)overflow|out of range"):
            pooled_cumulative_counts(bi).agg(F.max("cum_b")).collect()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)

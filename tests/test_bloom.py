"""Bloom filter operator (`operators/bloom.py`): no false negatives ever,
false-positive rate within the geometry bound, and the q139 bloom-prefiltered
decontamination EQUALS the exact unfiltered semi join (bloom is a pure
prefilter — verification removes its false positives)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from pyspark_streaming_base_spark.operators.bloom import (
    bloom_maybe_contains,
    build_bloom,
)

from tests.conftest import SF_SMALL

M_BITS = 1 << 18
K = 3


def test_build_bloom_rejects_bad_geometry(spark):
    df = spark.range(1).select(F.col("id").cast("string").alias("k"))
    with pytest.raises(ValueError):
        build_bloom(df, "k", m_bits=100)  # not a multiple of 64
    with pytest.raises(ValueError):
        build_bloom(df, "k", m_bits=-64)
    with pytest.raises(ValueError):
        build_bloom(df, "k", k=0)
    with pytest.raises(ValueError):
        build_bloom(df, "k", k=17)


def test_bloom_word_table_is_bounded(spark):
    members = spark.range(10_000).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k")
    )
    bloom = build_bloom(members, "k", m_bits=M_BITS, k=K)
    assert bloom.count() <= M_BITS // 64  # ≤ 4096 rows no matter the input


def test_bloom_no_false_negatives(spark):
    members = spark.range(5_000).select(
        F.concat(F.lit("member-"), F.col("id")).alias("k")
    )
    bloom = build_bloom(members, "k", m_bits=M_BITS, k=K)
    passed = bloom_maybe_contains(members, "k", bloom, m_bits=M_BITS, k=K)
    # EVERY member must pass — the property exactness downstream relies on
    assert passed.count() == 5_000


def test_bloom_false_positive_rate_within_bound(spark):
    n = 5_000
    members = spark.range(n).select(
        F.concat(F.lit("member-"), F.col("id")).alias("k")
    )
    others = spark.range(20_000).select(
        F.concat(F.lit("other-"), F.col("id")).alias("k")
    )
    bloom = build_bloom(members, "k", m_bits=M_BITS, k=K)
    fp = bloom_maybe_contains(others, "k", bloom, m_bits=M_BITS, k=K).count()
    # theoretical FP = (1 - e^(-k n / m))^k ≈ 0.018% here; allow 4x slack
    # for hash clustering before calling the hash mixing broken
    expected = (1.0 - math.exp(-K * n / M_BITS)) ** K
    assert fp / 20_000 <= max(4 * expected, 0.005), (fp, expected)


def test_q139_prefilter_equals_exact_semi_join(spark):
    """The bloom prefilter must not change the decontamination answer:
    q139's registered plan == the same pipeline with the bloom step
    removed (plain q87-style semi join)."""
    from pyspark_streaming_base_spark.functions.textops import word_shingles
    from pyspark_streaming_base_spark.queries import load_all
    from pyspark_streaming_base_spark.queries._tables import t
    from pyspark_streaming_base_spark.queries.text import (
        _SPLIT_TEST_HEX,
        _SPLIT_VAL_HEX,
    )

    R = load_all()
    with_bloom = R["q139_bloom_decontamination"].fn(spark, SF_SMALL)

    d = t(spark, SF_SMALL, "documents").select(
        "doc_id",
        "lang",
        word_shingles(F.col("text")).alias("shingles"),
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4).alias("hk"),
    )
    ev = (
        d.where(F.col("hk") < _SPLIT_VAL_HEX)
        .select(F.explode("shingles").alias("sh"))
        .distinct()
    )
    exact = (
        d.where(F.col("hk") >= _SPLIT_TEST_HEX)
        .select("doc_id", "lang", F.explode("shingles").alias("sh"))
        .join(ev, "sh", "left_semi")
        .groupBy("doc_id", "lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_hit_shingles"))
    )
    got = sorted(map(tuple, with_bloom.collect()))
    want = sorted(map(tuple, exact.collect()))
    assert got == want


def test_bloom_no_false_negatives_property(spark):
    """Property sweep: for ANY key set and geometry, every member passes.
    (Hypothesis over Spark jobs is slow — a deterministic grid over
    mixed-type keys and all k values stands in; the guarantee is
    structural, not statistical.)"""
    rows = [(f"k{i}",) for i in range(200)] + [
        ("",),
        (" ",),
        ("with space",),
        ("ünïcode-ключ-鍵",),
        ("a" * 500,),
    ]
    df = spark.createDataFrame(rows, ["k"])
    n = df.count()
    for m_bits in (64, 4096, 1 << 18):
        for k in (1, 3, 8):
            bloom = build_bloom(df, "k", m_bits=m_bits, k=k)
            assert (
                bloom_maybe_contains(df, "k", bloom, m_bits=m_bits, k=k).count()
                == n
            ), (m_bits, k)


# ---------------------------------------------------------------------------
# Persisted index: geometry round-trips with the word table
# ---------------------------------------------------------------------------


def test_bloom_index_geometry_roundtrip(spark, tmp_path):
    from pyspark_streaming_base_spark.operators.bloom import (
        build_bloom_index,
        load_bloom_geometry,
        query_bloom_index,
    )

    members = spark.range(2_000).select(
        F.concat(F.lit("member-"), F.col("id")).alias("k")
    )
    path = str(tmp_path / "bloom_idx")
    build_bloom_index(members, "k", path, m_bits=1 << 16, k=4)
    assert load_bloom_geometry(spark, path) == (1 << 16, 4)
    # probe uses the persisted geometry -> all members pass (no false negs)
    assert query_bloom_index(members, "k", path).count() == 2_000
    # explicit geometry is accepted only when it matches the sidecar
    assert query_bloom_index(members, "k", path, m_bits=1 << 16, k=4).count() == 2_000


def test_bloom_index_geometry_mismatch_raises(spark, tmp_path):
    from pyspark_streaming_base_spark.operators.bloom import (
        build_bloom_index,
        query_bloom_index,
    )

    members = spark.range(100).select(
        F.concat(F.lit("m-"), F.col("id")).alias("k")
    )
    path = str(tmp_path / "bloom_idx")
    build_bloom_index(members, "k", path, m_bits=1 << 16, k=4)
    with pytest.raises(ValueError, match="m_bits"):
        query_bloom_index(members, "k", path, m_bits=1 << 18)
    with pytest.raises(ValueError, match="k="):
        query_bloom_index(members, "k", path, k=3)


def test_bloom_index_append_unions_filters(spark, tmp_path):
    """Appending a batch == rebuilding over the union: identical word
    table (Bloom union is bitwise OR), and the appended keys gain the
    no-false-negative guarantee under the ORIGINAL geometry."""
    from pyspark_streaming_base_spark.operators.bloom import (
        append_bloom_index,
        build_bloom,
        build_bloom_index,
        query_bloom_index,
    )

    a = spark.range(1_000).select(F.concat(F.lit("a-"), F.col("id")).alias("k"))
    b = spark.range(1_000).select(F.concat(F.lit("b-"), F.col("id")).alias("k"))
    path = str(tmp_path / "bloom_idx")
    build_bloom_index(a, "k", path, m_bits=1 << 16, k=3)
    append_bloom_index(b, "k", path)
    assert query_bloom_index(a, "k", path).count() == 1_000
    assert query_bloom_index(b, "k", path).count() == 1_000
    # word-for-word identical to a from-scratch build over a ∪ b
    rebuilt = build_bloom(a.unionByName(b), "k", m_bits=1 << 16, k=3)
    appended = spark.read.parquet(f"{path}/words")
    assert rebuilt.exceptAll(appended).count() == 0
    assert appended.exceptAll(rebuilt).count() == 0

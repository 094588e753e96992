"""Persisted MinHash index: probe-vs-recompute equivalence and the
incremental-batch property (signatures computed for the batch only)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_streaming_base_spark.operators.minhash import (
    build_minhash_index,
    minhash_bands,
    query_minhash_index,
)
from pyspark_streaming_base_spark.queries._tables import t

from tests.conftest import SF_SMALL


def test_index_probe_equals_recompute(spark, tmp_path):
    docs = t(spark, SF_SMALL, "documents").select("doc_id", "text")
    path = str(tmp_path / "mh_index")
    build_minhash_index(docs, path)

    batch = docs.filter(F.col("doc_id") < 100)
    got = {
        (r["query_id"], r["index_id"])
        for r in query_minhash_index(spark, path, batch).collect()
    }

    sig = minhash_bands(docs)
    probe_sig = minhash_bands(batch).select(
        F.col("doc_id").alias("query_id"), "band_idx", "band_hash"
    )
    want = {
        (r["query_id"], r["index_id"])
        for r in probe_sig.join(
            sig.select(F.col("doc_id").alias("index_id"), "band_idx", "band_hash"),
            ["band_idx", "band_hash"],
        )
        .filter(F.col("query_id") != F.col("index_id"))
        .select("query_id", "index_id")
        .distinct()
        .collect()
    }
    assert got == want
    assert got  # the corpus has near-dups below id 100 → non-empty

    # every q41-style same-band pair within the batch appears both ways
    sym = {(b, a) for a, b in got if b < 100}
    assert sym <= got


def test_index_is_batch_proportional(spark, tmp_path):
    """The probe plan reads the index parquet; it must NOT re-shingle the
    corpus (only the 3-row batch side computes signatures)."""
    docs = t(spark, SF_SMALL, "documents").select("doc_id", "text")
    path = str(tmp_path / "mh_index")
    build_minhash_index(docs, path)
    batch = docs.filter(F.col("doc_id") < 3)
    from pyspark_streaming_base_spark.plans import formatted_plan

    plan = formatted_plan(query_minhash_index(spark, path, batch))
    # two parquet scans total (formatted explain names each scan twice —
    # tree line + detail header): the 3-row batch (documents.parquet) and
    # the materialized index — the corpus text is never re-read/re-shingled
    assert plan.count("Scan parquet") == 4
    assert plan.count("documents.parquet") == 1

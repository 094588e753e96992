"""Quantizer drift monitor (``operators/drift.py``) — the measured
"retrain + rebuild when the distribution drifts" trigger every frozen-
quantizer index documents. The oracle-checked exact twin is q131
(``queries/similarity.py``); these tests pin the operator's behavior on
the persisted-index path."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pyspark_streaming_base_spark.functions.vectorops import dvec
from pyspark_streaming_base_spark.operators.drift import (
    drift_report,
    merge_drift_baseline,
    write_drift_baseline,
)
from pyspark_streaming_base_spark.operators.semdedup import build_semdedup_index
from pyspark_streaming_base_spark.queries.pipeline import kmeans_centroids

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def indexed(spark, tmp_path_factory):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", dvec("embedding").alias("v")
    )
    path = str(tmp_path_factory.mktemp("drift") / "idx")
    cent = kmeans_centroids(spark, SF).localCheckpoint(eager=True)
    build_semdedup_index(emb, path, cent)
    write_drift_baseline(spark, path, emb)
    return path, emb


def test_same_distribution_not_drifted(spark, indexed):
    """An unshifted subsample quantizes like the baseline: error ratio
    ~1, occupancy close, no drift flag."""
    path, emb = indexed
    r = drift_report(spark, path, emb.filter(F.col("vec_id") % 7 == 0)).collect()[0]
    assert 0.8 <= r.error_ratio <= 1.25
    assert r.occupancy_l1 < 0.3
    assert not r.drifted
    assert r.n_base == emb.count()


def test_shifted_distribution_drifts_on_error_ratio(spark, indexed):
    """An affine-shifted batch lands far from every frozen centroid —
    the error ratio crosses the threshold even though the batch is the
    whole corpus (occupancy alone would miss a uniform inflation)."""
    path, emb = indexed
    shifted = emb.select(
        "vec_id", F.transform("v", lambda x: x * 3.0 + 1.0).alias("v")
    )
    r = drift_report(spark, path, shifted).collect()[0]
    assert r.error_ratio > 2.0
    assert r.drifted


def test_collapsed_distribution_drifts_on_occupancy(spark, indexed):
    """A batch that piles into one cell's region keeps a sane error
    ratio but shifts occupancy mass — the second signal catches what
    the first misses. Constructed by replicating the single vector
    closest to one centroid."""
    path, emb = indexed
    one = (
        spark.read.parquet(f"{path}/assignments")
        .orderBy("vec_id")
        .limit(1)
        .join(emb, "vec_id")
        .select("v")
    )
    collapsed = one.crossJoin(
        spark.range(200).select(F.col("id").alias("vec_id"))
    ).select((F.col("vec_id") + 1_000_000).alias("vec_id"), "v")
    r = drift_report(spark, path, collapsed).collect()[0]
    assert r.occupancy_l1 > 0.5
    assert r.drifted


def test_merge_baseline_tracks_accepted_batches(spark, indexed, tmp_path):
    """merge_drift_baseline folds an accepted batch into the per-cell
    partials: counts grow by the batch and a re-probe of the SAME batch
    is (still) not drifted."""
    import shutil

    path, emb = indexed
    mine = str(tmp_path / "idx")
    shutil.copytree(path, mine)
    batch = emb.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 500_000).alias("vec_id"), "v"
    )
    n0 = drift_report(spark, mine, batch).collect()[0].n_base
    merge_drift_baseline(spark, mine, batch)
    r = drift_report(spark, mine, batch).collect()[0]
    assert r.n_base == n0 + batch.count()
    assert not r.drifted


def test_thresholds_validated(spark, indexed):
    path, emb = indexed
    for er, occ in ((0.0, 0.5), (2.0, 0.0), (2.0, 1.5)):
        with pytest.raises(ValueError, match="threshold"):
            drift_report(spark, path, emb, er, occ)


def test_monitor_serves_ivf_and_pq_index_conventions(spark, tmp_path):
    """One monitor for every vector index family: build_ivf_index and
    build_pq_index write (cent_id, cvec) centroids; the monitor
    normalizes the convention and the same baseline/report/merge cycle
    runs against their paths."""
    from pyspark_streaming_base_spark.operators.ivf import build_ivf_index

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", dvec("embedding").alias("vec")
    )
    path = str(tmp_path / "ivfidx")
    build_ivf_index(emb, path, k=8)
    as_v = emb.select("vec_id", F.col("vec").alias("v"))
    write_drift_baseline(spark, path, as_v)
    r = drift_report(spark, path, as_v.filter(F.col("vec_id") % 7 == 0)).collect()[0]
    assert not r.drifted and 0.8 <= r.error_ratio <= 1.25
    shifted = as_v.select("vec_id", F.transform("v", lambda x: x * 3.0 + 1.0).alias("v"))
    assert drift_report(spark, path, shifted).collect()[0].drifted


def test_empty_batch_reports_not_drifted(spark, indexed):
    """Zero new vectors carry no evidence of drift: counts are 0, the
    undefined means stay null, and the flag is pinned False (a null
    would read as 'unknown' downstream)."""
    path, emb = indexed
    r = drift_report(spark, path, emb.filter(F.lit(False))).collect()[0]
    assert r.n_batch == 0
    assert r.batch_mean_d2 is None and r.error_ratio is None
    assert r.drifted is False

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


def test_full_index_lifecycle_drift_triggers_rebuild(spark, tmp_path):
    """The complete frozen-quantizer lifecycle the operators document:
    build + baseline → in-distribution batch appends cleanly (merge
    keeps the baseline honest) → a drifted batch TRIPS the monitor →
    retrain on the drifted corpus + rebuild → the monitor is clean again
    for the new distribution. This is the runbook the 'retrain + rebuild
    when the distribution drifts' contract implies, executed end to end."""
    from pyspark_streaming_base_spark.operators.semdedup import (
        append_semdedup_index,
        build_semdedup_index,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", dvec("embedding").alias("v")
    )
    path = str(tmp_path / "idx")
    cent = kmeans_centroids(spark, SF).localCheckpoint(eager=True)
    build_semdedup_index(emb, path, cent)
    write_drift_baseline(spark, path, emb)

    # day 1: in-distribution batch — passes, appends, folds into baseline
    day1 = emb.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 500_000).alias("vec_id"), "v"
    )
    assert not drift_report(spark, path, day1).collect()[0].drifted
    append_semdedup_index(spark, path, day1)
    merge_drift_baseline(spark, path, day1)

    # day 2: the embedding model changed — affine-shifted vectors trip
    # the monitor, so this batch is NOT appended under the old quantizer
    day2 = emb.select(
        (F.col("vec_id") + 600_000).alias("vec_id"),
        F.transform("v", lambda x: x * 3.0 + 1.0).alias("v"),
    )
    assert drift_report(spark, path, day2).collect()[0].drifted

    # an embedding-model change means the WHOLE corpus is re-embedded
    # (two embedding spaces cannot share one index): rebuild the index
    # and its baseline in the new space, quantizer retrained there
    def reembed(df):
        return df.select("vec_id", F.transform("v", lambda x: x * 3.0 + 1.0).alias("v"))

    current = reembed(emb.unionByName(day1)).localCheckpoint(eager=True)
    new_cent = current.orderBy("vec_id").limit(8).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    rebuilt = str(tmp_path / "idx2")
    build_semdedup_index(current, rebuilt, new_cent)
    write_drift_baseline(spark, rebuilt, current)

    # the monitor is clean again: tomorrow's batch from the NEW space
    # probes the rebuilt index without tripping either signal, and the
    # rebuilt index covers the re-embedded corpus exactly
    day3 = reembed(
        emb.filter(F.col("vec_id") % 7 == 0).select(
            (F.col("vec_id") + 700_000).alias("vec_id"), "v"
        )
    )
    assert not drift_report(spark, rebuilt, day3).collect()[0].drifted
    n = spark.read.parquet(f"{rebuilt}/assignments").count()
    assert n == current.count()


def test_remove_baseline_segment_equals_never_merged(spark, indexed, tmp_path):
    """The retraction contract: merge a batch, then remove its segment —
    the baseline table is BIT-IDENTICAL to never having merged (row
    deletion, no floating-point subtraction), and reports agree exactly."""
    import shutil

    from pyspark_streaming_base_spark.operators.drift import (
        drift_segments,
        remove_drift_baseline,
    )

    path, emb = indexed
    mine = str(tmp_path / "idx")
    shutil.copytree(path, mine)
    probe = emb.filter(F.col("vec_id") % 11 == 0)

    before_rows = sorted(
        map(tuple, spark.read.parquet(f"{mine}/drift_baseline").collect())
    )
    before_report = drift_report(spark, mine, probe).collect()[0]

    poisoned = emb.filter(F.col("vec_id") % 9 == 0).select(
        (F.col("vec_id") + 800_000).alias("vec_id"),
        F.transform("v", lambda x: x * 2.0).alias("v"),
    )
    seg = merge_drift_baseline(spark, mine, poisoned)
    assert seg in drift_segments(spark, mine)
    assert drift_report(spark, mine, probe).collect()[0].n_base > before_report.n_base

    remove_drift_baseline(spark, mine, seg)
    after_rows = sorted(
        map(tuple, spark.read.parquet(f"{mine}/drift_baseline").collect())
    )
    assert after_rows == before_rows
    assert drift_report(spark, mine, probe).collect()[0] == before_report

    with pytest.raises(ValueError, match="unknown baseline segment"):
        remove_drift_baseline(spark, mine, seg)  # already gone — loud


def test_merge_segments_are_unique_and_autonamed(spark, indexed, tmp_path):
    import shutil

    from pyspark_streaming_base_spark.operators.drift import drift_segments

    path, emb = indexed
    mine = str(tmp_path / "idx")
    shutil.copytree(path, mine)
    b = emb.filter(F.col("vec_id") % 13 == 0)
    s1 = merge_drift_baseline(spark, mine, b)
    s2 = merge_drift_baseline(spark, mine, b.select((F.col("vec_id") + 1).alias("vec_id"), "v"))
    assert s1 != s2
    assert set(drift_segments(spark, mine)) == {"build", s1, s2}
    with pytest.raises(ValueError, match="already exists"):
        merge_drift_baseline(spark, mine, b, segment="build")


def test_legacy_unsegmented_baseline_upgrades_on_merge(spark, indexed, tmp_path):
    """A pre-segment baseline (no segment column) reads as one 'build'
    segment, upgrades in place on the first merge (no mixed-schema
    directory), and reports identically before/after the upgrade."""
    import shutil

    from pyspark_streaming_base_spark.operators.drift import drift_segments

    path, emb = indexed
    mine = str(tmp_path / "idx")
    shutil.copytree(path, mine)
    # rewrite the baseline in the LEGACY format (segment column dropped)
    legacy = spark.read.parquet(f"{mine}/drift_baseline").select(
        "cid", "n", "sum_d2"
    )
    legacy.localCheckpoint(eager=True).write.mode("overwrite").parquet(
        f"{mine}/drift_baseline"
    )
    probe = emb.filter(F.col("vec_id") % 11 == 0)
    r_legacy = drift_report(spark, mine, probe).collect()[0]
    assert drift_segments(spark, mine) == ["build"]

    seg = merge_drift_baseline(spark, mine, probe)
    cols = set(spark.read.parquet(f"{mine}/drift_baseline").columns)
    assert cols == {"segment", "cid", "n", "sum_d2"}
    from pyspark_streaming_base_spark.operators.drift import remove_drift_baseline

    remove_drift_baseline(spark, mine, seg)
    assert drift_report(spark, mine, probe).collect()[0] == r_legacy

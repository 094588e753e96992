"""Scalar drift monitor (`operators/scalardrift.py`): clean batches from
the same distribution pass, shifted/scaled/collapsed batches flag, the
baseline merge is exact under frozen edges, and the monitor runs as a
per-micro-batch stream check."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pyspark_streaming_base_spark.operators.scalardrift import (
    merge_scalar_baseline,
    scalar_drift_report,
    write_scalar_baseline,
)
from pyspark_streaming_base_spark.queries._tables import t

from tests.conftest import SF_SMALL


@pytest.fixture()
def values(spark):
    return t(spark, SF_SMALL, "events").select("event_id", "value")


def _report(spark, path, batch):
    return scalar_drift_report(spark, path, batch, "value").collect()[0]


def test_same_distribution_batch_is_clean(spark, values, tmp_path):
    ref = values.filter(F.col("event_id") % 2 == 0)
    batch = values.filter(F.col("event_id") % 2 == 1)
    p = str(tmp_path / "b")
    write_scalar_baseline(spark, p, ref, "value")
    r = _report(spark, p, batch)
    assert not r.drifted, r


def test_shifted_batch_drifts(spark, values, tmp_path):
    p = str(tmp_path / "b")
    write_scalar_baseline(spark, p, values, "value")
    shifted = values.select("event_id", (F.col("value") + 10_000.0).alias("value"))
    r = _report(spark, p, shifted)
    # everything clamps into the top bucket — occupancy and chi2 both fire
    assert r.drifted and r.chi2_drift and r.tv_drift, r


def test_scaled_batch_drifts(spark, values, tmp_path):
    p = str(tmp_path / "b")
    write_scalar_baseline(spark, p, values, "value")
    scaled = values.select("event_id", (F.col("value") * 3.0).alias("value"))
    r = _report(spark, p, scaled)
    assert r.drifted, r


def test_collapsed_batch_drifts(spark, values, tmp_path):
    p = str(tmp_path / "b")
    write_scalar_baseline(spark, p, values, "value")
    collapsed = values.limit(500).select(
        "event_id", F.lit(1.0).alias("value")
    )
    r = _report(spark, p, collapsed)
    assert r.drifted and r.tv_drift, r


def test_merge_equals_rebuild_under_frozen_edges(spark, values, tmp_path):
    a = values.filter(F.col("event_id") % 2 == 0)
    b = values.filter(F.col("event_id") % 2 == 1)
    inc, full = str(tmp_path / "inc"), str(tmp_path / "full")
    write_scalar_baseline(spark, inc, a, "value")
    merge_scalar_baseline(spark, inc, b, "value")
    # rebuild over the union UNDER THE SAME EDGES: freeze a's edges by
    # building from a, then merging b — vs building from a then merging
    # b in one call; the equality that matters is counts additivity
    write_scalar_baseline(spark, full, a, "value")
    merge_scalar_baseline(spark, full, b, "value")
    got = sorted(map(tuple, spark.read.parquet(f"{inc}/counts").collect()))
    want = sorted(map(tuple, spark.read.parquet(f"{full}/counts").collect()))
    assert got == want
    # and the merged counts total the union row count
    n = sum(r[1] for r in got)
    assert n == values.count()


def test_streaming_per_batch_monitor(spark, values, tmp_path):
    """The deployment shape: a stream of batches, each checked against
    the frozen baseline in foreachBatch; a poisoned batch flags, clean
    ones don't."""
    p = str(tmp_path / "b")
    write_scalar_baseline(spark, p, values, "value")

    staging = str(tmp_path / "days")
    clean = values.filter(F.col("event_id") % 7 == 0)
    poison = values.limit(400).select(
        "event_id", (F.col("value") + 10_000.0).alias("value")
    )
    clean.coalesce(1).write.mode("append").parquet(staging)
    poison.coalesce(1).write.mode("append").parquet(staging)

    flags = []

    def check(batch_df, batch_id):
        if not batch_df.isEmpty():
            r = scalar_drift_report(spark, p, batch_df, "value").collect()[0]
            flags.append(bool(r.drifted))

    q = (
        spark.readStream.schema(clean.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(staging)
        .writeStream.foreachBatch(check)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert sorted(flags) == [False, True]


def test_validation(spark, values, tmp_path):
    with pytest.raises(ValueError):
        write_scalar_baseline(spark, str(tmp_path / "x"), values, "value", n_buckets=1)
    p = str(tmp_path / "b")
    write_scalar_baseline(spark, p, values, "value")
    with pytest.raises(ValueError):
        scalar_drift_report(spark, p, values, "value", tv_max=0.0)


def test_remove_scalar_segment_equals_never_merged(spark, values, tmp_path):
    """Retraction: merge a poisoned batch, remove its segment — counts
    table and report return bit-identical to never-merged (integer row
    deletion), and unknown segments raise."""
    import pytest
    from pyspark.sql import functions as F

    from pyspark_streaming_base_spark.operators.scalardrift import (
        remove_scalar_baseline,
        scalar_segments,
    )

    p = str(tmp_path / "b")
    write_scalar_baseline(spark, p, values, "value")
    probe = values.filter(F.col("event_id") % 7 == 0)
    before_rows = sorted(map(tuple, spark.read.parquet(f"{p}/counts").collect()))
    before = _report(spark, p, probe)

    poison = values.limit(300).select(
        "event_id", (F.col("value") + 10_000.0).alias("value")
    )
    seg = merge_scalar_baseline(spark, p, poison, "value")
    assert seg in scalar_segments(spark, p)

    remove_scalar_baseline(spark, p, seg)
    assert sorted(map(tuple, spark.read.parquet(f"{p}/counts").collect())) == before_rows
    assert _report(spark, p, probe) == before
    with pytest.raises(ValueError, match="unknown baseline segment"):
        remove_scalar_baseline(spark, p, seg)

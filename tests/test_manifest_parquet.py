"""Manifest-committed parquet connector: exactly-once visibility rules.

What must hold: readers see ALL committed rows and ONLY committed rows —
across batch appends, overwrites, streaming micro-batches, checkpoint
restarts, and crash debris (orphan files with no manifest entry)."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from pyspark_streaming_base_spark.sinks.manifest_parquet import (
    ManifestParquetDataSource,
    manifest_files,
)
from pyspark_streaming_base_spark.sources.synthetic import (
    SyntheticEventsDataSource,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(ManifestParquetDataSource)
    spark.dataSource.register(SyntheticEventsDataSource)


def _rows(df):
    return Counter(tuple(r) for r in df.collect())


def _events(spark, n):
    return spark.read.format("synthetic_events").option("rows", str(n)).load()


def test_batch_round_trip_and_append(spark, tmp_path):
    root = str(tmp_path / "tbl")
    a = _events(spark, 100)
    a.write.format("manifest_parquet").option("path", root).mode("append").save()
    back = spark.read.format("manifest_parquet").option("path", root).load()
    assert back.schema == a.schema
    assert _rows(back) == _rows(a)

    # append commits a second manifest; reader sees the union
    b = _events(spark, 150).where(F.col("event_id") >= 100)
    b.write.format("manifest_parquet").option("path", root).mode("append").save()
    back2 = spark.read.format("manifest_parquet").option("path", root).load()
    assert _rows(back2) == _rows(_events(spark, 150))


def test_overwrite_resets_visibility(spark, tmp_path):
    root = str(tmp_path / "tbl")
    _events(spark, 100).write.format("manifest_parquet").option("path", root).mode(
        "append"
    ).save()
    small = _events(spark, 10)
    small.write.format("manifest_parquet").option("path", root).mode(
        "overwrite"
    ).save()
    back = spark.read.format("manifest_parquet").option("path", root).load()
    assert _rows(back) == _rows(small)  # old files orphaned, not listed


def test_orphan_files_are_invisible(spark, tmp_path):
    root = str(tmp_path / "tbl")
    a = _events(spark, 50)
    a.write.format("manifest_parquet").option("path", root).mode("append").save()
    # simulate a crashed attempt: a data file exists but no manifest names it
    orphan = _events(spark, 999).where(F.col("event_id") >= 900)
    orphan.toPandas().to_parquet(str(tmp_path / "tbl" / "data" / "orphan.parquet"))
    back = spark.read.format("manifest_parquet").option("path", root).load()
    assert _rows(back) == _rows(a)
    assert not any(p.endswith("orphan.parquet") for p in manifest_files(root))


def test_streaming_write_exactly_once_across_restart(spark, tmp_path):
    """Stream synthetic → manifest_parquet, stop, resume from checkpoint:
    per-micro-batch manifests must cover every row exactly once."""
    root, ckpt = str(tmp_path / "tbl"), str(tmp_path / "ckpt")

    def run(max_rows):
        q = (
            spark.readStream.format("synthetic_events")
            .option("rows_per_batch", "40")
            .option("max_rows", str(max_rows))
            .load()
            .writeStream.format("manifest_parquet")
            .option("path", root)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run(120)
    assert _rows(
        spark.read.format("manifest_parquet").option("path", root).load()
    ) == _rows(_events(spark, 120))

    run(240)  # restart from checkpoint
    back = spark.read.format("manifest_parquet").option("path", root).load()
    assert _rows(back) == _rows(_events(spark, 240))
    # one manifest per micro-batch, none duplicated
    assert len(manifest_files(root)) == len(set(manifest_files(root)))


def test_read_without_manifest_raises(spark, tmp_path):
    with pytest.raises(Exception, match="no committed manifest"):
        spark.read.format("manifest_parquet").option(
            "path", str(tmp_path / "nope")
        ).load().collect()

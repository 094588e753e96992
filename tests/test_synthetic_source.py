"""Python DataSource connector (sources/synthetic.py): batch + stream
reads must be deterministic under any (partition-count, batch-size,
restart) slicing, and streaming must pace by rows_per_batch and terminate
at max_rows. The reference analogue is the connector wiring tier
(kafka/delta sources); this source additionally executes end-to-end
because it needs no jars."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from pyspark_streaming_base_spark.sources.synthetic import (
    SyntheticEventsDataSource,
    _mix,
    _split,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(SyntheticEventsDataSource)


def _rows(df):
    return Counter(tuple(r) for r in df.collect())


def test_split_covers_range_without_overlap():
    for n in (1, 3, 7, 100):
        parts = _split(10, 110, n)
        ids = sorted((p.start, p.end) for p in parts)
        assert ids[0][0] == 10 and ids[-1][1] == 110
        for (_, e1), (s2, _) in zip(ids, ids[1:]):
            assert e1 == s2  # gap-free, non-overlapping
    assert _split(5, 5, 4) == []


def test_mix_is_avalanche_spread():
    # no two consecutive ids share a 64-bit mix; low bits are well spread
    outs = [_mix(i) for i in range(1000)]
    assert len(set(outs)) == 1000
    assert len({o % 64 for o in outs}) == 64


def test_batch_read_deterministic_across_partitioning(spark):
    a = spark.read.format("synthetic_events").option("rows", "500").load()
    b = (
        spark.read.format("synthetic_events")
        .option("rows", "500")
        .option("numpartitions", "3")
        .load()
    )
    assert a.count() == 500
    assert _rows(a) == _rows(b)  # slicing-invariant content
    assert a.schema.simpleString() == (
        "struct<event_id:bigint,ts:timestamp,user_id:bigint,"
        "event_type:string,value:double>"
    )
    # generated values are usable analytics inputs, not filler
    kinds = {r["event_type"] for r in a.select("event_type").distinct().collect()}
    assert kinds == {"click", "view", "purchase", "scroll"}


def test_stream_paces_and_terminates(spark, tmp_path):
    q = (
        spark.readStream.format("synthetic_events")
        .option("rows_per_batch", "40")
        .option("max_rows", "200")
        .load()
        .writeStream.format("memory")
        .queryName("synth_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.table("synth_stream")
    assert got.count() == 200  # capped at max_rows, no duplicates
    # stream content == batch content for the same id range
    batch = spark.read.format("synthetic_events").option("rows", "200").load()
    assert _rows(got) == _rows(batch)
    # admission control actually paced: >= ceil(200/40) batches ran
    n_batches = q.lastProgress["batchId"] + 1
    assert n_batches >= 5


def test_stream_restart_resumes_exactly_once(spark, tmp_path):
    """Kill after the first run, restart from the checkpoint with a COLD
    reader (in-memory cursor reset): the resumed query must append only
    the missing rows — exactly-once across restarts, same bar as the
    foreach_batch ledger."""
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run(max_rows):
        q = (
            spark.readStream.format("synthetic_events")
            .option("rows_per_batch", "30")
            .option("max_rows", str(max_rows))
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run(90)
    first = spark.read.parquet(out)
    assert first.count() == 90
    run(210)  # restart: cursor starts cold at 0, checkpoint says 90
    got = spark.read.parquet(out)
    assert got.count() == 210  # no re-emission, no gap
    batch = spark.read.format("synthetic_events").option("rows", "210").load()
    assert _rows(got) == _rows(batch)


def test_stream_joins_with_static_dim(spark, tmp_path):
    """The synthetic stream is a first-class streaming DataFrame: a
    stream-static enrichment plus windowed count runs on it unchanged."""
    dim = spark.createDataFrame(
        [("click", 1), ("view", 0), ("purchase", 5), ("scroll", 0)],
        ["event_type", "weight"],
    )
    stream = (
        spark.readStream.format("synthetic_events")
        .option("rows_per_batch", "100")
        .option("max_rows", "300")
        .load()
    )
    agg = (
        stream.join(F.broadcast(dim), "event_type")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.sum("weight").alias("total_weight"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("synth_enriched")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.table("synth_enriched")
    assert got.count() > 0
    assert got.where(F.col("total_weight") < 0).count() == 0

"""Source/sink option-wiring tests (reference style: analysis-only, no
brokers/jars — tests/test_kafka_stream_source.py asserts resolved options
and reader type without pulling data) plus a full file-based e2e.
"""

from __future__ import annotations

import pytest

from pyspark.sql.streaming import DataStreamReader

from pyspark_streaming_base_spark.sources import (
    DeltaStreamingSource,
    FileStreamingSource,
    KafkaStreamingSource,
)
from pyspark_streaming_base_spark.sinks import DeltaStreamingSink, FileStreamingSink


# -- Kafka (A1/A14/A15) ----------------------------------------------------


def test_kafka_defaults_match_reference():
    src = KafkaStreamingSource(config={"kafka.bootstrap.servers": "b:9092", "topic": "t1"})
    opts = src.resolved_options()
    # reference defaults: kafka_source.py:14-70
    assert opts["maxOffsetsPerTrigger"] == "5000"
    assert opts["minPartitions"] == "36"
    assert opts["maxRecordsPerPartition"] == "100"
    assert opts["startingOffsets"] == "earliest"
    assert opts["failOnDataLoss"] == "true"
    assert opts["fetchOffset.retryIntervalMs"] == "10"


def test_kafka_reader_wiring(spark):
    src = KafkaStreamingSource(
        config={"kafka.bootstrap.servers": "b:9092", "topic": "t1"}
    )
    reader = src.generate(spark)
    assert isinstance(reader, DataStreamReader)


def test_kafka_topic_required():
    src = KafkaStreamingSource(config={"kafka.bootstrap.servers": "b:9092"})
    with pytest.raises(ValueError, match="topic"):
        src.topic()


def test_kafka_prefix_respected_for_max_offsets(spark):
    # fixes quirk 2.5.5: reference hardcodes the full key for
    # maxOffsetsPerTrigger (kafka_source.py:204-206); a second source under
    # spark.app.source2 must resolve its own value.
    key = "spark.app.source2.kafka.options.maxOffsetsPerTrigger"
    spark.conf.set(key, "123")
    try:
        src = KafkaStreamingSource(
            config_prefix="spark.app.source2",
            config={"kafka.bootstrap.servers": "b:9092", "topic": "t"},
        )
        assert src.resolved_options(spark)["maxOffsetsPerTrigger"] == "123"
        default_src = KafkaStreamingSource(
            config={"kafka.bootstrap.servers": "b:9092", "topic": "t"}
        )
        assert default_src.resolved_options(spark)["maxOffsetsPerTrigger"] == "5000"
    finally:
        spark.conf.unset(key)


def test_kafka_group_id_prefix_from_app(spark):
    from pyspark_streaming_base_spark.app import StreamingApp

    app = StreamingApp(session=spark)
    app.with_config(
        {"spark.app.name": "gapp", "spark.app.checkpoints.version": "v3"}
    ).initialize()
    try:
        src = KafkaStreamingSource(
            config={"kafka.bootstrap.servers": "b:9092", "topic": "t"}, app=app
        )
        # reference rule: {app.name}:{checkpoints.version} (kafka_source.py:144-160)
        assert src.group_id_prefix(spark) == "gapp:v3"
    finally:
        spark.conf.unset("spark.app.checkpoints.version")


# -- Delta (A2/A10/A16) ----------------------------------------------------


def test_delta_defaults_match_reference():
    src = DeltaStreamingSource(config={"path": "/tmp/delta"})
    opts = src.resolved_options()
    # reference defaults: delta_source.py:9-14
    assert opts["maxFilesPerTrigger"] == "1"
    assert opts["maxBytesPerTrigger"] == "1g"
    assert opts["ignoreChanges"] == "true"
    assert opts["ignoreDeletes"] == "true"
    assert opts["withEventTimeOrder"] == "true"


def test_delta_table_name_resolution():
    # reference join rule: delta_source.py:63-89
    src = DeltaStreamingSource(
        config={"catalog": "cat", "databaseOrSchema": "db", "tableName": "tbl"}
    )
    assert src.table_name() == "cat.db.tbl"
    assert DeltaStreamingSource.is_managed("cat.db.tbl")
    assert not DeltaStreamingSource.is_managed("bare")
    empty = DeltaStreamingSource()
    with pytest.raises(ValueError):
        empty.table_name()


def test_delta_sink_defaults_match_reference():
    sink = DeltaStreamingSink(config={"path": "/tmp/out"})
    opts = sink.resolved_options()
    # reference defaults: delta_sink.py:13-37
    assert opts["mergeSchema"] == "false"
    assert opts["maxRecordsPerFile"] == "100000"
    assert opts["spark.databricks.delta.autoCompact.enabled"] == "true"
    assert opts["spark.databricks.delta.autoCompact.minNumFiles"] == "10"
    assert opts["spark.databricks.delta.optimizeWrite.enabled"] == "true"
    assert sink.setting("outputMode") == "append"


def test_runtimeconf_tier_for_source_options(spark):
    key = "spark.app.source.delta.options.maxFilesPerTrigger"
    spark.conf.set(key, "17")
    try:
        src = DeltaStreamingSource(config={"path": "/tmp/delta"})
        assert src.resolved_options(spark)["maxFilesPerTrigger"] == "17"
    finally:
        spark.conf.unset(key)


# -- File source streaming (jar-free A1-analog) ----------------------------


def test_file_source_is_streaming(spark, tmp_path):
    # reference pattern: assert df.isStreaming
    # (tests/test_delta_streaming_source.py:55)
    df = spark.range(10).selectExpr("id", "id * 2 AS v")
    src_dir = str(tmp_path / "in")
    df.write.parquet(src_dir)
    src = FileStreamingSource(config={"path": src_dir}).with_schema(df.schema)
    sdf = src.load(spark)
    assert sdf.isStreaming


def test_file_sink_requires_path(spark):
    sink = FileStreamingSink()
    df = spark.range(1)
    with pytest.raises(Exception):
        sink.execute(sink.from_df(df))

"""Pre-flight streaming legality checks (SURVEY §7 watch list: surface
output-mode × watermark × aggregation errors at wiring time with
actionable messages, not at ``start()`` as a deep AnalysisException)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pyspark_streaming_base_spark.sinks import FileStreamingSink
from pyspark_streaming_base_spark.streaming.legality import (
    StreamingLegalityError,
    check_output_mode,
)
from pyspark_streaming_base_spark.queries._tables import t

from tests.conftest import SF_SMALL


@pytest.fixture()
def stream(spark, tmp_path):
    events = t(spark, SF_SMALL, "events").select("ts", "user_id", "value")
    stage = str(tmp_path / "stage")
    events.write.parquet(stage)
    return spark.readStream.schema(events.schema).parquet(stage)


def test_complete_without_aggregation_rejected(stream):
    with pytest.raises(StreamingLegalityError, match="complete.*aggregation"):
        check_output_mode(stream.select("user_id"), "complete")


def test_append_agg_without_watermark_rejected(stream):
    agg = stream.groupBy("user_id").count()
    with pytest.raises(StreamingLegalityError, match="watermark"):
        check_output_mode(agg, "append")


def test_append_agg_with_watermark_legal(stream):
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "5 minutes"))
        .count()
    )
    check_output_mode(agg, "append")  # no raise


def test_stream_stream_join_requires_append(stream):
    a = stream.withWatermark("ts", "1 hour").alias("a")
    b = stream.withWatermark("ts", "1 hour").alias("b")
    j = a.join(b, F.col("a.user_id") == F.col("b.user_id"))
    with pytest.raises(StreamingLegalityError, match="append"):
        check_output_mode(j, "update")
    check_output_mode(j, "append")  # legal


def test_stream_static_join_not_flagged_as_stream_stream(spark, stream):
    static = t(spark, SF_SMALL, "nation")
    j = stream.join(
        static, (stream.user_id % 25).cast("int") == static.n_nationkey
    )
    check_output_mode(j, "append")  # one streaming side only — legal


def test_strict_rejects_unbounded_state(stream):
    agg = stream.groupBy("user_id").count()
    check_output_mode(agg, "update")  # legal Spark
    with pytest.raises(StreamingLegalityError, match="unbounded"):
        check_output_mode(agg, "update", strict=True)


def test_batch_df_is_ignored(spark):
    check_output_mode(t(spark, SF_SMALL, "nation"), "complete")  # no-op


def test_sink_wiring_runs_check(stream, tmp_path):
    sink = FileStreamingSink(
        config={
            "path": str(tmp_path / "out"),
            "outputMode": "complete",
        }
    )
    with pytest.raises(StreamingLegalityError, match="complete"):
        sink.from_df(stream.select("user_id"))
    # opt-out restores raw Spark behavior
    sink2 = FileStreamingSink(
        config={
            "path": str(tmp_path / "out2"),
            "outputMode": "complete",
            "validate": "false",
        }
    )
    sink2.from_df(stream.select("user_id"))  # builds; Spark would reject at start()

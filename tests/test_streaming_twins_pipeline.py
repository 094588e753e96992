"""Streaming twins for the round-3 row-level pipeline operators: PII
redaction (q91's projection) and DQ tagging (q95's rule projection) are
append-legal narrow transforms, so streamed results must equal batch."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_streaming_base_spark.functions.textops import redact
from pyspark_streaming_base_spark.operators.expectations import (
    VIOLATIONS_COL,
    apply_expectations,
)
from pyspark_streaming_base_spark.queries._tables import t
from pyspark_streaming_base_spark.streaming.equivalence import stream_replay

from tests.conftest import SF_SMALL


def test_pii_redaction_stream_equals_batch(spark, tmp_path):
    ev = t(spark, SF_SMALL, "events").select("event_id", "props")

    def scrub(df):
        return df.select(
            "event_id", redact(F.col("props")).alias("props_redacted")
        )

    streamed = stream_replay(
        spark,
        ev,
        scrub,
        str(tmp_path / "stage"),
        str(tmp_path / "ckpt"),
        output_mode="append",
    )
    got = {(r["event_id"], r["props_redacted"]) for r in streamed.collect()}
    want = {(r["event_id"], r["props_redacted"]) for r in scrub(ev).collect()}
    assert got == want


def test_dq_tagging_stream_equals_batch(spark, tmp_path):
    ev = t(spark, SF_SMALL, "events").select("event_id", "value")

    def tag(df):
        tagged = apply_expectations(
            df,
            {
                "value_known": F.col("value").isNotNull(),
                "value_bounded": F.abs(F.col("value")) < 100,
            },
        )
        return tagged.select(
            "event_id", F.array_join(VIOLATIONS_COL, ",").alias("failed")
        )

    streamed = stream_replay(
        spark,
        ev,
        tag,
        str(tmp_path / "stage"),
        str(tmp_path / "ckpt"),
        output_mode="append",
    )
    got = {(r["event_id"], r["failed"]) for r in streamed.collect()}
    want = {(r["event_id"], r["failed"]) for r in tag(ev).collect()}
    assert got == want
    assert any(f for _, f in want)  # rules actually fire on the fixture

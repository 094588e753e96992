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

from tests.conftest import SF_MEDIUM, SF_SMALL

from pyspark_streaming_base_spark.queries import load_all

R = load_all()


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


def test_hll_rollup_merge_equals_direct_sketch(spark):
    """q123: folding hourly HLL sketches into daily must give the SAME
    estimate as sketching the raw day directly (register max-merge is
    associative + idempotent — equality, not tolerance), and the
    estimate must be within HLL's documented error of the exact count."""
    from pyspark.sql import functions as F

    from pyspark_streaming_base_spark.queries._tables import t as _t

    ev = _t(spark, SF_MEDIUM, "events")
    via_rollup = {
        (r.day, r.event_type): r.est_users
        for r in R["q123_hll_rollup"].fn(spark, SF_MEDIUM).collect()
    }
    direct = {
        (r.day, r.event_type): r.est
        for r in ev.groupBy(
            F.date_trunc("day", "ts").alias("day"), "event_type"
        )
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).cast("bigint").alias("est"))
        .collect()
    }
    assert via_rollup == direct  # exact equality: merge is lossless
    exact = {
        (r.day, r.event_type): r.n
        for r in ev.groupBy(
            F.date_trunc("day", "ts").alias("day"), "event_type"
        )
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    for k, est in via_rollup.items():
        assert abs(est - exact[k]) <= max(3, 0.05 * exact[k]), k

"""Streaming observability: ProgressCapture listener e2e."""

from __future__ import annotations

import time

from pyspark_streaming_base_spark.streaming.metrics import ProgressCapture


def test_progress_capture_e2e(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.range(0, 1000).selectExpr("id", "id % 7 AS k").coalesce(2).write.parquet(src)

    cap = ProgressCapture(maxlen=16).attach(spark)
    try:
        stream = (
            spark.readStream.schema("id BIGINT, k BIGINT")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = (
            stream.groupBy("k")
            .count()
            .writeStream.format("memory")
            .queryName("metrics_probe")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        # listener events are delivered async on the bus thread
        deadline = time.time() + 30
        while time.time() < deadline:
            s = cap.summary("metrics_probe")
            if s["n_batches"] > 0 and s["total_input_rows"] >= 1000:
                break
            time.sleep(0.2)
        s = cap.summary("metrics_probe")
        assert s["n_batches"] >= 1
        assert s["total_input_rows"] == 1000
        assert s["max_trigger_ms"] is not None and s["max_trigger_ms"] >= 0
        # the complete-mode agg holds 7 groups of state
        assert s["last_state_rows"] >= 7
        snap = cap.snapshot("metrics_probe")
        assert all(r["batchId"] >= 0 for r in snap)
    finally:
        cap.detach()


def test_summary_empty():
    cap = ProgressCapture()
    assert cap.summary("nope") == {"name": "nope", "n_batches": 0}

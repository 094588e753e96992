"""End-to-end streaming tests (reference style §5.3–5.4: golden-fixture
pipeline + read-back fingerprint), on the jar-free file connectors, plus
batch↔stream equivalence for the event-time operators and the stateful /
idempotent paths.
"""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from pyspark_streaming_base_spark.app import StreamingApp
from pyspark_streaming_base_spark.queries._tables import t
from pyspark_streaming_base_spark.sinks import IdempotentForeachBatchSink
from pyspark_streaming_base_spark.streaming import (
    running_aggregate,
    sessionize,
    stream_replay,
)

from tests.conftest import SF_SMALL


def _rows(df, cols=None):
    cols = cols or df.columns
    return Counter(tuple(r[c] for c in cols) for r in df.collect())


# -- reference-style e2e: file source → app.run() → file sink --------------


def test_app_run_end_to_end(spark, tmp_path):
    """Mirror of the reference's Delta→Delta availableNow e2e
    (tests/test_delta_end_to_end.py:45-110) on parquet connectors, with its
    data-quality fingerprint read-back."""
    fixture = t(spark, SF_SMALL, "nation")
    src_dir, out_dir = str(tmp_path / "src"), str(tmp_path / "out")
    fixture.write.parquet(src_dir)

    app = StreamingApp(session=spark)
    app.with_config(
        {
            "spark.app.name": "e2e_app",
            "spark.app.checkpoints.path": str(tmp_path / "ckpt"),
            "spark.app.checkpoints.version": "t1",
        }
    ).initialize()
    app.with_file_source(config={"path": src_dir})
    app.file_source().with_schema(fixture.schema)
    app.with_file_sink(config={"path": out_dir, "queryName": "e2e_sink"})

    query = app.run(available_now=True)
    query.awaitTermination()

    back = spark.read.parquet(out_dir)
    # reference fingerprint: rows > 0, non-null density, cols > 0
    assert back.count() == 25
    non_null = back.select(
        [F.sum(F.when(F.col(c).isNotNull(), 1).otherwise(0)).alias(c) for c in back.columns]
    ).collect()[0]
    assert sum(non_null) > back.count()
    assert _rows(back) == _rows(fixture)
    # checkpoint landed under the derived location (A6 rule)
    assert (tmp_path / "ckpt" / "e2e_app" / "t1" / "_checkpoints").exists()
    spark.conf.unset("spark.app.checkpoints.path")
    spark.conf.unset("spark.app.checkpoints.version")


def test_app_run_with_transform(spark, tmp_path):
    fixture = t(spark, SF_SMALL, "region")
    src_dir, out_dir = str(tmp_path / "src"), str(tmp_path / "out")
    fixture.write.parquet(src_dir)
    app = StreamingApp(session=spark)
    app.with_config(
        {
            "spark.app.name": "e2e_tx",
            "spark.app.checkpoints.path": str(tmp_path / "ckpt"),
        }
    ).initialize()
    app.with_file_source(config={"path": src_dir})
    app.file_source().with_schema(fixture.schema)
    app.with_file_sink(config={"path": out_dir})
    app.run(
        transform=lambda df: df.select("r_regionkey", F.upper("r_name").alias("r_name_u"))
    ).awaitTermination()
    back = spark.read.parquet(out_dir)
    assert back.columns == ["r_regionkey", "r_name_u"]
    assert back.count() == 5
    spark.conf.unset("spark.app.checkpoints.path")


# -- batch ↔ stream equivalence for event-time operators -------------------


@pytest.mark.parametrize(
    "name,transform,keys",
    [
        (
            "tumbling",
            lambda df: df.withWatermark("ts", "365 days")
            .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("ws"), "event_type", "n"),
            ["ws", "event_type", "n"],
        ),
        (
            "session",
            lambda df: df.withWatermark("ts", "365 days")
            .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("ws"), "user_id", "n"),
            ["ws", "user_id", "n"],
        ),
    ],
)
def test_stream_matches_batch(spark, tmp_path, name, transform, keys):
    events = t(spark, SF_SMALL, "events").select("ts", "event_type", "user_id", "value")
    batch = transform(events)
    streamed = stream_replay(
        spark,
        events,
        transform,
        staging_dir=str(tmp_path / "stage"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        n_chunks=4,
        output_mode="complete",
    )
    assert _rows(streamed, keys) == _rows(batch, keys)


def test_stream_dedup_within_watermark(spark, tmp_path):
    events = t(spark, SF_SMALL, "events").select("ts", "user_id", "event_type")
    streamed = stream_replay(
        spark,
        events,
        lambda df: df.withWatermark("ts", "365 days").dropDuplicatesWithinWatermark(
            ["user_id", "event_type"]
        ),
        staging_dir=str(tmp_path / "stage"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        n_chunks=2,
        output_mode="append",
    )
    # watermark spans the fixture: exactly one row per key survives
    batch_keys = events.select("user_id", "event_type").distinct().count()
    assert streamed.count() == batch_keys


# -- stateful: applyInPandasWithState --------------------------------------


def test_running_aggregate_state(spark, tmp_path):
    events = t(spark, SF_SMALL, "events").select("ts", "user_id", "value")
    streamed = stream_replay(
        spark,
        events,
        running_aggregate,
        staging_dir=str(tmp_path / "stage"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        n_chunks=3,
        output_mode="update",
    )
    # memory sink in update mode keeps every emission; the LAST emission per
    # user must equal the batch aggregate
    final = (
        streamed.withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy(
                    "user_id"
                ).orderBy(F.col("n_events").desc())
            ),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    batch = events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("total_value"),
        F.max("value").alias("max_value"),
    )
    f = {r["user_id"]: r for r in final.collect()}
    b = {r["user_id"]: r for r in batch.collect()}
    assert set(f) == set(b)
    for uid in b:
        assert f[uid]["n_events"] == b[uid]["n_events"]
        assert abs(f[uid]["total_value"] - b[uid]["total_value"]) < 1e-6
        assert f[uid]["max_value"] == b[uid]["max_value"]


def test_sessionize_event_time_timeout(spark, tmp_path):
    """Timeout-driven sessions: stage chunks in time order so the watermark
    advances across micro-batches and event-time timeouts actually fire;
    every emitted session must exactly match a batch gaps-and-islands
    session, and quiet gaps must have produced emissions."""
    gap_s = 600
    events = (
        t(spark, SF_SMALL, "events")
        .filter(F.col("user_id") <= 5)
        .select("user_id", "ts")
    )
    # time-ordered staging: the file source processes files in MODIFICATION
    # TIME order (a single range-partitioned write gives its part files
    # arbitrary mtimes → a later-range file first would fast-forward the
    # watermark and force-close earlier sessions), so write the ts-quartile
    # chunks sequentially with strictly increasing mtimes
    import time as _time

    staging = str(tmp_path / "stage")
    with_s = events.withColumn("ts_s", F.col("ts").cast("long"))
    bounds = with_s.approxQuantile("ts_s", [0.25, 0.5, 0.75], 0.0)
    lo = None
    for hi in [*bounds, None]:
        chunk = with_s
        if lo is not None:
            chunk = chunk.filter(F.col("ts_s") > lo)
        if hi is not None:
            chunk = chunk.filter(F.col("ts_s") <= hi)
        chunk.drop("ts_s").coalesce(1).write.mode("append").parquet(staging)
        _time.sleep(1.1)
        lo = hi
    reader = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(staging)
    )
    out = sessionize(reader.withWatermark("ts", "1 second"), gap_seconds=gap_s)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = spark.table("sessions_test").collect()
    assert emitted, "no sessions closed — event-time timeouts never fired"

    # batch truth: gaps-and-islands with the same gap
    w = __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy(
        "user_id"
    ).orderBy("ts")
    batch = (
        events.withColumn("prev", F.lag("ts").over(w))
        .withColumn(
            "new_sess",
            (
                F.col("prev").isNull()
                | ((F.col("ts").cast("long") - F.col("prev").cast("long")) > gap_s)
            ).cast("int"),
        )
        .withColumn("sess_id", F.sum("new_sess").over(w))
        .groupBy("user_id", "sess_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    truth = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in batch.collect()
    }
    for r in emitted:
        key = (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        assert key in truth, f"emitted session not in batch truth: {key}"
    # completeness: at most one session per user can still be open in state
    n_users = events.select("user_id").distinct().count()
    assert len(emitted) >= len(truth) - n_users


def test_sessionize_late_event_forms_own_session(spark, tmp_path):
    """A late event (older than the carried session, admitted by watermark
    lateness) must form its own earlier session — not silently inflate the
    current one (the signed-gap bug)."""
    import datetime as dt
    import time as _time

    base = dt.datetime(2024, 3, 1, 10, 0, 0)

    def mk(*ts):
        return spark.createDataFrame([(1, t) for t in ts], "user_id long, ts timestamp")

    staging = str(tmp_path / "stage")
    mk(base).coalesce(1).write.mode("append").parquet(staging)  # 10:00
    _time.sleep(1.1)
    # batch 2: late 08:00 (within 3h lateness) + 10:05 continuation
    mk(base - dt.timedelta(hours=2), base + dt.timedelta(minutes=5)).coalesce(
        1
    ).write.mode("append").parquet(staging)
    _time.sleep(1.1)
    # batch 3: far-future event closes everything via watermark
    mk(base + dt.timedelta(days=2)).coalesce(1).write.mode("append").parquet(staging)

    reader = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(staging)
    )
    out = sessionize(reader.withWatermark("ts", "3 hours"), gap_seconds=600)
    q = (
        out.writeStream.format("memory")
        .queryName("late_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["session_start"], r["session_end"], r["n_events"])
        for r in spark.table("late_sessions").collect()
    }
    assert (base - dt.timedelta(hours=2), base - dt.timedelta(hours=2), 1) in got
    assert (base, base + dt.timedelta(minutes=5), 2) in got


def test_continuous_rollup_maintenance(spark, tmp_path):
    """Continuous-aggregate pattern (q76's mergeability, incrementally):
    each micro-batch appends its own hourly PARTIALS (count + scaled sum)
    via foreachBatch; partials from different batches for the same hour
    coexist and the read-side fold re-aggregates them. The folded daily
    result must equal the one-shot batch aggregate over all events."""
    from pyspark_streaming_base_spark.queries._exact import scaled, unscale

    events = t(spark, SF_SMALL, "events").select("ts", "event_type", "value")
    staging, partials = str(tmp_path / "stage"), str(tmp_path / "partials")
    events.repartition(3).write.mode("overwrite").parquet(staging)

    def upsert_partials(batch_df, batch_id):
        (
            batch_df.groupBy(
                F.date_trunc("hour", "ts").alias("hour"), "event_type"
            )
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(scaled(F.col("value"))).alias("sv"),
            )
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(partials)
        )

    q = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(staging)
        .writeStream.foreachBatch(upsert_partials)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    folded = (
        spark.read.parquet(partials)
        .groupBy(F.date_trunc("day", "hour").cast("date").alias("day"), "event_type")
        .agg(
            F.sum("n_events").cast("bigint").alias("n_events"),
            unscale(F.sum("sv")).alias("total_value"),
        )
    )
    truth = events.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day"), "event_type"
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        unscale(F.sum(scaled(F.col("value")))).alias("total_value"),
    )
    cols = ["day", "event_type", "n_events", "total_value"]
    assert _rows(folded, cols) == _rows(truth, cols)
    # the partial table really is incremental: >1 batch contributed
    assert spark.read.parquet(partials).select("batch_id").distinct().count() > 1


def test_running_aggregate_tws(spark, tmp_path):
    """transformWithState twin of running_aggregate — auto-skips where the
    protobuf package (TWS worker protocol) is unavailable."""
    pytest.importorskip("google.protobuf.descriptor")
    from pyspark_streaming_base_spark.streaming.stateful import running_aggregate_tws

    events = t(spark, SF_SMALL, "events").select("ts", "user_id", "value").filter(
        "user_id <= 3"
    )
    staging = str(tmp_path / "stage")
    events.repartition(3).write.parquet(staging)
    old = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        reader = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(staging)
        )
        q = (
            running_aggregate_tws(reader)
            .writeStream.format("memory")
            .queryName("tws_agg")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        final = {
            r["user_id"]: r["n"]
            for r in spark.table("tws_agg")
            .groupBy("user_id")
            .agg(F.max("n_events").alias("n"))
            .collect()
        }
        truth = {r["user_id"]: r["count"] for r in events.groupBy("user_id").count().collect()}
        assert final == truth
    finally:
        if old is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", old)


def test_running_aggregate_tws_raises_without_protobuf(spark):
    try:
        import google.protobuf.descriptor  # noqa: F401

        pytest.skip("protobuf present; gate inactive")
    except ImportError:
        pass
    from pyspark_streaming_base_spark.streaming.stateful import running_aggregate_tws

    with pytest.raises(RuntimeError, match="protobuf"):
        running_aggregate_tws(t(spark, SF_SMALL, "events"))


# -- idempotent foreachBatch sink ------------------------------------------


def test_foreach_batch_idempotency(spark, tmp_path):
    src_df = spark.range(100).selectExpr("id", "id * 1.5 AS v")
    src_dir, out_dir = str(tmp_path / "src"), str(tmp_path / "out")
    src_df.repartition(4).write.parquet(src_dir)

    sink = IdempotentForeachBatchSink(config={"path": out_dir})
    reader = (
        spark.readStream.schema(src_df.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    q = (
        sink.from_df(reader)
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert spark.read.parquet(out_dir).count() == 100

    # Replay the WHOLE stream with a fresh checkpoint — same batch ids
    # arrive again; the ledger must drop them (exactly-once on re-run).
    q2 = (
        sink.from_df(reader)
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    assert spark.read.parquet(out_dir).count() == 100  # no duplicates


def test_foreach_batch_crash_between_write_and_mark(spark, tmp_path):
    """A crash AFTER the batch's files land but BEFORE the ledger mark must
    not duplicate rows on replay: the staged-rename scheme rewrites the
    same deterministic b<id>-p<i> names, so the replay overwrites rather
    than appends (the at-least-once hole the plain append had)."""
    import os

    out_dir = str(tmp_path / "out")
    sink = IdempotentForeachBatchSink(config={"path": out_dir})
    fn = sink.batch_fn()
    batch = spark.range(50).selectExpr("id", "id * 2.0 AS v").repartition(4)

    fn(batch, 0)
    assert spark.read.parquet(out_dir).count() == 50

    # simulate the crash window: files are in place, mark never happened
    os.remove(os.path.join(out_dir, "_batch_ledger", "0"))
    fn(batch, 0)  # replay of the same batch id
    assert spark.read.parquet(out_dir).count() == 50  # overwrote, not appended
    assert sink.is_committed(0)

    # and a wider earlier attempt (more part files) gets swept: fake a
    # stale leftover file from a 5-partition first try
    os.remove(os.path.join(out_dir, "_batch_ledger", "0"))
    stale = os.path.join(out_dir, "b0-p00099.stale.parquet")
    with open(stale, "wb") as f:
        f.write(b"not parquet")
    fn(batch, 0)
    assert not os.path.exists(stale)
    assert spark.read.parquet(out_dir).count() == 50


# -- stream-stream join (C23) ----------------------------------------------


def test_stream_stream_join(spark, tmp_path):
    """Watermarked stream-stream inner join: clicks ⋈ purchases by the same
    user within 30 minutes (event-time range condition both sides). Runs
    the SAME builder as registry query q77, so the oracle-checked batch
    form and this streaming twin are one logical plan."""
    from pyspark_streaming_base_spark.queries.streaming import (
        click_purchase_interval_join as batch_join,
    )

    events = t(spark, SF_SMALL, "events").select("ts", "user_id", "event_type", "event_id")
    clicks = events.filter(F.col("event_type") == "click")
    purchases = events.filter(F.col("event_type") == "purchase")

    expected = _rows(batch_join(clicks, purchases))

    stage = str(tmp_path / "stage")
    events.repartition(3).write.mode("overwrite").parquet(stage)
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stage)
    )
    sc = stream.filter(F.col("event_type") == "click").withWatermark("ts", "365 days")
    sp = stream.filter(F.col("event_type") == "purchase").withWatermark("ts", "365 days")
    out = batch_join(sc, sp)
    q = (
        out.writeStream.format("memory")
        .queryName("ssj_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = _rows(spark.table("ssj_out"))
    assert got == expected


def test_stream_stream_left_outer_join(spark, tmp_path):
    """Watermarked stream-stream LEFT OUTER join (q89's builder): matched
    rows stream out as matches arrive; null-extended rows are emitted ONLY
    once the watermark passes click.ts + 30min (state eviction proves no
    match can arrive). Run 1 processes the real events; run 2 restarts
    from the same checkpoint with a far-future sentinel purchase that
    drags the watermark past every click window, so run1 ∪ run2 must
    equal the batch left-outer result exactly — each null emitted exactly
    once, none lost."""
    from pyspark_streaming_base_spark.queries.streaming import (
        click_purchase_interval_join_outer as batch_outer,
    )

    events = t(spark, SF_SMALL, "events").select(
        "ts", "user_id", "event_type", "event_id"
    )
    clicks = events.filter(F.col("event_type") == "click")
    purchases = events.filter(F.col("event_type") == "purchase")
    expected = _rows(batch_outer(clicks, purchases))

    # stage THREE time-ordered files written oldest-first: the file source
    # processes by modification time, so arrival order respects event time
    # (a purchase never precedes its click by more than one batch). A
    # random repartition would replay events out of order far beyond the
    # 1-minute watermark, and streaming would — correctly — drop matches
    # whose other side was already evicted.
    import time

    stage = str(tmp_path / "stage")
    ranked = events.withColumn(
        "rn",
        F.row_number().over(
            __import__("pyspark.sql.window", fromlist=["Window"]).Window.orderBy(
                "ts", "event_id"
            )
        ),
    )
    n_ev = events.count()
    for i in range(3):
        lo, hi = i * n_ev // 3, (i + 1) * n_ev // 3
        chunk = ranked.where((F.col("rn") > lo) & (F.col("rn") <= hi)).drop("rn")
        chunk.coalesce(1).write.mode("append").parquet(stage)
        time.sleep(1.1)  # distinct mtimes → deterministic file order

    out_dir = str(tmp_path / "out")

    def run():
        # file sink, not memory: the memory sink cannot recover from a
        # checkpoint, and run 2 must resume run 1's join state
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(stage)
        )
        # watermark at INGEST, before the event_type filters: each side's
        # watermark node must see every event, or a batch containing only
        # purchases leaves the click-side watermark (and the global
        # min-of-both) stuck — exactly what a sentinel row must advance
        wm = stream.withWatermark("ts", "1 minute")
        sc = wm.filter(F.col("event_type") == "click")
        sp = wm.filter(F.col("event_type") == "purchase")
        q = (
            batch_outer(sc, sp)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return _rows(spark.read.parquet(out_dir))

    got1 = run()

    # the outer join may not have emitted every null yet: availableNow
    # stops once the files are consumed, and eviction needs a LATER batch
    # whose watermark clears the window. Append a sentinel purchase for a
    # user that matches nothing, 2 hours past the end of the data.
    sentinel_ts = events.agg(F.max("ts")).collect()[0][0]
    spark.createDataFrame(
        [(sentinel_ts, -1, "purchase", -1)], schema=events.schema
    ).withColumn("ts", F.col("ts") + F.expr("INTERVAL 2 HOURS")).write.mode(
        "append"
    ).parquet(stage)
    got = run()  # cumulative: the file sink appends to run 1's output

    # every matched row must already be in run 1 (matches never wait for
    # the watermark); the sentinel itself is a purchase, so it emits nothing
    matched = Counter({k: v for k, v in expected.items() if k[3] is not None})
    assert Counter({k: v for k, v in got1.items() if k[3] is not None}) == matched
    # and the cumulative output is the exact batch result: every null
    # emitted exactly once after its window closed, none duplicated or lost
    assert got == expected


def test_stream_stream_full_outer_join(spark, tmp_path):
    """Watermarked stream-stream FULL OUTER join (q106's builder): matched
    rows stream out as matches arrive; null-extended rows are emitted per
    side once the watermark proves no match can arrive — click.ts + 30min
    for unmatched clicks, purchase.ts for unmatched purchases (no later
    click can satisfy c.ts <= p.ts). Run 1 processes the real events; run
    2 restarts from the same checkpoint with a far-future sentinel click
    that drags the watermark past every window, so run1 ∪ run2 (minus the
    sentinel's own rows) must equal the batch full-outer result exactly —
    each null emitted exactly once on its own side, none lost."""
    from pyspark_streaming_base_spark.queries.streaming import (
        click_purchase_interval_join_full as batch_full,
    )

    events = t(spark, SF_SMALL, "events").select(
        "ts", "user_id", "event_type", "event_id"
    )
    clicks = events.filter(F.col("event_type") == "click")
    purchases = events.filter(F.col("event_type") == "purchase")
    expected = _rows(batch_full(clicks, purchases))

    # time-ordered staging (see the left-outer twin for why): the file
    # source processes by mtime, so arrival order respects event time
    import time

    from pyspark.sql.window import Window

    stage = str(tmp_path / "stage")
    ranked = events.withColumn(
        "rn", F.row_number().over(Window.orderBy("ts", "event_id"))
    )
    n_ev = events.count()
    for i in range(3):
        lo, hi = i * n_ev // 3, (i + 1) * n_ev // 3
        chunk = ranked.where((F.col("rn") > lo) & (F.col("rn") <= hi)).drop("rn")
        chunk.coalesce(1).write.mode("append").parquet(stage)
        time.sleep(1.1)  # distinct mtimes → deterministic file order

    out_dir = str(tmp_path / "out")

    def run():
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(stage)
        )
        # watermark at INGEST, before the event_type split (both sides'
        # watermark nodes must see every event — see left-outer twin)
        wm = stream.withWatermark("ts", "1 minute")
        sc = wm.filter(F.col("event_type") == "click")
        sp = wm.filter(F.col("event_type") == "purchase")
        q = (
            batch_full(sc, sp)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return _rows(spark.read.parquet(out_dir))

    got1 = run()

    # matched rows never wait for the watermark: every (click, purchase)
    # pair must already be in run 1's output
    matched = Counter(
        {k: v for k, v in expected.items() if k[1] is not None and k[3] is not None}
    )
    assert (
        Counter(
            {k: v for k, v in got1.items() if k[1] is not None and k[3] is not None}
        )
        == matched
    )

    # drag the watermark past every click window and every purchase ts
    # with a sentinel CLICK 2 hours past the data (its own row filters
    # out by user_id; it matches no purchase)
    sentinel_ts = events.agg(F.max("ts")).collect()[0][0]
    spark.createDataFrame(
        [(sentinel_ts, -1, "click", -1)], schema=events.schema
    ).withColumn("ts", F.col("ts") + F.expr("INTERVAL 2 HOURS")).write.mode(
        "append"
    ).parquet(stage)
    got = run()  # cumulative: the file sink appends to run 1's output
    got = Counter({k: v for k, v in got.items() if k[0] != -1})

    # cumulative output == batch full-outer: unmatched clicks AND
    # unmatched purchases each emitted exactly once, none duplicated/lost
    assert got == expected


def test_ewma_stream_equals_batch_recursion_exactly(spark, tmp_path):
    """Streamed EWMA state == the batch sequential recursion BIT-FOR-BIT
    (alpha = 1/2 makes every update exact IEEE arithmetic), across
    time-ordered micro-batches."""
    from pyspark_streaming_base_spark.streaming.stateful import ewma_stream

    events = t(spark, SF_SMALL, "events").select("ts", "event_id", "user_id", "value")

    # time-ordered staging (file source reads in mtime order)
    import time as _time

    staging = str(tmp_path / "stage")
    with_s = events.withColumn("ts_s", F.col("ts").cast("long"))
    bounds = with_s.approxQuantile("ts_s", [0.5], 0.0)
    for lo, hi in ((None, bounds[0]), (bounds[0], None)):
        chunk = with_s
        if lo is not None:
            chunk = chunk.filter(F.col("ts_s") > lo)
        if hi is not None:
            chunk = chunk.filter(F.col("ts_s") <= hi)
        chunk.drop("ts_s").coalesce(1).write.mode("append").parquet(staging)
        _time.sleep(1.1)

    reader = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(staging)
    )
    q = (
        ewma_stream(reader)
        .writeStream.format("memory")
        .queryName("ewma_twin")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = spark.table("ewma_twin").collect()
    final = {}
    for r in emitted:  # update mode: keep the emission with the max count
        if r.user_id not in final or r.n_events > final[r.user_id].n_events:
            final[r.user_id] = r

    rows = sorted(
        events.collect(), key=lambda r: (r.user_id, r.ts, r.event_id)
    )
    expect = {}
    for r in rows:
        n, s = expect.get(r.user_id, (0, 0.0))
        x = float(r.value)
        s = x if n == 0 else 0.5 * x + 0.5 * s
        expect[r.user_id] = (n + 1, s)
    assert set(final) == set(expect)
    for uid, (n, s) in expect.items():
        assert final[uid].n_events == n
        assert final[uid].ewma == s, uid  # exact, not approximate


def test_ewma_stream_multi_chunk_group_exact(spark, tmp_path):
    """A group LARGER than one Arrow chunk still folds in (ts, event_id)
    order: ``maxRecordsPerBatch=7`` splits a 100-row single-user group
    into ~15 pandas chunks inside ONE micro-batch, and the staged file is
    deliberately scrambled so delivery order ≠ event-time order.
    Regression test for the per-chunk-sort bug (chunks must be
    concatenated before sorting — cross-chunk rows otherwise fold in
    delivery order)."""
    from datetime import datetime, timedelta

    from pyspark_streaming_base_spark.streaming.stateful import ewma_stream

    n = 100
    base = datetime(2024, 1, 1)
    # ts offset is a permutation of 0..n-1 (gcd(37, 100) = 1), value varies
    recs = [
        (base + timedelta(seconds=(i * 37) % n), i, 1, float((i * 13) % 29))
        for i in range(n)
    ]
    # scramble the physical row order with a deterministic integer mix
    recs.sort(key=lambda r: (r[1] * 2654435761) % 1000003)
    events = spark.createDataFrame(recs, "ts timestamp, event_id bigint, user_id bigint, value double")
    staging = str(tmp_path / "stage")
    events.coalesce(1).write.parquet(staging)

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    spark.conf.set(key, "7")
    try:
        reader = spark.readStream.schema(events.schema).parquet(staging)
        q = (
            ewma_stream(reader)
            .writeStream.format("memory")
            .queryName("ewma_chunks")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set(key, old)

    got = {r.user_id: r for r in spark.table("ewma_chunks").collect()}
    s, cnt = 0.0, 0
    for ts, eid, _, v in sorted(recs, key=lambda r: (r[0], r[1])):
        s = v if cnt == 0 else 0.5 * v + 0.5 * s
        cnt += 1
    assert got[1].n_events == n
    assert got[1].ewma == s  # bit-exact despite multi-chunk delivery


def test_heavy_hitters_stream_mg_guarantee(spark, tmp_path):
    """Streaming Misra-Gries (q102's sketch phase as keyed state): after
    the stream drains, the last emission per salt group must (a) contain
    every token whose true group frequency exceeds n_seen/counters — the
    MG guarantee, exact per group because salting routes each token's
    whole substream to one group — and (b) bound every emitted count by
    true − n_seen/counters ≤ cnt ≤ true."""
    from pyspark_streaming_base_spark.streaming.stateful import (
        MG_COUNTERS,
        MG_SALTS,
        heavy_hitters_stream,
    )
    from pyspark_streaming_base_spark.functions.textops import tokens as _toks

    toks = (
        t(spark, SF_SMALL, "documents")
        .select(F.explode(_toks(F.col("text"))).alias("tok"))
        .withColumn("salt", F.pmod(F.xxhash64("tok"), F.lit(MG_SALTS)))
    )
    streamed = stream_replay(
        spark,
        toks,
        heavy_hitters_stream,
        staging_dir=str(tmp_path / "stage"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        n_chunks=3,
        output_mode="update",
    )
    # last emission per salt = the rows with that salt's max n_seen
    from pyspark.sql import Window as W

    final = (
        streamed.withColumn(
            "mx", F.max("n_seen").over(W.partitionBy("salt"))
        )
        .filter(F.col("n_seen") == F.col("mx"))
        .select("salt", "tok", "cnt", "n_seen")
    )
    got = {(r.salt, r.tok): (r.cnt, r.n_seen) for r in final.collect()}
    true = {
        (r.salt, r.tok): r.n
        for r in toks.groupBy("salt", "tok").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_per_salt = {}
    for (salt, _), n in true.items():
        n_per_salt[salt] = n_per_salt.get(salt, 0) + n
    for (salt, tok), n in true.items():
        floor = n_per_salt[salt] / MG_COUNTERS
        if n > floor:  # the guarantee: must be present
            assert (salt, tok) in got, (salt, tok, n, floor)
        if (salt, tok) in got:
            cnt, n_seen = got[(salt, tok)]
            assert n_seen == n_per_salt[salt]
            assert n - floor <= cnt <= n, (salt, tok, cnt, n)
    # candidate state stayed bounded
    per_salt = {}
    for (salt, _tok) in got:
        per_salt[salt] = per_salt.get(salt, 0) + 1
    assert all(v <= MG_COUNTERS for v in per_salt.values())


def test_ewma_stream_event_ttl_evicts_idle_user(spark, tmp_path):
    """r13 (module sweep after the r12 verdict's transition finding):
    ewma_stream was the last per-user-state path with NoTimeout and no
    knob. With ttl_timeout='event', an idle user's (count, value) pair
    is removed once the watermark passes last_seen + ttl — observable as
    a COLD RESTART (n=1, ewma = the raw new value) when the user
    returns, where the no-TTL control folds on (n=3) — and the
    availableNow drain terminates cleanly despite the pending
    event-time timeout (the processing-time clock spins here)."""
    import datetime as _dt
    import time as _time

    from pyspark_streaming_base_spark.streaming.stateful import ewma_stream

    schema = "ts timestamp, event_id long, user_id long, value double"
    t0 = _dt.datetime(2024, 3, 1, 12, 0, 0)

    def m(minutes):
        return t0 + _dt.timedelta(minutes=minutes)

    files = [
        [(m(0), 1, 1, 10.0), (m(1), 2, 1, 20.0), (m(1), 100, 2, 1.0)],
        [(m(5), 101, 2, 1.0)],   # batch runs at wm=+0m
        [(m(30), 102, 2, 1.0)],  # wm=+4m: timeout at +11m not yet passed
        [(m(31), 103, 2, 1.0)],  # wm=+29m: user 1 evicted (ttl run)
        [(m(40), 3, 1, 40.0), (m(40), 104, 2, 1.0)],  # user 1 returns
    ]
    staging = str(tmp_path / "stage")
    for rows in files:
        spark.createDataFrame(rows, schema=schema).coalesce(1).write.mode(
            "append"
        ).parquet(staging)
        _time.sleep(1.1)

    def drain(make_df, name, ckpt):
        reader = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(staging)
        )
        q = (
            make_df(reader)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300), f"{name} drain did not terminate"
        return [
            (r.n_events, r.ewma)
            for r in spark.table(name).collect()
            if r.user_id == 1
        ]

    got_ttl = drain(
        lambda rd: ewma_stream(
            rd,
            state_ttl_minutes=10,
            ttl_timeout="event",
            delay_threshold="1 minute",
        ),
        "ewma_ttl",
        "ck_ewma_ttl",
    )
    got_ctl = drain(lambda rd: ewma_stream(rd), "ewma_ctl", "ck_ewma_ctl")

    # both runs fold the first batch identically: n=2, s=0.5*20+0.5*10
    assert (2, 15.0) in got_ttl and (2, 15.0) in got_ctl
    # control carries state across the idle gap: n=3, s=0.5*40+0.5*15
    assert (3, 27.5) in got_ctl and (1, 40.0) not in got_ctl
    # TTL run: eviction fired, the return is a COLD start
    assert (1, 40.0) in got_ttl and (3, 27.5) not in got_ttl

"""Streaming twin for q182's transition matrix: `transition_stream`
(one string of state per user) must emit, across time-ordered
micro-batches, EXACTLY the row multiset of the batch lag window —
including the transitions that straddle a micro-batch boundary, which is
the part the state exists for (with maxFilesPerTrigger=1 and two staged
files, every user whose events span both files has at least one
boundary transition, so equality is unreachable without correct state
carry-over)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from pyspark_streaming_base_spark.queries._tables import t

from tests.conftest import SF_SMALL


def _stage_time_ordered(events, staging):
    import time as _time

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


def test_transition_stream_equals_batch_lag(spark, tmp_path):
    from pyspark_streaming_base_spark.streaming.stateful import (
        transition_stream,
    )

    events = t(spark, SF_SMALL, "events").select(
        "ts", "event_id", "user_id", "event_type"
    )
    staging = str(tmp_path / "stage")
    _stage_time_ordered(events, staging)

    reader = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(staging)
    )
    q = (
        transition_stream(reader)
        .writeStream.format("memory")
        .queryName("transition_twin")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = Counter(
        (r.user_id, r.prev_type, r.event_type)
        for r in spark.table("transition_twin").collect()
    )

    rows = sorted(events.collect(), key=lambda r: (r.user_id, r.ts, r.event_id))
    want: Counter = Counter()
    last = {}
    for r in rows:
        if r.user_id in last:
            want[(r.user_id, last[r.user_id], r.event_type)] += 1
        last[r.user_id] = r.event_type
    assert got == want

    # the boundary property actually fired: at least one user spans both
    # staged files (otherwise this test degenerates to single-batch)
    spans = events.withColumn("ts_s", F.col("ts").cast("long"))
    b = spans.approxQuantile("ts_s", [0.5], 0.0)[0]
    both = (
        spans.groupBy("user_id")
        .agg(
            F.sum((F.col("ts_s") <= b).cast("int")).alias("lo"),
            F.sum((F.col("ts_s") > b).cast("int")).alias("hi"),
        )
        .filter((F.col("lo") > 0) & (F.col("hi") > 0))
        .count()
    )
    assert both > 0

    # and the per-(prev,next) counts fold to q182's matrix numbers
    from pyspark_streaming_base_spark.queries import load_all

    q182 = load_all()["q182_event_transitions"].fn(spark, SF_SMALL)
    matrix = {
        (r["prev_type"], r["event_type"]): r["n_transitions"]
        for r in q182.collect()
    }
    folded: Counter = Counter()
    for (uid, p, n), c in got.items():
        folded[(p, n)] += c
    assert dict(folded) == matrix


def test_transition_stream_with_ttl_wiring(spark, tmp_path):
    """state_ttl_minutes arms ProcessingTimeTimeout. Two things pinned:
    (1) with a continuously-triggered query and a TTL far longer than
    the run, no state expires and the emitted multiset equals the batch
    lag — the conf + setTimeoutDuration wiring works; (2) the operator
    is NOT used with availableNow when a TTL is set (pending timeouts
    keep the drain loop alive — measured epoch ~142 spin on a one-file
    drain), so this test drives a processingTime trigger and stops the
    query explicitly."""
    import time as _time

    from pyspark_streaming_base_spark.streaming.stateful import (
        transition_stream,
    )

    events = t(spark, SF_SMALL, "events").select(
        "ts", "event_id", "user_id", "event_type"
    )
    staging = str(tmp_path / "stage")
    _stage_time_ordered(events, staging)

    reader = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(staging)
    )
    q = (
        transition_stream(reader, state_ttl_minutes=60)
        .writeStream.format("memory")
        .queryName("transition_twin_ttl")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        rows = sorted(
            events.collect(), key=lambda r: (r.user_id, r.ts, r.event_id)
        )
        want: Counter = Counter()
        last = {}
        for r in rows:
            if r.user_id in last:
                want[(r.user_id, last[r.user_id], r.event_type)] += 1
            last[r.user_id] = r.event_type
        n_want = sum(want.values())
        deadline = _time.time() + 120
        while _time.time() < deadline:
            if spark.table("transition_twin_ttl").count() >= n_want:
                break
            _time.sleep(1.0)
        got = Counter(
            (r.user_id, r.prev_type, r.event_type)
            for r in spark.table("transition_twin_ttl").collect()
        )
        assert got == want
    finally:
        q.stop()


def _stage_shuffled(spark, events, staging):
    """Adversarial staging for the late-tolerant variant: file 1 holds
    the LATE half of every user's history, file 2 the EARLY half — each
    user's rows arrive across micro-batches in REVERSED event-time
    order (the exact condition the plain variant's in-order precondition
    excludes). Two watermark-advancing sentinel batches for a dummy user
    follow so an availableNow drain seals every real event: sentinel 1
    raises the max event time, sentinel 2 runs a batch under the
    advanced watermark so buffered groups flush via their event-time
    timeouts."""
    import datetime as _dt
    import time as _time

    from pyspark.sql import Window as W

    with_r = events.withColumn(
        "half",
        (
            F.percent_rank().over(
                W.partitionBy("user_id").orderBy("ts", "event_id")
            )
            >= 0.5
        ).cast("int"),
    )
    for half in (1, 0):  # late half FIRST
        (
            with_r.filter(F.col("half") == half)
            .drop("half")
            .coalesce(1)
            .write.mode("append")
            .parquet(staging)
        )
        _time.sleep(1.1)
    mx = events.agg(F.max("ts")).collect()[0][0]
    for days in (90, 91):
        sent = spark.createDataFrame(
            [(mx + _dt.timedelta(days=days), 10**9 + days, 10**9, "sentinel")],
            schema=events.schema,
        )
        sent.coalesce(1).write.mode("append").parquet(staging)
        _time.sleep(1.1)


def test_transition_stream_buffered_tolerates_late_arrival(spark, tmp_path):
    """The watermark-buffered variant emits the batch lag's exact row
    multiset from SHUFFLED micro-batches — and the same staging provably
    breaks the plain in-order variant, which is the gap the buffered
    form exists to close (r11 verdict item 4)."""
    from pyspark_streaming_base_spark.streaming.stateful import (
        transition_stream,
        transition_stream_buffered,
    )

    events = t(spark, SF_SMALL, "events").select(
        "ts", "event_id", "user_id", "event_type"
    )
    staging = str(tmp_path / "stage")
    _stage_shuffled(spark, events, staging)

    def drain(make_df, name, ckpt):
        reader = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(staging)
        )
        q = (
            make_df(reader)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return Counter(
            (r.user_id, r.prev_type, r.event_type)
            for r in spark.table(name).collect()
            if r.user_id < 10**9  # sentinel user excluded
        )

    rows = sorted(events.collect(), key=lambda r: (r.user_id, r.ts, r.event_id))
    want: Counter = Counter()
    last = {}
    for r in rows:
        if r.user_id in last:
            want[(r.user_id, last[r.user_id], r.event_type)] += 1
        last[r.user_id] = r.event_type

    got = drain(
        lambda rd: transition_stream_buffered(rd, delay_threshold="45 days"),
        "transition_buf_twin",
        "ckpt_buf",
    )
    assert got == want

    # the plain variant FAILS this staging (its precondition is real):
    # every user's late half precedes its early half, so the carried
    # boundary is wrong for any user with a non-constant type sequence
    got_plain = drain(transition_stream, "transition_plain_on_shuffled", "ckpt_plain")
    assert got_plain != want


def test_transition_stream_buffered_resumes_from_checkpoint(spark, tmp_path):
    """Production restart contract: an availableNow drain ends with the
    final delay-window still BUFFERED in state (documented); a later
    drain from the SAME checkpoint must pick that buffer up — no row
    lost, none reprocessed — and finish the batch-lag multiset once
    sentinels advance the watermark past every real event. Proves the
    array-typed state schema round-trips the state store across query
    restarts, not just across micro-batches."""
    import datetime as _dt
    import time as _time

    from pyspark_streaming_base_spark.streaming.stateful import (
        transition_stream_buffered,
    )

    events = t(spark, SF_SMALL, "events").select(
        "ts", "event_id", "user_id", "event_type"
    )
    staging = str(tmp_path / "stage")
    _stage_time_ordered(events, staging)  # wave 1: the real events

    out = str(tmp_path / "out")

    def drain():
        # parquet sink: the memory sink refuses checkpoint RECOVERY, and
        # recovery is the property under test
        reader = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(staging)
        )
        q = (
            transition_stream_buffered(reader, delay_threshold="45 days")
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return Counter(
            (r.user_id, r.prev_type, r.event_type)
            for r in spark.read.parquet(out).collect()
            if r.user_id < 10**9
        )

    got1 = drain()

    # wave 2 (after the first query STOPPED): watermark-advancing
    # sentinels for a dummy user — the resumed drain must flush the
    # buffered suffix from recovered state
    mx = events.agg(F.max("ts")).collect()[0][0]
    for days in (90, 91):
        spark.createDataFrame(
            [(mx + _dt.timedelta(days=days), 10**9 + days, 10**9, "sentinel")],
            schema=events.schema,
        ).coalesce(1).write.mode("append").parquet(staging)
        _time.sleep(1.1)
    got_all = drain()  # cumulative: the parquet sink appends

    rows = sorted(events.collect(), key=lambda r: (r.user_id, r.ts, r.event_id))
    want: Counter = Counter()
    last = {}
    for r in rows:
        if r.user_id in last:
            want[(r.user_id, last[r.user_id], r.event_type)] += 1
        last[r.user_id] = r.event_type

    assert got_all == want
    # the second drain genuinely recovered buffered state: the first
    # drain could not have emitted the unsealed tail, and the resumed
    # one added exactly the difference (no loss, no reprocessing)
    assert sum(got1.values()) < sum(want.values())
    assert all(got_all[k] >= got1[k] for k in got1)


def _stage_files(spark, schema, files, staging):
    """Write each row-list as its own parquet file with mod-time spacing
    so maxFilesPerTrigger=1 replays them as ordered micro-batches."""
    import time as _time

    for rows in files:
        spark.createDataFrame(rows, schema=schema).coalesce(1).write.mode(
            "append"
        ).parquet(staging)
        _time.sleep(1.1)


_TTL_SCHEMA = "ts timestamp, event_id long, user_id long, event_type string"


def _ttl_staging_rows():
    """User 1 ('A') emits view→cart, goes idle for 30 min of EVENT time,
    then returns with a purchase; user 2 is the watermark driver. With an
    idle TTL of 10 minutes the watermark passes A's drain point + ttl
    during file 3, so A's state row must be GONE before the purchase
    arrives — the cart→purchase boundary transition is forgone. Without
    the TTL the boundary is carried and the transition appears: the
    behavioral difference is the proof of state.remove(), because
    nothing else in either variant can lose a carried boundary."""
    import datetime as _dt

    t0 = _dt.datetime(2024, 3, 1, 12, 0, 0)

    def m(minutes):
        return t0 + _dt.timedelta(minutes=minutes)

    # watermark is max-prior-event-time − 1 min, evaluated at the START
    # of each batch; a group with data in a batch is never timed out in
    # that same batch, so the eviction fire needs its own driver-only
    # batch (file 4) BEFORE the user returns (file 5), and the final
    # flush needs one batch (file 7) running UNDER the watermark file 6
    # advanced — the two-sentinel convention of the resume test.
    return [
        [(m(0), 1, 1, "view"), (m(1), 2, 1, "cart"), (m(1), 100, 2, "x")],
        [(m(5), 101, 2, "x")],   # batch runs at wm=+0m
        [(m(30), 102, 2, "x")],  # wm=+4m: A's buffer flushes, idle timer arms
        [(m(31), 103, 2, "x")],  # wm=+29m: passes +14m → A evicted (ttl runs)
        [(m(40), 3, 1, "purchase"), (m(40), 104, 2, "x")],  # A returns
        [(m(80), 105, 2, "x")],  # raises max event time past the purchase
        [(m(81), 106, 2, "x")],  # runs at wm=+79m: seals the purchase row
    ]


def _drain_transitions(spark, make_df, staging, name, ckpt, sink_timeout=300):
    reader = (
        spark.readStream.schema(_TTL_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(staging)
    )
    q = (
        make_df(reader)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    # returns True on clean termination — the drain-safety property the
    # event-time clock buys (a processing-time TTL spins here)
    assert q.awaitTermination(sink_timeout), f"{name} drain did not terminate"
    return Counter(
        (r.user_id, r.prev_type, r.event_type)
        for r in spark.table(name).collect()
    )


def test_transition_stream_buffered_idle_eviction(spark, tmp_path):
    """r12 verdict item 1: with idle_ttl_minutes set, an idle user's
    state row is removed once the watermark passes its drain point +
    ttl — observable as the FORGONE boundary transition when the user
    reappears — while the no-TTL control run carries the boundary
    (users-ever-seen semantics) on the identical staging."""
    from pyspark_streaming_base_spark.streaming.stateful import (
        transition_stream_buffered,
    )

    staging = str(tmp_path / "stage")
    _stage_files(spark, _TTL_SCHEMA, _ttl_staging_rows(), staging)

    got_ttl = _drain_transitions(
        spark,
        lambda rd: transition_stream_buffered(
            rd, delay_threshold="1 minute", idle_ttl_minutes=10
        ),
        staging,
        "buf_idle_ttl",
        str(tmp_path / "ckpt_ttl"),
    )
    got_ctl = _drain_transitions(
        spark,
        lambda rd: transition_stream_buffered(rd, delay_threshold="1 minute"),
        staging,
        "buf_idle_ctl",
        str(tmp_path / "ckpt_ctl"),
    )

    a_ttl = Counter({k: v for k, v in got_ttl.items() if k[0] == 1})
    a_ctl = Counter({k: v for k, v in got_ctl.items() if k[0] == 1})
    # control: boundary carried across the 39-minute idle gap
    assert a_ctl == Counter({(1, "view", "cart"): 1, (1, "cart", "purchase"): 1})
    # TTL: the idle fire removed A's state before the purchase arrived
    assert a_ttl == Counter({(1, "view", "cart"): 1})
    # the watermark-driver user's rows are unaffected by A's eviction
    assert {k: v for k, v in got_ttl.items() if k[0] == 2} == {
        k: v for k, v in got_ctl.items() if k[0] == 2
    }


def test_transition_stream_event_ttl_availablenow(spark, tmp_path):
    """r12 verdict item 6: ttl_timeout='event' makes the plain variant's
    TTL drain-safe — an availableNow drain with a pending event-time
    timeout TERMINATES (the processing-time clock measurably spun to
    epoch ~142 on a one-file drain, the documented caveat this retires)
    — and the eviction itself bites: the watermark passing
    last_seen + ttl drops the boundary string, so the reappearing user's
    transition is forgone exactly as in the buffered variant."""
    from pyspark_streaming_base_spark.streaming.stateful import (
        transition_stream,
    )

    staging = str(tmp_path / "stage")
    _stage_files(spark, _TTL_SCHEMA, _ttl_staging_rows(), staging)

    got_ttl = _drain_transitions(
        spark,
        lambda rd: transition_stream(
            rd,
            state_ttl_minutes=10,
            ttl_timeout="event",
            delay_threshold="1 minute",
        ),
        staging,
        "plain_event_ttl",
        str(tmp_path / "ckpt_ev_ttl"),
    )
    got_ctl = _drain_transitions(
        spark,
        lambda rd: transition_stream(rd),
        staging,
        "plain_event_ctl",
        str(tmp_path / "ckpt_ev_ctl"),
    )

    a_ttl = Counter({k: v for k, v in got_ttl.items() if k[0] == 1})
    a_ctl = Counter({k: v for k, v in got_ctl.items() if k[0] == 1})
    assert a_ctl == Counter({(1, "view", "cart"): 1, (1, "cart", "purchase"): 1})
    assert a_ttl == Counter({(1, "view", "cart"): 1})


def test_transition_stream_bad_ttl_timeout_rejected(spark):
    import pytest

    from pyspark_streaming_base_spark.streaming.stateful import (
        transition_stream,
    )

    with pytest.raises(ValueError, match="ttl_timeout"):
        transition_stream(None, state_ttl_minutes=5, ttl_timeout="wallclock")

"""Event-time windowing operators (SURVEY.md §2C C13, C20–C23).

Each query here is the *batch-equivalent* formulation of a streaming
operator over the ``events`` table — Structured Streaming runs the exact
same logical plan incrementally (`readStream` instead of `read`), which the
pytest suite verifies by replaying the same parquet through a file stream
with ``trigger(availableNow=True)`` and asserting batch/stream equality
(SURVEY.md §5 "batch-equivalence harness").

Oracle notes: Spark's ``window(ts, w)`` aligns tumbling windows to the Unix
epoch; DuckDB's ``time_bucket`` aligns to 2000-01-01, which is itself
epoch-aligned for divisors of a day, so the buckets coincide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_streaming_base_spark.queries import query
from pyspark_streaming_base_spark.queries._exact import (
    dsum,
    epoch_seconds,
    scaled,
    sql_dsum,
    unscale,
)
from pyspark_streaming_base_spark.queries._tables import t


@query(
    "q76_hier_rollup",
    oracle="""
    SELECT date_trunc('day', ts) AS day,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 1000000.0, 0) AS BIGINT)) AS DOUBLE)
             / 1000000.0 AS total_value,
           ROUND(MAX(value), 6) AS max_value
    FROM events
    GROUP BY date_trunc('day', ts), event_type
    """,
)
def q76_hier_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style hierarchical rollup: the DAILY aggregate is
    computed FROM the hourly partials (sum-of-sums, count-of-counts,
    max-of-maxes), never from raw rows — while the oracle aggregates raw
    directly, so a PASS proves the re-aggregation is lossless. That
    mergeability is what makes continuous aggregates maintainable at
    100 TB: each arriving hour updates one hourly partial, and coarser
    levels fold partials instead of rescanning history.

    All three aggregates are mergeable by construction: scaled-int sums
    are associative, counts add, max composes. AVG-style ratios must be
    derived from (sum, count) partials — never averaged across levels.
    """
    ev = t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(scaled(F.col("value"))).alias("sv"),  # keep the SCALED partial
        F.max("value").alias("max_value"),
    )
    daily = hourly.groupBy(
        F.date_trunc("day", "hour").cast("date").alias("day"),
        "event_type",
    ).agg(
        F.sum("n_events").cast("bigint").alias("n_events"),
        unscale(F.sum("sv")).alias("total_value"),
        F.round(F.max("max_value"), 6).alias("max_value"),
    )
    return daily


@query(
    "q70_tumbling_window",
    oracle="""
    SELECT
      time_bucket(INTERVAL '5 minutes', ts) AS win_start,
      time_bucket(INTERVAL '5 minutes', ts) + INTERVAL '5 minutes' AS win_end,
      event_type,
      CAST(COUNT(*) AS BIGINT) AS n_events,
      {v} AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    """.format(v=sql_dsum("value")),
)
def q70_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute tumbling window aggregation by event type (C20).

    Streaming twin: ``withWatermark('ts', ...)`` + identical groupBy —
    state per open window only. Scale: map-side partial aggregation means
    the shuffle carries (window, type) groups, not events.
    """
    ev = t(spark, sf_dir, "events")
    win = F.window("ts", "5 minutes")
    return (
        ev.groupBy(win.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            dsum(F.col("value")).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@query(
    "q71_sliding_window",
    oracle="""
    SELECT win_start, win_start + INTERVAL '10 minutes' AS win_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {v} AS sum_value
    FROM (
      SELECT unnest([
               time_bucket(INTERVAL '5 minutes', ts),
               time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes'
             ]) AS win_start,
             value
      FROM events
    )
    GROUP BY win_start
    """.format(v=sql_dsum("value")),
)
def q71_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute windows sliding every 5 minutes (C20 sliding).

    Each event lands in exactly 2 overlapping windows; Spark's ``window``
    with a slide expands rows the same way the oracle's unnest does.
    """
    ev = t(spark, sf_dir, "events")
    win = F.window("ts", "10 minutes", "5 minutes")
    return (
        ev.groupBy(win.alias("w"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            dsum(F.col("value")).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "n_events",
            "sum_value",
        )
    )


@query(
    "q72_session_window",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= INTERVAL '30 minutes'
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    numbered AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS session_no
      FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '30 minutes' AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {v} AS sum_value
    FROM numbered
    GROUP BY user_id, session_no
    """.format(v=sql_dsum("value")),
)
def q72_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 30-minute gap per user (C21).

    Spark's ``session_window`` merges events closer than the gap; the
    oracle is the classic gaps-and-islands rewrite (lag → new-session flag
    → running count → group), which defines identical sessions. Session end
    is last event + gap in both.

    Boundary semantics: Spark sessions are half-open ``[start, last+gap)``
    — an event at EXACTLY ``last + gap`` starts a new session — so the
    oracle's new-session test is ``>=`` the gap, not ``>``. The running-sum
    window orders by ``(ts, event_id)`` to match the LAG's tiebreak, so
    duplicate timestamps at a session boundary number deterministically.
    """
    ev = t(spark, sf_dir, "events")
    sw = F.session_window("ts", "30 minutes")
    return (
        ev.groupBy(sw.alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            dsum(F.col("value")).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


@query(
    "q73_stream_static_join",
    oracle="""
    SELECT n_name,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           {v} AS sum_value
    FROM events JOIN nation ON CAST(user_id % 25 AS INTEGER) = n_nationkey
    GROUP BY n_name
    """.format(v=sql_dsum("value")),
)
def q73_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join + aggregation (C23).

    In streaming form the ``nation`` side is a static broadcast rebuilt per
    micro-batch; the batch formulation is the identical logical plan. The
    dimension is broadcast → the event stream never shuffles for the join.
    """
    ev = t(spark, sf_dir, "events").withColumn(
        "nkey", (F.col("user_id") % 25).cast("int")
    )
    n = F.broadcast(t(spark, sf_dir, "nation"))
    return (
        ev.join(n, F.col("nkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            dsum(F.col("value")).alias("sum_value"),
        )
    )


@query(
    "q74_event_dedup",
    oracle="""
    SELECT user_id, event_type,
           CAST(MIN(event_id) AS BIGINT) AS first_event_id,
           MIN(ts) AS first_ts,
           CAST(COUNT(*) AS BIGINT) AS n_dupes
    FROM events
    GROUP BY user_id, event_type
    """,
)
def q74_event_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first dedup per (user, event_type) (C16/C22 streaming twin).

    Streaming form is ``dropDuplicatesWithinWatermark([...])``; the batch
    twin picks the deterministic first event per key (min event_id / ts) so
    the oracle hash-matches. One hash-aggregate shuffle on the dedup key.
    """
    ev = t(spark, sf_dir, "events")
    return ev.groupBy("user_id", "event_type").agg(
        F.min("event_id").cast("bigint").alias("first_event_id"),
        F.min("ts").alias("first_ts"),
        F.count(F.lit(1)).cast("bigint").alias("n_dupes"),
    )


def click_purchase_interval_join(clicks: DataFrame, purchases: DataFrame) -> DataFrame:
    """Interval join: every (click, purchase) pair of the same user with
    the purchase 0–30 minutes after the click. The SAME builder serves the
    batch registry query (q77) and the watermarked stream-stream twin in
    the equivalence harness — equi key ``user_id`` plus an event-time
    range condition, exactly the form Structured Streaming's stream-stream
    join supports (the range bound is what lets the state store evict).

    Scale: one shuffle per side on ``user_id`` (sort-merge with the range
    as a secondary condition); output is bounded by the time window, not
    the cross product. Streaming, the 30-minute bound + watermark caps
    state at one window of events per side.
    """
    return (
        clicks.alias("c")
        .join(
            purchases.alias("p"),
            (F.col("c.user_id") == F.col("p.user_id"))
            & (F.col("p.ts") >= F.col("c.ts"))
            & (F.col("p.ts") <= F.col("c.ts") + F.expr("INTERVAL 30 MINUTES")),
        )
        .select(
            F.col("c.user_id").alias("user_id"),
            F.col("c.event_id").alias("click_id"),
            F.col("p.event_id").alias("purchase_id"),
            (epoch_seconds(F.col("p.ts")) - epoch_seconds(F.col("c.ts")))
            .cast("bigint")
            .alias("gap_s"),
        )
    )


@query(
    "q77_stream_stream_interval_join",
    oracle="""
    SELECT c.user_id,
           c.event_id AS click_id,
           p.event_id AS purchase_id,
           CAST(date_diff('second', c.ts, p.ts) AS BIGINT) AS gap_s
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts
     AND p.ts <= c.ts + INTERVAL '30 minutes'
    """,
)
def q77_stream_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join, batch-equivalent form (C23): clicks ⋈
    purchases of the same user within 30 minutes. The streaming twin runs
    this exact builder on two watermarked file streams in
    ``tests/test_streaming_e2e.py::test_stream_stream_join`` and asserts
    batch/stream equality; this registry entry gives the capability its
    DuckDB oracle. Output rows are unique by (click_id, purchase_id) — no
    tie-break needed.
    """
    ev = t(spark, sf_dir, "events").select("ts", "user_id", "event_type", "event_id")
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    return click_purchase_interval_join(clicks, purchases)


@query(
    "q79_late_data_audit",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts < MAX(ts) OVER (
                    PARTITION BY user_id ORDER BY event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                  ) - INTERVAL '1 hour'
                  THEN 1 ELSE 0 END AS is_late
      FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(is_late) AS BIGINT) AS n_late
    FROM flagged
    GROUP BY user_id
    """,
)
def q79_late_data_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-data audit (C22 companion): how many events WOULD a 1-hour
    watermark drop? An event is late when its event time sits more than
    the watermark delay behind the maximum event time already seen in its
    user's stream — ``event_id`` is the arrival-order proxy the batch
    fixture provides. This is the sizing query you run BEFORE picking a
    watermark: the late count is the data you'd lose at each delay.

    Scale: one window + one aggregation, both keyed on high-cardinality
    ``user_id``; the running max uses an UNBOUNDED-to-1-PRECEDING frame
    (first event is never late — empty frame → NULL → not late on both
    engines, no COALESCE divergence).
    """
    from pyspark.sql import Window as W

    ev = t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    flagged = ev.withColumn(
        "is_late",
        F.when(
            F.col("ts")
            < F.max("ts").over(w) - F.expr("INTERVAL 1 HOUR"),
            1,
        ).otherwise(0),
    )
    return flagged.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum("is_late").cast("bigint").alias("n_late"),
    )


def click_purchase_interval_join_outer(
    clicks: DataFrame, purchases: DataFrame
) -> DataFrame:
    """LEFT OUTER interval join: every click, null-extended when no
    purchase by the same user follows within 30 minutes. Same shape as
    :func:`click_purchase_interval_join` but preserving unmatched clicks —
    streaming, this is the form whose null rows can only be emitted once
    the watermark passes ``click.ts + 30min`` (state-store eviction proves
    the match can never arrive). The streaming twin
    (``tests/test_streaming_e2e.py::test_stream_stream_left_outer_join``)
    asserts exactly that emission rule against this batch builder.

    Scale: identical to the inner form — one shuffle per side on
    ``user_id``, state bounded by the 30-minute range + watermark; the
    outer tier adds no extra shuffle, only deferred null emission.
    """
    return (
        clicks.alias("c")
        .join(
            purchases.alias("p"),
            (F.col("c.user_id") == F.col("p.user_id"))
            & (F.col("p.ts") >= F.col("c.ts"))
            & (F.col("p.ts") <= F.col("c.ts") + F.expr("INTERVAL 30 MINUTES")),
            "left_outer",
        )
        .select(
            F.col("c.user_id").alias("user_id"),
            F.col("c.event_id").alias("click_id"),
            F.col("c.ts").alias("click_ts"),
            F.col("p.event_id").cast("bigint").alias("purchase_id"),
            (epoch_seconds(F.col("p.ts")) - epoch_seconds(F.col("c.ts")))
            .cast("bigint")
            .alias("gap_s"),
        )
    )


@query(
    "q89_stream_stream_left_outer",
    oracle="""
    SELECT c.user_id AS user_id,
           c.event_id AS click_id,
           c.ts AS click_ts,
           CAST(p.event_id AS BIGINT) AS purchase_id,
           CAST(date_diff('second', c.ts, p.ts) AS BIGINT) AS gap_s
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts
     AND p.ts <= c.ts + INTERVAL 30 MINUTE
    """,
)
def q89_stream_stream_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join, batch-equivalent form
    (C23's outer tier): clicks with their purchases within 30 minutes,
    unmatched clicks kept with null purchase columns. Unique by
    (click_id, purchase_id) — no tie-break needed. The watermarked
    streaming twin runs the same builder and additionally asserts the
    null-emission-after-watermark rule streaming adds.
    """
    ev = t(spark, sf_dir, "events").select("ts", "user_id", "event_type", "event_id")
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    return click_purchase_interval_join_outer(clicks, purchases)


def click_purchase_interval_join_full(
    clicks: DataFrame, purchases: DataFrame
) -> DataFrame:
    """FULL OUTER interval join — the last stream-stream join mode Spark
    supports: every click (null-extended when no purchase follows within
    30 minutes) AND every purchase (null-extended when no click preceded
    it within 30 minutes). Streaming, the null-emission timing differs
    per side: an unmatched CLICK waits for the watermark to pass
    ``click.ts + 30min`` (its match window), an unmatched PURCHASE waits
    only for ``purchase.ts`` (no later click can satisfy
    ``c.ts <= p.ts``). The streaming twin
    (``tests/test_streaming_e2e.py::test_stream_stream_full_outer_join``)
    asserts both emission rules against this batch builder, across a
    checkpoint restart.

    Scale: same single shuffle per side on ``user_id`` as the inner/left
    forms; both sides' state is watermark-bounded (the interval condition
    gives Catalyst an eviction predicate for each side).
    """
    return (
        clicks.alias("c")
        .join(
            purchases.alias("p"),
            (F.col("c.user_id") == F.col("p.user_id"))
            & (F.col("p.ts") >= F.col("c.ts"))
            & (F.col("p.ts") <= F.col("c.ts") + F.expr("INTERVAL 30 MINUTES")),
            "full_outer",
        )
        .select(
            F.coalesce(F.col("c.user_id"), F.col("p.user_id")).alias("user_id"),
            F.col("c.event_id").cast("bigint").alias("click_id"),
            F.col("c.ts").alias("click_ts"),
            F.col("p.event_id").cast("bigint").alias("purchase_id"),
            F.col("p.ts").alias("purchase_ts"),
            (epoch_seconds(F.col("p.ts")) - epoch_seconds(F.col("c.ts")))
            .cast("bigint")
            .alias("gap_s"),
        )
    )


@query(
    "q106_stream_stream_full_outer",
    oracle="""
    SELECT COALESCE(c.user_id, p.user_id) AS user_id,
           CAST(c.event_id AS BIGINT) AS click_id,
           c.ts AS click_ts,
           CAST(p.event_id AS BIGINT) AS purchase_id,
           p.ts AS purchase_ts,
           CAST(date_diff('second', c.ts, p.ts) AS BIGINT) AS gap_s
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    FULL JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts
     AND p.ts <= c.ts + INTERVAL 30 MINUTE
    """,
)
def q106_stream_stream_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream FULL OUTER interval join, batch-equivalent form
    (C23's last uncovered join mode): clicks ⟗ purchases within 30
    minutes, unmatched rows kept null-extended on BOTH sides. Unique by
    (click_id, purchase_id) — no tie-break needed. The watermarked
    streaming twin runs the same builder and additionally asserts each
    side's null-emission-after-watermark rule, with checkpoint resume.
    """
    ev = t(spark, sf_dir, "events").select("ts", "user_id", "event_type", "event_id")
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    return click_purchase_interval_join_full(clicks, purchases)


@query("q123_hll_rollup", oracle=None)  # sketch bytes are engine-specific
def q123_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-tier hierarchical rollup (C7 × q76): DAILY distinct-user
    estimates folded from HOURLY HyperLogLog sketches — the COUNT
    DISTINCT that q76's sum/count/max rollup cannot express, because
    distincts don't add. HLL registers max-merge, which is commutative,
    associative, and idempotent, so the fold is not approximately right
    but IDENTICAL to sketching the raw day directly (the pytest twin
    asserts estimate equality, not a tolerance) — the property that
    lets a continuous aggregate maintain distinct counts from partials
    at 100 TB. State per (hour, type): one fixed-size sketch.

    Rows-only for the driver (sketch internals are engine-specific);
    the estimate itself is also sanity-bounded against the exact
    distinct count in the twin.
    """
    ev = t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour"),
        "event_type",
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    daily = hourly.groupBy(
        F.date_trunc("day", "hour").alias("day"),
        "event_type",
    ).agg(F.hll_union_agg("sk").alias("sk"))
    return daily.select(
        "day",
        "event_type",
        F.hll_sketch_estimate("sk").cast("bigint").alias("est_users"),
    )

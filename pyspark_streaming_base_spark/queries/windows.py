"""Window-function operator coverage (SURVEY.md §2C C9, C10 per-group top-k).

Every window uses a *total* order (tie-break on a unique key) so ranking
functions are deterministic and hash-comparable against the DuckDB oracle.

Scale note (applies to all): a window = one shuffle on its partition keys +
a per-partition sort. Windows sharing (partitionBy, orderBy) reuse one
exchange; a window with no partitionBy collapses to a single task and is
forbidden at 100 TB (none below does that).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from pyspark_streaming_base_spark.queries import query
from pyspark_streaming_base_spark.queries._exact import (
    dround,
    scaled,
    sql_dround,
    unscale,
)
from pyspark_streaming_base_spark.queries._tables import t

#: Pair-space bound for q37: correlate only the top-N most active users.
#: N fixes the pair count at N(N−1)/2 regardless of corpus size — the
#: blocking story the unbounded all-users self-join lacks.
_CORR_TOP_USERS = 8


@query(
    "q36_resample_ffill",
    oracle="""
    WITH hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS h,
             CAST(SUM(CAST(ROUND(value * 1000000.0, 0) AS BIGINT)) AS DOUBLE)
               / 1000000.0 AS hv
      FROM events WHERE user_id <= 10 GROUP BY user_id, date_trunc('hour', ts)
    ),
    bounds AS (
      SELECT user_id, min(h) AS h0, max(h) AS h1 FROM hourly GROUP BY user_id
    ),
    grid AS (
      SELECT user_id,
             CAST(unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS TIMESTAMP) AS h
      FROM bounds
    )
    SELECT g.user_id, g.h,
           LAST_VALUE(hourly.hv IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.h
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ffill,
           CAST(hourly.hv IS NOT NULL AS BIGINT) AS observed
    FROM grid g
    LEFT JOIN hourly ON g.user_id = hourly.user_id AND g.h = hourly.h
    """,
)
def q36_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample to an hourly grid + forward-fill (gap filling) —
    the fixed-grid densification every downstream feature pipeline wants
    and Spark has no built-in for.

    Composition: hourly exact sums → per-key bounds → ``sequence`` +
    ``explode`` generates the dense grid executor-side (fan-out bounded by
    each key's own time span, never a global range) → left join observed
    hours → ``last(…, ignorenulls)`` carries values across gaps.

    Scale: grid generation is O(hours-per-key) per row with no shuffle;
    the join and the fill window both shuffle on user_id once (same key →
    AQE can reuse partitioning). The filled value is an exact hourly sum,
    so the carry is deterministic.
    """
    ev = t(spark, sf_dir, "events").filter(F.col("user_id") <= 10)
    hourly = (
        ev.groupBy("user_id", F.date_trunc("hour", "ts").alias("h"))
        .agg(unscale(F.sum(scaled(F.col("value")))).alias("hv"))
    )
    grid = (
        hourly.groupBy("user_id")
        .agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
        .select(
            "user_id",
            F.explode(
                F.sequence(F.col("h0"), F.col("h1"), F.expr("interval 1 hour"))
            ).alias("h"),
        )
    )
    joined = grid.join(hourly, ["user_id", "h"], "left")
    w = (
        W.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return joined.select(
        "user_id",
        "h",
        F.last("hv", ignorenulls=True).over(w).alias("v_ffill"),
        F.col("hv").isNotNull().cast("bigint").alias("observed"),
    )


@query(
    "q37_user_correlation",
    oracle=f"""
    WITH top_users AS (
      SELECT user_id FROM events
      GROUP BY user_id
      ORDER BY COUNT(*) DESC, user_id
      LIMIT {_CORR_TOP_USERS}
    ),
    hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS h,
             CAST(SUM(CAST(ROUND(value * 1000000.0, 0) AS BIGINT)) AS DOUBLE)
               / 1000000.0 AS hv
      FROM events
      WHERE user_id IN (SELECT user_id FROM top_users)
      GROUP BY user_id, date_trunc('hour', ts)
    ),
    pairs AS (
      SELECT a.user_id AS user_a, b.user_id AS user_b,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(ROUND(a.hv * 1000000.0, 0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sx,
             CAST(SUM(CAST(ROUND(b.hv * 1000000.0, 0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sy,
             CAST(SUM(CAST(ROUND(a.hv * b.hv * 1000000.0, 0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sxy,
             CAST(SUM(CAST(ROUND(a.hv * a.hv * 1000000.0, 0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sxx,
             CAST(SUM(CAST(ROUND(b.hv * b.hv * 1000000.0, 0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS syy
      FROM hourly a JOIN hourly b ON a.h = b.h AND a.user_id < b.user_id
      GROUP BY a.user_id, b.user_id
    )
    SELECT user_a, user_b, CAST(n AS BIGINT) AS n_hours,
           FLOOR(((n * sxy - sx * sy)
                 / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)))
                 * 1000000.0 + 0.5) / 1000000.0 AS corr_r
    FROM pairs
    WHERE (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
    """,
)
def q37_user_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation of hourly activity between users —
    computed from five deterministic scaled-int component sums instead of
    the built-in ``corr`` (whose streaming accumulation is
    order-dependent and would not hash-match the oracle). Per-row
    products are identical IEEE doubles on both engines; the component
    sums are order-independent int64; the closed-form combine + IEEE
    sqrt/divide is then bit-deterministic, and the final 6-dp round is
    safe because its input already agrees bit-for-bit.

    Scale — pairs bounded BY CONSTRUCTION, not by a demo cap: the pair
    space is restricted to the top-:data:`_CORR_TOP_USERS` users by event
    count, computed distributively (per-user counts → global top-N via
    ``TakeOrderedAndProject``: each map task keeps N candidate rows, one
    N-row merge — no full sort) and applied as a broadcast semi-join, so
    the events scan never shuffles for the filter. The hour-aligned
    self-join is then O(N²) per hour with N fixed, whatever the corpus
    size; component aggregation is map-side combined per pair. The
    selection is deterministic (count desc, user_id tiebreak) and
    mirrored exactly in the oracle's top_users CTE. Zero-variance pairs
    are excluded on both sides (NaN vs NULL divergence).
    """
    ev_all = t(spark, sf_dir, "events")
    top_users = (
        ev_all.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("user_id"))
        .limit(_CORR_TOP_USERS)
        .select("user_id")
    )
    ev = ev_all.join(F.broadcast(top_users), "user_id", "semi")
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).agg(unscale(F.sum(scaled(F.col("value")))).alias("hv"))
    a = hourly.select(
        F.col("user_id").alias("user_a"), "h", F.col("hv").alias("xv")
    )
    b = hourly.select(
        F.col("user_id").alias("user_b"), "h", F.col("hv").alias("yv")
    )
    j = a.join(b, "h").filter(F.col("user_a") < F.col("user_b"))

    def ssum(c):  # deterministic scaled component sum
        return unscale(F.sum(scaled(c)))

    comp = j.groupBy("user_a", "user_b").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        ssum(F.col("xv")).alias("sx"),
        ssum(F.col("yv")).alias("sy"),
        ssum(F.col("xv") * F.col("yv")).alias("sxy"),
        ssum(F.col("xv") * F.col("xv")).alias("sxx"),
        ssum(F.col("yv") * F.col("yv")).alias("syy"),
    )
    varx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    corr = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt(varx) * F.sqrt(vary)
    )
    return (
        comp.filter((varx > 0) & (vary > 0))
        .select(
            "user_a",
            "user_b",
            F.col("n").cast("bigint").alias("n_hours"),
            dround(corr).alias("corr_r"),
        )
    )


@query(
    "q30_topk_per_group",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice, rn
    FROM (
      SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey
             ) AS BIGINT) AS rn
      FROM orders
    )
    WHERE rn <= 3
    """,
)
def q30_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer via row_number (C9 ranking + C10 top-k).

    Scale: rank-then-filter pushes ``WindowGroupLimit`` into the shuffle in
    Spark 3.5+/4.x — each map task keeps only 3 rows per customer before the
    exchange.
    """
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        t(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 3)
        .select(
            F.col("o_custkey").alias("c_custkey"), "o_orderkey", "o_totalprice", "rn"
        )
    )


@query(
    "q31_running_total",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(SUM(CAST(ROUND(l_quantity * 1000000.0, 0) AS BIGINT)) OVER (
             PARTITION BY l_suppkey
             ORDER BY l_shipdate, l_orderkey, l_linenumber
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) / 1000000.0 AS running_qty
    FROM lineitem
    WHERE l_suppkey <= 20
    """,
)
def q31_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum per supplier over ship order (C9 frames).

    The ROWS frame over a total order (shipdate, orderkey, linenumber) makes
    every prefix sum well-defined; decimal accumulation keeps it exact.
    """
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_suppkey") <= 20)
        .select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            unscale(F.sum(scaled(F.col("l_quantity"))).over(w)).alias("running_qty"),
        )
    )


@query(
    "q32_lag_lead",
    oracle="""
    SELECT user_id, event_id, value,
           LAG(value)  OVER w AS prev_value,
           LEAD(value) OVER w AS next_value,
           value - COALESCE(LAG(value) OVER w, value) AS delta
    FROM events
    WHERE user_id % 10 = 0
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q32_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead navigation per user over event time (C9 analytic).

    Raw double values pass through untouched, so no decimal detour needed;
    subtraction of identical doubles is IEEE-exact on both engines.
    """
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ev = t(spark, sf_dir, "events").filter(F.col("user_id") % 10 == 0)
    prev = F.lag("value").over(w)
    return ev.select(
        "user_id",
        "event_id",
        "value",
        prev.alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (F.col("value") - F.coalesce(prev, F.col("value"))).alias("delta"),
    )


@query(
    "q33_rank_ntile",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CAST(RANK()       OVER w AS BIGINT) AS bal_rank,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS bal_dense_rank,
           CAST(NTILE(4)     OVER w AS BIGINT) AS bal_quartile,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS bal_rownum
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    """,
)
def q33_rank_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile / row_number in one pass (C9).

    All four share one (partition, order) spec → Catalyst plans a single
    sort + window operator, not four.
    """
    w = W.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.rank().over(w).cast("bigint").alias("bal_rank"),
        F.dense_rank().over(w).cast("bigint").alias("bal_dense_rank"),
        F.ntile(4).over(w).cast("bigint").alias("bal_quartile"),
        F.row_number().over(w).cast("bigint").alias("bal_rownum"),
    )


@query(
    "q34_sliding_frame",
    oracle="""
    SELECT user_id, event_id,
           CAST(SUM(CAST(ROUND(value * 1000000.0, 0) AS BIGINT)) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) / 1000000.0 AS moving_sum3,
           CAST(COUNT(*) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS frame_n
    FROM events
    WHERE user_id % 20 = 0
    """,
)
def q34_sliding_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded sliding ROWS frame — 3-event moving sum per user (C9)."""
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, W.currentRow)
    )
    ev = t(spark, sf_dir, "events").filter(F.col("user_id") % 20 == 0)
    return ev.select(
        "user_id",
        "event_id",
        unscale(F.sum(scaled(F.col("value"))).over(w)).alias("moving_sum3"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("frame_n"),
    )


@query(
    "q69_rank_distribution",
    oracle="""
    SELECT o_custkey, o_orderkey,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume_d
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
)
def q69_rank_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-rank window functions (C9: percent_rank + cume_dist):
    where each order sits in its customer's price distribution.

    Both functions are integer-ratio valued ((rank−1)/(n−1), rank/n) so
    the doubles are bit-identical cross-engine; the ORDER BY carries the
    unique o_orderkey tiebreak (determinism invariant 5).

    Scale: one shuffle on the HIGH-cardinality o_custkey — never a
    handful-of-values key (the q59 lesson); frames are whole-partition,
    computed in one pass per group.
    """
    w = W.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume_d"),
    )


@query(
    "q99_resample_interpolate",
    oracle="""
    WITH hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS h,
             CAST(SUM(CAST(ROUND(value * 1000000.0, 0) AS BIGINT)) AS DOUBLE)
               / 1000000.0 AS hv
      FROM events WHERE user_id <= 10 GROUP BY user_id, date_trunc('hour', ts)
    ),
    bounds AS (
      SELECT user_id, min(h) AS h0, max(h) AS h1 FROM hourly GROUP BY user_id
    ),
    grid AS (
      SELECT user_id,
             CAST(unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS TIMESTAMP) AS h
      FROM bounds
    ),
    ctx AS (
      SELECT g.user_id, g.h, hourly.hv,
             LAST_VALUE(hourly.hv IGNORE NULLS) OVER wp AS pv,
             LAST_VALUE(CASE WHEN hourly.hv IS NOT NULL THEN g.h END IGNORE NULLS)
               OVER wp AS ph,
             FIRST_VALUE(hourly.hv IGNORE NULLS) OVER wf AS nv,
             FIRST_VALUE(CASE WHEN hourly.hv IS NOT NULL THEN g.h END IGNORE NULLS)
               OVER wf AS nh
      FROM grid g LEFT JOIN hourly ON g.user_id = hourly.user_id AND g.h = hourly.h
      WINDOW wp AS (PARTITION BY g.user_id ORDER BY g.h
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wf AS (PARTITION BY g.user_id ORDER BY g.h
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, h,
           CAST(hv IS NOT NULL AS BIGINT) AS observed,
           FLOOR((CASE WHEN hv IS NOT NULL THEN hv
                      ELSE pv + (nv - pv)
                           * (CAST(date_diff('second', ph, h) AS DOUBLE)
                              / CAST(date_diff('second', ph, nh) AS DOUBLE))
                 END) * 1000000.0 + 0.5) / 1000000.0 AS v_interp_r
    FROM ctx
    """,
)
def q99_resample_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample + LINEAR interpolation across gaps (the companion
    to q36's forward-fill — the other standard gap policy). Each missing
    grid hour takes ``prev + (next-prev)·frac`` between its nearest
    observed neighbors; grid bounds are each key's own min/max observed
    hour, so interior gaps always have both neighbors and the expression
    is total.

    Determinism: neighbor values are exact hourly sums; the single
    interpolation expression evaluates the same IEEE doubles on both
    engines and rounds once at the end. The time fraction uses
    whole-second epoch differences (`epoch_seconds` — tz-free because
    they're differences).

    Scale: identical shape to q36 — grid fan-out is per-key-bounded, one
    user_id shuffle shared by the join and both fill windows (forward and
    backward frames over the same partitioning — Spark plans ONE sort).
    """
    from pyspark_streaming_base_spark.queries._exact import epoch_seconds

    ev = t(spark, sf_dir, "events").filter(F.col("user_id") <= 10)
    hourly = ev.groupBy("user_id", F.date_trunc("hour", "ts").alias("h")).agg(
        unscale(F.sum(scaled(F.col("value")))).alias("hv")
    )
    grid = (
        hourly.groupBy("user_id")
        .agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
        .select(
            "user_id",
            F.explode(
                F.sequence(F.col("h0"), F.col("h1"), F.expr("interval 1 hour"))
            ).alias("h"),
        )
    )
    joined = grid.join(hourly, ["user_id", "h"], "left")
    wp = (
        W.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wf = (
        W.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    obs_h = F.when(F.col("hv").isNotNull(), F.col("h"))
    ctx = joined.select(
        "user_id",
        "h",
        "hv",
        F.last("hv", ignorenulls=True).over(wp).alias("pv"),
        F.last(obs_h, ignorenulls=True).over(wp).alias("ph"),
        F.first("hv", ignorenulls=True).over(wf).alias("nv"),
        F.first(obs_h, ignorenulls=True).over(wf).alias("nh"),
    )
    frac = (
        (epoch_seconds(F.col("h")) - epoch_seconds(F.col("ph"))).cast("double")
        / (epoch_seconds(F.col("nh")) - epoch_seconds(F.col("ph"))).cast("double")
    )
    return ctx.select(
        "user_id",
        "h",
        F.col("hv").isNotNull().cast("bigint").alias("observed"),
        dround(
            F.when(F.col("hv").isNotNull(), F.col("hv")).otherwise(
                F.col("pv") + (F.col("nv") - F.col("pv")) * frac
            )
        ).alias("v_interp_r"),
    )


#: EWMA window: smoothing factor 1/2 over the most recent 20 events.
#: Every weight is an exact power of two (newest row 2^-1, oldest
#: surviving row 2^-(m-1), m ≤ 20), so the whole sum is computed in
#: EXACT integer arithmetic: 10^6-scaled values shifted left by (19-k)
#: — Σ xs·2^(19-k) = 2^19·Σ xs·2^-k fits int64 comfortably and the two
#: final divisions (by 2^19, then 10^6) are bit-deterministic IEEE ops,
#: so the double hash-matches the oracle with NO per-row float rounding.
_EWMA_LAST_N = 20
_EWMA_MAXSHIFT = _EWMA_LAST_N - 1


@query(
    "q110_ewma_smoothing",
    oracle=f"""
    WITH ranked AS (
      SELECT user_id, value,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS n_total
      FROM events
    ),
    win AS (
      SELECT user_id, value, rn, n_total,
             MAX(rn) OVER (PARTITION BY user_id) AS m
      FROM ranked WHERE rn <= {_EWMA_LAST_N}
    )
    SELECT user_id,
           CAST(max(n_total) AS BIGINT) AS n_events,
           CAST(SUM(
             CAST(ROUND(value * 1000000.0, 0) AS BIGINT)
             * (CAST(1 AS BIGINT) << ({_EWMA_MAXSHIFT} -
                 (CASE WHEN rn = m THEN m - 1 ELSE rn END)))
           ) AS DOUBLE) / {1 << _EWMA_MAXSHIFT} / 1000000.0 AS ewma
    FROM win GROUP BY user_id
    """,
)
def q110_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average per user (time-series
    extension): the current smoothed activity value under the standard
    recursion ``s_j = a*x_j + (1-a)*s_(j-1)``, evaluated in closed form
    as a weighted sum so it needs NO sequential fold — two window
    functions over the same (user_id, ts desc) sort and one aggregate.

    Cross-engine exactness is by construction, see the module constant
    note: a = 1/2 over the last 20 events keeps every weight an exact
    power of two, and the weighted sum is pure int64 arithmetic until
    two final deterministic divisions.

    Scale: per-user state is capped at 20 rows by the rank filter (the
    windowed tail IS the admission control — an unbounded recursion
    over a hot key would be the skew risk); both window functions and
    the final aggregate share one user_id exchange.
    """
    ev = t(spark, sf_dir, "events")
    wdesc = W.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    ranked = ev.select(
        "user_id",
        "value",
        F.row_number().over(wdesc).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("user_id")).alias("n_total"),
    )
    win = (
        ranked.filter(F.col("rn") <= _EWMA_LAST_N)
        .withColumn("m", F.max("rn").over(W.partitionBy("user_id")))
        .withColumn(
            "k",
            F.when(F.col("rn") == F.col("m"), F.col("m") - 1).otherwise(
                F.col("rn")
            ),
        )
    )
    term_int = scaled(F.col("value")) * F.expr(
        f"shiftleft(cast(1 as bigint), cast({_EWMA_MAXSHIFT} - k as int))"
    )
    return win.groupBy("user_id").agg(
        F.max("n_total").cast("bigint").alias("n_events"),
        (
            F.sum(term_int).cast("double")
            / F.lit(float(1 << _EWMA_MAXSHIFT))
            / F.lit(1000000.0)
        ).alias("ewma"),
    )


@query(
    "q113_funnel_progression",
    oracle="""
    WITH w1 AS (
      SELECT user_id, ts, event_type,
             MIN(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id) AS t_view
      FROM events
    ),
    w2 AS (
      SELECT *,
             MIN(CASE WHEN event_type = 'click' AND ts > t_view THEN ts END)
               OVER (PARTITION BY user_id) AS t_click
      FROM w1
    ),
    w3 AS (
      SELECT *,
             MIN(CASE WHEN event_type = 'purchase' AND ts > t_click THEN ts END)
               OVER (PARTITION BY user_id) AS t_purchase
      FROM w2
    )
    SELECT user_id,
           max(t_view) AS t_view,
           max(t_click) AS t_click,
           max(t_purchase) AS t_purchase,
           CAST(CASE WHEN max(t_purchase) IS NOT NULL THEN 3
                     WHEN max(t_click) IS NOT NULL THEN 2
                     WHEN max(t_view) IS NOT NULL THEN 1
                     ELSE 0 END AS BIGINT) AS steps
    FROM w3
    GROUP BY user_id
    """,
)
def q113_funnel_progression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel progression per user (path-analysis extension):
    how far each user advances through view → click → purchase with
    each step STRICTLY after the previous one — the sequential pattern
    q83's cogrouped counts don't capture.

    The sequential dependency (the qualifying click must follow the
    first view) is resolved without self-joins: three chained
    conditional-minimum windows over the SAME ``user_id`` partition
    spec, so Catalyst plans one exchange feeding three Window operators
    and the final per-user aggregate. At 100 TB this is a single
    events-scan shuffle — the naive per-step join chain would pay one
    per funnel stage. Timestamps are conditional minima, so the output
    is deterministic under ties.
    """
    ev = t(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    w = W.partitionBy("user_id")
    s1 = ev.withColumn(
        "t_view",
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
    )
    s2 = s1.withColumn(
        "t_click",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("ts") > F.col("t_view")),
                F.col("ts"),
            )
        ).over(w),
    )
    s3 = s2.withColumn(
        "t_purchase",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") > F.col("t_click")),
                F.col("ts"),
            )
        ).over(w),
    )
    steps = (
        F.when(F.col("t_purchase").isNotNull(), 3)
        .when(F.col("t_click").isNotNull(), 2)
        .when(F.col("t_view").isNotNull(), 1)
        .otherwise(0)
    )
    return s3.groupBy("user_id").agg(
        F.max("t_view").alias("t_view"),
        F.max("t_click").alias("t_click"),
        F.max("t_purchase").alias("t_purchase"),
        F.max(steps).cast("bigint").alias("steps"),
    )


@query(
    "q115_ohlc_bars",
    oracle="""
    WITH r AS (
      SELECT user_id, date_trunc('hour', ts) AS h, value,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, date_trunc('hour', ts)
               ORDER BY ts, event_id) AS rn_a,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, date_trunc('hour', ts)
               ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events
    )
    SELECT user_id, h,
           max(CASE WHEN rn_a = 1 THEN value END) AS open,
           max(value) AS high,
           min(value) AS low,
           max(CASE WHEN rn_d = 1 THEN value END) AS close,
           CAST(count(*) AS BIGINT) AS n_events
    FROM r GROUP BY user_id, h
    """,
)
def q115_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per user (time-series resample extension): the
    open/high/low/close summary every downsampling pipeline wants, as
    ONE hash aggregate — ``min_by``/``max_by`` over the (ts, event_id)
    struct pick the first/last value deterministically (event_id breaks
    ts ties), high/low are plain extrema, so no window sort and no
    second pass. The oracle takes the row_number route (DuckDB's
    arg_min can't order by a struct) — same values, different plan, which
    is exactly what the hash comparison should prove.

    Scale: a single map-side-combinable aggregate on (user, hour) —
    min_by partials merge like any min — vs the window formulation's
    full per-partition sort. This is the C9-free way to express
    first/last per group.
    """
    ev = t(spark, sf_dir, "events")
    h = F.date_trunc("hour", F.col("ts"))
    order = F.struct(F.col("ts"), F.col("event_id"))
    return ev.groupBy("user_id", h.alias("h")).agg(
        F.min_by("value", order).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", order).alias("close"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )


@query(
    "q116_equidepth_histogram",
    oracle="""
    SELECT event_type, bucket,
           min(value) AS lo, max(value) AS hi,
           CAST(count(*) AS BIGINT) AS n_rows
    FROM (
      SELECT event_type, value,
             CAST(NTILE(10) OVER (
               PARTITION BY event_type ORDER BY value, event_id
             ) AS BIGINT) AS bucket
      FROM events
    )
    GROUP BY event_type, bucket
    """,
)
def q116_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram per event type (C7/C9 bridge): 10 buckets of
    equal row count with their value bounds — the histogram shape
    optimizers and drift monitors want when the distribution is skewed
    (q39's fixed-WIDTH bins put 90% of rows in one bin under skew;
    equal-depth bounds ARE the deciles).

    SIZE-GATED (``operators/histogram.py``): keys at or under 4M rows
    take the exact ``ntile`` path — a per-key sort over the (value,
    event_id) total order, identical semantics on both engines, which is
    what the oracle checks (every fixture key is far below the gate).
    A hot key above the gate flips IN-PLAN to ``approx_percentile`` cut
    points — O(accuracy) sketch state instead of a single-partition
    sort, so 100× growth degrades to approximate bounds instead of one
    straggler task (flat-wall-time evidence in ``tools/scale_smoke.py``).
    """
    from pyspark_streaming_base_spark.operators.histogram import (
        equidepth_histogram,
    )

    ev = t(spark, sf_dir, "events")
    return equidepth_histogram(
        ev, "event_type", "value", tie_col="event_id", n_buckets=10
    )


@query(
    "q118_trend_slope",
    oracle="""
    WITH b AS (
      SELECT user_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS es,
             CAST(round(value * 100) AS BIGINT) AS ys
      FROM events
    ),
    c AS (
      SELECT user_id, es, ys, min(es) OVER (PARTITION BY user_id) AS e0
      FROM b
    ),
    d AS (SELECT user_id, (es - e0) // 60 AS x, ys FROM c),
    s AS (
      SELECT user_id, count(*) AS n, sum(x) AS sx, sum(ys) AS sy,
             sum(x * ys) AS sxy, sum(x * x) AS sxx
      FROM d GROUP BY user_id
    )
    SELECT user_id, CAST(n AS BIGINT) AS n_events,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / (n * sxx - sx * sx) / 100.0 AS slope_per_min
    FROM s WHERE n * sxx - sx * sx <> 0
    """,
)
def q118_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity trend (time-series extension): the OLS slope of
    ``value`` against time, closed-form from five integer component
    sums — the q37-Pearson recipe applied to regression. Time is
    recentered per user (min-epoch subtraction keeps every product in
    comfortable int64 range; minutes resolution bounds Σx² for ~10⁶
    events/user) and values use their native 2-decimal scale, so the
    sums are EXACT integers and the one closing division is
    bit-deterministic. Degenerate users (all events in one minute) are
    excluded on both sides — their slope is 0/0.

    Scale: one groupBy(user) aggregate after a min-window on the same
    key (shared exchange); all state is six numbers per user.
    """
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").cast("timestamp").cast("long").alias("es"),
        F.round(F.col("value") * 100).cast("bigint").alias("ys"),
    )
    w = W.partitionBy("user_id")
    d = ev.withColumn("e0", F.min("es").over(w)).select(
        "user_id", F.expr("(es - e0) div 60").alias("x"), "ys"
    )
    s = d.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("ys").alias("sy"),
        F.sum(F.col("x") * F.col("ys")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return s.filter(den != 0).select(
        "user_id",
        F.col("n").cast("bigint").alias("n_events"),
        (
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            / den
            / F.lit(100.0)
        ).alias("slope_per_min"),
    )


@query(
    "q120_scd2_intervals",
    oracle="""
    WITH o AS (
      SELECT user_id, event_type AS state, ts, event_id,
             LAG(event_type) OVER w AS prev_state
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    f AS (
      SELECT user_id, state, ts,
             SUM(CASE WHEN prev_state IS NULL OR state <> prev_state
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING)
               AS run_id
      FROM o
    ),
    runs AS (
      SELECT user_id, run_id, min(state) AS state,
             min(ts) AS valid_from, CAST(count(*) AS BIGINT) AS n_events
      FROM f GROUP BY user_id, run_id
    )
    SELECT user_id, state, valid_from,
           LEAD(valid_from) OVER (
             PARTITION BY user_id ORDER BY run_id) AS valid_to,
           CAST(CASE WHEN LEAD(valid_from) OVER (
             PARTITION BY user_id ORDER BY run_id) IS NULL
             THEN 1 ELSE 0 END AS BIGINT) AS is_current,
           n_events
    FROM runs
    """,
)
def q120_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type 2 history (CDC extension): collapse
    each user's event stream into VALIDITY INTERVALS — one row per run
    of consecutive equal states, with ``valid_from``/``valid_to``
    half-open bounds and an ``is_current`` flag. This is the
    materialization a warehouse keeps for "what was the state at time
    T" joins (the as-of join q75 is the lookup side of this shape).

    Gaps-and-islands change detection: a lag-compare flags state
    changes, a running sum numbers the runs, runs aggregate to
    intervals, and one lead over the runs closes each interval with its
    successor's start. Every window shares the ``user_id`` partitioning
    — the same single-exchange property as q113, on a per-run rather
    than per-event output.
    """
    ev = t(spark, sf_dir, "events").select(
        "user_id", F.col("event_type").alias("state"), "ts", "event_id"
    )
    wo = W.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn(
        "chg",
        F.when(
            F.lag("state").over(wo).isNull()
            | (F.col("state") != F.lag("state").over(wo)),
            1,
        ).otherwise(0),
    ).withColumn("run_id", F.sum("chg").over(wo.rowsBetween(W.unboundedPreceding, 0)))
    runs = flagged.groupBy("user_id", "run_id").agg(
        F.min("state").alias("state"),
        F.min("ts").alias("valid_from"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    wr = W.partitionBy("user_id").orderBy("run_id")
    return runs.select(
        "user_id",
        "state",
        "valid_from",
        F.lead("valid_from").over(wr).alias("valid_to"),
        F.when(F.lead("valid_from").over(wr).isNull(), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("is_current"),
        "n_events",
    )


# ---------------------------------------------------------------------------
# Interval union / coverage (C9 extension)
# ---------------------------------------------------------------------------


@query(
    "q149_interval_coverage",
    oracle="""
    WITH iv AS (
      SELECT user_id,
             ts AS s,
             ts + INTERVAL 1 SECOND * CAST(FLOOR(value) AS BIGINT) AS e
      FROM events WHERE event_type = 'view'
    ),
    marked AS (
      SELECT user_id, s, e,
             CASE WHEN s > MAX(e) OVER (
                    PARTITION BY user_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  OR MAX(e) OVER (
                    PARTITION BY user_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                  THEN 1 ELSE 0 END AS new_island
      FROM iv
    ),
    islands AS (
      SELECT user_id, s, e,
             SUM(new_island) OVER (
               PARTITION BY user_id ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM marked
    ),
    spans AS (
      SELECT user_id, island,
             date_diff('second', MIN(s), MAX(e)) AS span_s
      FROM islands GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(SUM(span_s) AS BIGINT) AS covered_seconds
    FROM spans
    GROUP BY user_id
    """,
)
def q149_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval union / coverage (C9 extension): total COVERED time per
    user from overlapping activity intervals ([ts, ts + value sec) per
    'view' event) — the gaps-and-islands primitive behind utilization,
    SLA uptime, and watch-time metrics, where naive SUM(duration)
    double-counts overlaps. Islands form where an interval's start
    exceeds the running max of prior ends (strictly: touching intervals
    merge); each island contributes max(end) − min(start).

    Determinism: all arithmetic is whole-second epoch DIFFERENCES
    (timezone-free on NTZ data — the `_exact.py::epoch_seconds`
    contract); island boundaries compare exact timestamps with (s, e)
    ordering, so the island partition is identical cross-engine.

    Scale: both windows and both aggregates share ONE user_id-keyed
    partitioning (high-cardinality key — no q59-style two-pass needed);
    plan is one exchange + chained windows, the q113/q120 shape.
    """
    from pyspark_streaming_base_spark.queries._exact import epoch_seconds

    ev = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "view")
        .select(
            "user_id",
            F.col("ts").alias("s"),
            (
                F.col("ts")
                + F.make_interval(secs=F.floor(F.col("value")).cast("bigint"))
            ).alias("e"),
        )
    )
    w_prev = (
        W.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    w_run = (
        W.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    prev_max_e = F.max("e").over(w_prev)
    marked = ev.withColumn(
        "new_island",
        (prev_max_e.isNull() | (F.col("s") > prev_max_e)).cast("int"),
    )
    islands = marked.withColumn("island", F.sum("new_island").over(w_run))
    spans = islands.groupBy("user_id", "island").agg(
        (epoch_seconds(F.max("e")) - epoch_seconds(F.min("s"))).alias("span_s")
    )
    return spans.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_islands"),
        F.sum("span_s").cast("bigint").alias("covered_seconds"),
    )


_CV2_NUM = (
    "CAST(CAST(n_gaps AS DECIMAL(38,0)) * sg2"
    " - CAST(sg AS DECIMAL(38,0)) * CAST(sg AS DECIMAL(38,0)) AS DOUBLE)"
)


@query(
    "q179_interarrival_burstiness",
    oracle=f"""
    WITH e AS (
      SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es, ts, event_id
      FROM events
    ), g AS (
      SELECT user_id,
             es - LAG(es) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS gap
      FROM e
    ), s AS (
      SELECT user_id,
             CAST(COUNT(gap) AS BIGINT) AS n_gaps,
             CAST(SUM(gap) AS BIGINT) AS sg,
             SUM(CAST(gap AS DECIMAL(19,0)) * CAST(gap AS DECIMAL(19,0))) AS sg2
      FROM g WHERE gap IS NOT NULL GROUP BY user_id
    )
    SELECT user_id, n_gaps,
           {sql_dround('CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE)')}
             AS mean_gap_s,
           {sql_dround(f'({_CV2_NUM}) / (CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE))')}
             AS gap_cv2
    FROM s WHERE n_gaps >= 5 AND sg > 0
    ORDER BY gap_cv2 DESC, user_id LIMIT 20
    """,
)
def q179_interarrival_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 burstiest users by inter-arrival dispersion (time-series
    extension): per user, consecutive event gaps (whole seconds, the
    q118 epoch convention), their mean, and the squared coefficient of
    variation cv² = Var(g)/E[g]² — the standard burstiness measure
    (cv² = 1 ⇒ Poisson arrivals; ≫1 ⇒ bursts+silences, the bot/scraper
    signature; ≪1 ⇒ metronomic, the cron-job signature). Reported as
    cv² rather than cv: the closed form (n·Σg² − (Σg)²)/(Σg)² needs no
    sqrt, and cv² preserves the ordering cv would give.

    Exactness: gaps are exact int64 second diffs (any permutation of
    equal-timestamp events yields the SAME gap multiset — internal gaps
    of a tie-run are 0 and boundary gaps are unchanged — so the (ts,
    event_id) tie-break removes even the harmless ambiguity); Σg² and
    the n·Σg² − (Σg)² numerator accumulate in DECIMAL(38,0) BEFORE any
    cast (the q165 overflow recipe — Σg² alone can pass int64 at ~10⁶
    gaps of ~10⁵ s), and the final single divisions go through
    ``dround`` (CLAUDE.md invariant 1), which also makes the top-20
    ORDER BY compare GRIDDED values (invariant 9), tie-broken on
    user_id. Degenerate users (n_gaps < 5, or all events in one second
    ⇒ Σg = 0) are excluded on both sides.

    Scale: one lag window + one aggregate, BOTH keyed on user_id — the
    window's exchange is reused by the groupBy (one shuffle total);
    state is three numbers per user; top-20 is TakeOrdered, never a
    global sort.
    """
    return interarrival_burstiness(t(spark, sf_dir, "events"))


def interarrival_burstiness(
    events: DataFrame, min_gaps: int = 5, top_k: int = 20
) -> DataFrame:
    """q179's operator body over any (user_id, ts, event_id) frame —
    factored out so the crafted-timestamp numpy mirror test
    (test_properties.py) drives the SAME expressions the registered
    query runs (the q175 convention)."""
    ev = events.select(
        "user_id",
        F.col("ts").cast("timestamp").cast("long").alias("es"),
        "ts",
        "event_id",
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select(
        "user_id", (F.col("es") - F.lag("es").over(w)).alias("gap")
    ).filter(F.col("gap").isNotNull())
    gd = F.col("gap").cast("decimal(19,0)")
    s = g.groupBy("user_id").agg(
        F.count("gap").cast("bigint").alias("n_gaps"),
        F.sum("gap").cast("bigint").alias("sg"),
        F.sum(gd * gd).alias("sg2"),
    )
    num = (
        F.col("n_gaps").cast("decimal(38,0)") * F.col("sg2")
        - F.col("sg").cast("decimal(38,0)") * F.col("sg").cast("decimal(38,0)")
    ).cast("double")
    return (
        s.filter((F.col("n_gaps") >= min_gaps) & (F.col("sg") > 0))
        .select(
            "user_id",
            "n_gaps",
            dround(
                F.col("sg").cast("double") / F.col("n_gaps").cast("double")
            ).alias("mean_gap_s"),
            dround(
                num / (F.col("sg").cast("double") * F.col("sg").cast("double"))
            ).alias("gap_cv2"),
        )
        .orderBy(F.col("gap_cv2").desc(), "user_id")
        .limit(top_k)
    )


@query(
    "q182_event_transitions",
    oracle="""
    WITH o AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events
    ), c AS (
      SELECT prev_type, event_type, CAST(COUNT(*) AS BIGINT) AS n_transitions
      FROM o WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    )
    SELECT prev_type, event_type, n_transitions,
           CAST(SUM(n_transitions) OVER (PARTITION BY prev_type) AS BIGINT)
             AS n_from,
           CAST(n_transitions AS DOUBLE)
             / SUM(n_transitions) OVER (PARTITION BY prev_type)
             AS p_transition
    FROM c
    """,
)
def q182_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-type transition matrix over per-user event
    streams (time-series/sessionization extension) — the empirical
    Markov chain behind funnel design and anomaly detection: for each
    (previous type → type) pair, the transition count and the
    row-normalized probability P(next | prev). A transition row that
    dwarfs its siblings is the dominant path (the funnel to optimize);
    a probability that shifts release-over-release is a behavioral
    drift alarm at the TRANSITION level, one step finer than q141's
    marginal event-type mix (two releases can keep identical marginals
    while users loop through them in a completely different order —
    marginal drift misses exactly what this measures).

    Exactness: integer transition counts + one single division per row
    (both operands exact) — bit-identical IEEE cross-engine. The lag
    order is (ts, event_id), the q120 convention; the transition
    MULTISET is insensitive only to equal-timestamp permutations that
    the unique event_id tie-break pins anyway.

    Scale: one lag window keyed on user_id (the q179/q120 exchange) →
    one map-side-combinable aggregate on (prev, next) — the shuffle
    after the window carries ≤ |types|² rows per task; the normalizing
    window runs over the |types|²-row aggregate, not the corpus.
    """
    ev = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    c = o.groupBy("prev_type", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_transitions")
    )
    w_from = W.partitionBy("prev_type")
    return c.select(
        "prev_type",
        "event_type",
        "n_transitions",
        F.sum("n_transitions").over(w_from).cast("bigint").alias("n_from"),
        (
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(w_from).cast("double")
        ).alias("p_transition"),
    )


@query(
    "q184_conversion_latency",
    oracle="""
    WITH t1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), t2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN t1 USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts > t1.t1
      GROUP BY e.user_id
    ), lat AS (
      SELECT CAST(floor(epoch(t2.t2)) - floor(epoch(t1.t1)) AS BIGINT) AS lat
      FROM t1 JOIN t2 USING (user_id)
    ), v AS (
      SELECT lat AS value, CAST(COUNT(*) AS BIGINT) AS c FROM lat GROUP BY lat
    ), cum AS (
      SELECT value,
             SUM(c) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS cm,
             SUM(c) OVER () AS n
      FROM v
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM lat) AS n_converted,
           (SELECT CAST(SUM(lat) AS DOUBLE) / COUNT(*) FROM lat)
             AS mean_latency_s,
           (SELECT CAST(MIN(lat) AS BIGINT) FROM lat) AS min_latency_s,
           (SELECT CAST(MAX(lat) AS BIGINT) FROM lat) AS max_latency_s,
           (SELECT CAST(MIN(value) AS BIGINT) FROM cum
             WHERE cm >= CEIL(0.5 * n)) AS p50_latency_s,
           (SELECT CAST(MIN(value) AS BIGINT) FROM cum
             WHERE cm >= CEIL(0.9 * n)) AS p90_latency_s
    """,
)
def q184_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View→purchase conversion-latency report (funnel/time-series
    extension): per user, seconds from the FIRST view to the first
    purchase strictly after it (q113's funnel semantics); reported as
    one row — converted-user count, mean, min/max, and EXACT p50/p90
    order statistics (percentile-disc: smallest value whose inclusive
    rank reaches ⌈p·n⌉). The latency distribution is the number a
    checkout-flow change moves; its tail percentile is the SLA.

    Exactness: latencies are exact int64 second diffs; mean is one
    single division; the percentile rank rule ⌈p·n⌉ is evaluated with
    the identical ceil-of-double on both engines and selects an ACTUAL
    data value (no interpolation, nothing to round).

    Scale: two user-keyed aggregates + one user-keyed join (one
    exchange class); percentiles run on the DISTINCT latency-value
    domain through the shared bucketed two-pass prefix sum
    (`_ecdf.pooled_cumulative_counts` — never a global-order window
    over rows); the final fold is three broadcast 1-row frames.
    """
    from pyspark_streaming_base_spark.queries._ecdf import (
        pooled_cumulative_counts,
    )

    ev = t(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts",
        F.col("ts").cast("timestamp").cast("long").alias("es"),
    )
    t1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"), F.min("es").alias("es1"))
    )
    t2 = (
        ev.join(t1, "user_id")
        .filter((F.col("event_type") == "purchase") & (F.col("ts") > F.col("t1")))
        .groupBy("user_id")
        .agg(F.min("es").alias("es2"))
    )
    lat = t1.join(t2, "user_id").select(
        (F.col("es2") - F.col("es1")).cast("bigint").alias("lat")
    )
    summary = lat.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_converted"),
        (F.sum("lat").cast("double") / F.count(F.lit(1))).alias(
            "mean_latency_s"
        ),
        F.min("lat").cast("bigint").alias("min_latency_s"),
        F.max("lat").cast("bigint").alias("max_latency_s"),
    )
    v = lat.groupBy(F.col("lat").alias("value")).agg(
        F.count(F.lit(1)).cast("bigint").alias("ca"),
        F.lit(0).cast("bigint").alias("cb"),
    )
    cum = pooled_cumulative_counts(v)
    pct = cum.agg(
        F.min(
            F.when(
                F.col("cum_a") >= F.ceil(F.lit(0.5) * F.col("na")), F.col("value")
            )
        )
        .cast("bigint")
        .alias("p50_latency_s"),
        F.min(
            F.when(
                F.col("cum_a") >= F.ceil(F.lit(0.9) * F.col("na")), F.col("value")
            )
        )
        .cast("bigint")
        .alias("p90_latency_s"),
    )
    return summary.crossJoin(F.broadcast(pct))


@query(
    "q186_ship_latency_by_priority",
    oracle="""
    WITH j AS (
      SELECT o_orderpriority AS priority,
             date_diff('day', CAST(o_orderdate AS DATE),
                       CAST(l_shipdate AS DATE)) AS lag
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ), v AS (
      SELECT priority, lag, CAST(COUNT(*) AS BIGINT) AS c
      FROM j GROUP BY priority, lag
    ), cum AS (
      SELECT priority, lag,
             SUM(c) OVER (PARTITION BY priority ORDER BY lag
                          ROWS UNBOUNDED PRECEDING) AS cm,
             SUM(c) OVER (PARTITION BY priority) AS n
      FROM v
    ), s AS (
      SELECT priority, CAST(COUNT(*) AS BIGINT) AS n_items,
             CAST(SUM(lag) AS DOUBLE) / COUNT(*) AS mean_lag_days,
             CAST(MIN(lag) AS BIGINT) AS min_lag_days,
             CAST(MAX(lag) AS BIGINT) AS max_lag_days
      FROM j GROUP BY priority
    ), p AS (
      SELECT priority,
             CAST(MIN(CASE WHEN cm >= CEIL(0.5 * n) THEN lag END) AS BIGINT)
               AS p50_lag_days,
             CAST(MIN(CASE WHEN cm >= CEIL(0.9 * n) THEN lag END) AS BIGINT)
               AS p90_lag_days
      FROM cum GROUP BY priority
    )
    SELECT s.priority, n_items, mean_lag_days, min_lag_days, max_lag_days,
           p50_lag_days, p90_lag_days
    FROM s JOIN p USING (priority)
    """,
)
def q186_ship_latency_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order→ship latency distribution per order priority (relational/
    SLA extension) — the grouped form of q184's exact-percentile recipe:
    per priority class, line-item count, mean/min/max day lag, and
    EXACT p50/p90 order statistics (percentile-disc, ⌈p·n⌉ rule). The
    per-priority tail percentile is the fulfillment SLA; the spread
    between priority classes is whether priority handling works at all.

    Exactness: day lags are exact integers (identical DATE-truncated
    day-boundary counts on both engines); mean is one single division;
    the percentile rank rule picks actual data values.

    Scale: one fact join (orders side is orderkey-keyed — at production
    bucketing this is the co-located join; here AQE picks the
    strategy) → per-(priority, lag) hash aggregate absorbs the fact
    volume map-side; the cumulative window partitions by priority over
    the DISTINCT day-lag domain, which is bounded by the CALENDAR SPAN
    (a few thousand rows per priority) regardless of corpus size — the
    legality condition for skipping the q184 bucketed two-pass here.
    Final fold joins two |priorities|-row aggregates.
    """
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.to_date("l_shipdate").alias("sd")
    )
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderpriority").alias("priority"),
        F.to_date("o_orderdate").alias("od"),
    )
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        "priority", F.datediff("sd", "od").cast("bigint").alias("lag")
    )
    v = j.groupBy("priority", "lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    w_cum = (
        W.partitionBy("priority")
        .orderBy("lag")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_all = W.partitionBy("priority")
    cum = v.select(
        "priority",
        "lag",
        F.sum("c").over(w_cum).alias("cm"),
        F.sum("c").over(w_all).alias("n"),
    )
    s = j.groupBy("priority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        (F.sum("lag").cast("double") / F.count(F.lit(1))).alias("mean_lag_days"),
        F.min("lag").cast("bigint").alias("min_lag_days"),
        F.max("lag").cast("bigint").alias("max_lag_days"),
    )
    p = cum.groupBy("priority").agg(
        F.min(
            F.when(F.col("cm") >= F.ceil(F.lit(0.5) * F.col("n")), F.col("lag"))
        )
        .cast("bigint")
        .alias("p50_lag_days"),
        F.min(
            F.when(F.col("cm") >= F.ceil(F.lit(0.9) * F.col("n")), F.col("lag"))
        )
        .cast("bigint")
        .alias("p90_lag_days"),
    )
    return s.join(F.broadcast(p), "priority")

"""UDF/UDAF surface (SURVEY.md §2B B8, §2C C25) + as-of join.

The UDF tiers, demonstrated in ascending cost order:

* built-in expressions (everything else in this package) — JVM, codegen;
* scalar/grouped-agg Pandas UDFs (here) — Arrow-batched, vectorized numpy;
* ``applyInPandas`` grouped-map (as-of join here, decode in multimodal);
* cogrouped ``applyInPandas`` (q83) — both sides of a key in one batch;
* row-at-a-time Python UDFs — deliberately ABSENT: never the right tool.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark_streaming_base_spark.queries import query
from pyspark_streaming_base_spark.queries._exact import epoch_seconds
from pyspark_streaming_base_spark.queries._tables import t


@query(
    "q67_groupwise_zscore",
    oracle="""
    WITH comp AS (
      SELECT user_id,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(ROUND(value * 1000000.0, 0) AS BIGINT)) AS DOUBLE)
               / 1000000.0 AS sx,
             CAST(SUM(CAST(ROUND(value * value * 1000000.0, 0) AS BIGINT)) AS DOUBLE)
               / 1000000.0 AS sxx
      FROM events GROUP BY user_id
    )
    SELECT e.user_id, e.event_id,
           ROUND((e.value - comp.sx / comp.n)
                 / SQRT(comp.sxx / comp.n - (comp.sx / comp.n) * (comp.sx / comp.n)),
                 6) AS z
    FROM events e JOIN comp ON e.user_id = comp.user_id
    WHERE comp.n > 1 AND comp.sxx / comp.n > (comp.sx / comp.n) * (comp.sx / comp.n)
    """,
)
def q67_groupwise_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map ``applyInPandas`` (C25's remaining tier): per-user
    z-score normalization, the canonical grouped-map example.

    Determinism: mean and variance come from scaled-int64 component sums
    computed with numpy inside the UDF — the SAME integers the oracle's
    SQL computes — so the derived doubles agree bit-for-bit and the final
    6-dp round is safe (a naive ``pdf.value.mean()/std()`` would sum in
    numpy's pairwise order and drift from the oracle near the grid).

    Scale: one shuffle on user_id; each group's columns cross to Python
    once via Arrow; output is row-for-row with the input.
    """
    ev = t(spark, sf_dir, "events").select("user_id", "event_id", "value")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"].to_numpy(dtype=np.float64)
        n = float(len(v))
        # floor(x+0.5) = round-half-away for the (all-positive) values,
        # matching DuckDB ROUND exactly; np.rint would round half-EVEN
        # and diverge on exact .5 ties
        sx = float(np.floor(v * 1e6 + 0.5).astype(np.int64).sum()) / 1e6
        sxx = float(np.floor(v * v * 1e6 + 0.5).astype(np.int64).sum()) / 1e6
        mean = sx / n
        var = sxx / n - mean * mean
        if n <= 1 or var <= 0:
            return pdf.iloc[0:0][["user_id", "event_id"]].assign(z=np.float64())
        z = np.round((v - mean) / np.sqrt(var), 6)
        return pd.DataFrame(
            {"user_id": pdf["user_id"], "event_id": pdf["event_id"], "z": z}
        )

    return ev.groupBy("user_id").applyInPandas(
        zscore, schema="user_id bigint, event_id bigint, z double"
    )


@query(
    "q28_udaf_weighted_avg",
    oracle="""
    WITH comp AS (
      SELECT l_returnflag,
             SUM(CAST(ROUND(l_extendedprice * l_quantity * 1000000.0, 0) AS BIGINT))
               AS sxq,
             SUM(CAST(ROUND(l_quantity * 1000000.0, 0) AS BIGINT)) AS sq
      FROM lineitem
      GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           ROUND((CAST(sxq AS DOUBLE) / 1000000.0)
                 / (CAST(sq AS DOUBLE) / 1000000.0), 4) AS w_avg_price
    FROM comp
    """,
)
def q28_udaf_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate Pandas UDF (C25 UDAF): quantity-weighted mean
    price per return flag.

    Arrow moves each group's columns once; numpy does the arithmetic.
    Determinism (CLAUDE.md invariant 1): the weighted average is derived
    from scaled-int64 component sums — sum(round(price·qty·10⁶)) and
    sum(round(qty·10⁶)) — computed identically by numpy here and by the
    oracle SQL, so the division and final 4-dp round see bit-identical
    doubles on both engines. A naive ``ROUND(SUM(double)/SUM(double))``
    would be order-dependent and could flip the round near a grid boundary.

    Scale: grouped-agg UDFs buffer each group's values in one worker —
    group cardinality and size must be modest (here: 3 groups). For
    high-cardinality groups, pre-reduce with built-ins and reserve the UDF
    for the final combine. Spark also forbids mixing grouped-agg Pandas
    UDFs with built-in aggregates in one ``agg`` — this query is UDAF-only.
    """

    @F.pandas_udf("double")
    def wavg(price: pd.Series, qty: pd.Series) -> float:
        p = price.to_numpy(dtype=np.float64)
        q = qty.to_numpy(dtype=np.float64)
        # floor(x+0.5) = round-half-away for the all-positive products,
        # matching DuckDB ROUND exactly (see q67)
        sxq = int(np.floor(p * q * 1e6 + 0.5).astype(np.int64).sum())
        sq = int(np.floor(q * 1e6 + 0.5).astype(np.int64).sum())
        return float(np.round((sxq / 1e6) / (sq / 1e6), 4))

    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(wavg("l_extendedprice", "l_quantity").alias("w_avg_price"))
    )


@query(
    "q29_scalar_pandas_udf",
    oracle="""
    SELECT o_orderkey,
           ROUND(LN(1.0 + o_totalprice) * 100.0, 6) AS price_score
    FROM orders
    WHERE o_orderkey % 50 = 0
    """,
)
def q29_scalar_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar Pandas UDF (C25/B8): vectorized per-row scoring via numpy.

    Exists to prove the Arrow scalar path; the identical expression is a
    one-liner in built-ins (q18) — which is what production code should
    use. Rounded to 6 dp to absorb libm last-ulp differences.
    """

    @F.pandas_udf("double")
    def score(total: pd.Series) -> pd.Series:
        return np.round(np.log1p(total) * 100.0, 6)

    return (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 50 == 0)
        .select("o_orderkey", score("o_totalprice").alias("price_score"))
    )


@query(
    "q75_asof_join",
    oracle="""
    SELECT p.user_id,
           p.event_id AS purchase_id,
           c.event_id AS click_id,
           CAST(date_diff('second', c.ts, p.ts) AS BIGINT) AS gap_s
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def q75_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (click→purchase attribution): for each purchase, the most
    recent click of the same user at or before the purchase time.

    Spark has no native ASOF JOIN; the scalable composition is the
    union-and-window trick: interleave both event kinds in one per-user
    time-ordered window and carry the last click forward — ONE shuffle on
    user_id, no range join, no per-group Python. (``merge_asof`` via
    ``applyInPandas`` is the fallback when the payload is too wide for a
    window carry.) DuckDB's native ASOF JOIN is the oracle.

    Scale: the window approach is O(n log n) per user partition vs the
    O(n·m) range join a naive theta-join would plan. Skewed users are
    AQE-split like any window partition.
    """
    from pyspark_streaming_base_spark.operators.asof import asof_backward_join

    ev = t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    joined = asof_backward_join(
        purchases,
        clicks,
        on=["user_id"],
        left_time="ts",
        right_time="ts",
        carry=["ts", "event_id"],
        right_tiebreak=["event_id"],
    )
    return joined.filter(F.col("r_ts").isNotNull()).select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("r_event_id").cast("bigint").alias("click_id"),
        (epoch_seconds(F.col("ts")) - epoch_seconds(F.col("r_ts")))
        .cast("bigint")
        .alias("gap_s"),
    )


@query(
    "q83_cogroup_funnel",
    oracle="""
    WITH c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
    p AS (
      SELECT user_id, MIN(ts) AS first_p, CAST(COUNT(*) AS BIGINT) AS n_p
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    ca AS (
      SELECT c.user_id,
             CAST(COUNT(*) AS BIGINT) AS n_c,
             CAST(COUNT(*) FILTER (
               WHERE p.first_p IS NULL OR c.ts < p.first_p
             ) AS BIGINT) AS n_before
      FROM c LEFT JOIN p USING (user_id)
      GROUP BY c.user_id
    )
    SELECT COALESCE(ca.user_id, p.user_id) AS user_id,
           COALESCE(ca.n_c, 0) AS n_clicks,
           COALESCE(p.n_p, 0) AS n_purchases,
           p.first_p AS first_purchase_ts,
           COALESCE(ca.n_before, 0) AS clicks_before_first_purchase
    FROM ca FULL JOIN p ON ca.user_id = p.user_id
    """,
)
def q83_cogroup_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped ``applyInPandas`` (the 4th and last Pandas API tier after
    scalar/grouped-agg/grouped-map — C25 complete): per-user click→purchase
    funnel joining BOTH groups of a cogroup in one Python function —
    clicks before the first purchase, purchase counts, first purchase
    time. Cogroup is the tool when per-key logic needs both sides at once
    and isn't expressible as a join (here it IS expressible, which is what
    makes the exact SQL oracle possible).

    Determinism: counts are integers; the only timestamp is a MIN —
    order-independent on both engines.

    Scale: one shuffle per side on ``user_id``, each key's two groups meet
    in one Arrow batch; the funnel math is O(group) numpy. Same caveat as
    all grouped Pandas ops: a single key's groups must fit one worker —
    guaranteed here by per-user cardinality, not assumed.
    """
    ev = t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts")

    def funnel(key: tuple, cdf: pd.DataFrame, pdf_: pd.DataFrame) -> pd.DataFrame:
        # When the query's OUTPUT columns go unused (e.g. a bare count()),
        # Catalyst prunes the cogroup INPUTS down to the grouping key, so
        # 'ts' may be absent. In exactly those plans the values computed
        # from it are unobservable, so guarding keeps the row count right
        # without changing any observable value.
        n_c, n_p = len(cdf.index), len(pdf_.index)
        p_ts = pdf_["ts"] if "ts" in pdf_.columns else None
        c_ts = cdf["ts"] if "ts" in cdf.columns else None
        first_p = p_ts.min() if (p_ts is not None and n_p) else pd.NaT
        n_before = (
            int((c_ts < first_p).sum())
            if (c_ts is not None and n_c and pd.notna(first_p))
            else n_c
        )
        return pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_clicks": [n_c],
                "n_purchases": [n_p],
                "first_purchase_ts": [first_p],
                "clicks_before_first_purchase": [n_before],
            }
        )

    return clicks.groupBy("user_id").cogroup(purchases.groupBy("user_id")).applyInPandas(
        funnel,
        schema=(
            "user_id bigint, n_clicks bigint, n_purchases bigint, "
            "first_purchase_ts timestamp, clicks_before_first_purchase bigint"
        ),
    )

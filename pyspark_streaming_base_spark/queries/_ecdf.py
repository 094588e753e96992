"""Pooled two-sample cumulative counts — THE one definition of the
bucketed two-pass prefix sum over a numeric value domain, shared by the
nonparametric drift statistics (q144 KS, q165 Cramér–von Mises, q166
Mann–Whitney). Each consumes the same (value, ca, cb, cum_a, cum_b,
na, nb) frame and differs only in the fold it applies.

Why two-pass (the q59 pattern): a single ``ORDER BY value`` window
serializes the whole domain through one task. Instead: (1) collapse to
the DISTINCT value domain (one aggregate), (2) local cumsum within
equi-width value buckets derived from a 1-row min/max broadcast
(bounded sort partitions), (3) carry-in = exclusive prefix over the
bucket-totals table (bucket-count rows, broadcast back). Identical to
the one-window formulation the oracles express; only the physical plan
differs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

#: Equi-width value buckets for the local-cumsum pass.
DEFAULT_BUCKETS = 64


def pooled_cumulative_counts(
    v: DataFrame, buckets: int = DEFAULT_BUCKETS, b_type: str = "bigint"
) -> DataFrame:
    """``v``: one row per DISTINCT value — ``(value, ca, cb)`` counts of
    the two samples at that value. Returns one row per value:
    ``(value, ca, cb, cum_a, cum_b, na, nb)`` with INCLUSIVE cumulative
    counts in value order and the two sample totals on every row
    (1-row broadcast). All integers — exact under any partitioning.

    ``b_type`` widens the second channel when its prefix sum can exceed
    int64 (q187 smuggles 10⁶-scaled revenue through ``cb``; a 100 TB
    corpus total is ~10²² > 2⁶³): pass ``"decimal(38,0)"`` and supply
    ``cb`` already in that type. The prefix sum is additive either way,
    and DECIMAL(38,0) keeps it exact to 10³⁸. The a-channel (customer /
    row counts) stays int64 — counting past 2⁶³ rows is not a real
    regime.
    """
    mm = v.agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
    b = v.crossJoin(F.broadcast(mm)).select(
        "value",
        "ca",
        "cb",
        F.least(
            F.lit(buckets - 1),
            F.floor(
                ((F.col("value") - F.col("mn")) / (F.col("mx") - F.col("mn")))
                * F.lit(float(buckets))
            ).cast("bigint"),
        ).alias("bucket"),
    )
    w_local = (
        W.partitionBy("bucket")
        .orderBy("value")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    local = b.select(
        "value",
        "bucket",
        "ca",
        "cb",
        F.sum("ca").over(w_local).cast("bigint").alias("lca"),
        F.sum("cb").over(w_local).cast(b_type).alias("lcb"),
    ).persist()
    totals = local.groupBy("bucket").agg(
        F.max("lca").alias("ta"), F.max("lcb").alias("tb")
    )
    w_carry = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, -1)
    carry = totals.select(
        "bucket",
        F.coalesce(F.sum("ta").over(w_carry), F.lit(0))
        .cast("bigint")
        .alias("oa"),
        F.coalesce(F.sum("tb").over(w_carry), F.lit(0))
        .cast(b_type)
        .alias("ob"),
    )
    n = totals.agg(
        F.sum("ta").cast("bigint").alias("na"),
        F.sum("tb").cast(b_type).alias("nb"),
    )
    return (
        local.join(F.broadcast(carry), "bucket")
        .crossJoin(F.broadcast(n))
        .select(
            "value",
            "ca",
            "cb",
            (F.col("oa") + F.col("lca")).cast("bigint").alias("cum_a"),
            (F.col("ob") + F.col("lcb")).cast(b_type).alias("cum_b"),
            "na",
            "nb",
        )
    )

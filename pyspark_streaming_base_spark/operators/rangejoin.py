"""Banded range join: point-in-interval joins without the nested loop.

A join on ``p.v BETWEEN i.lo AND i.hi`` with no equi-key gives Spark
nothing to hash on — it plans BroadcastNestedLoopJoin (O(|P|·|I|) compares,
and only legal at all when one side broadcasts). Banding manufactures the
equi-key: pick a band width ``w``, give every point the band
``floor(v/w)``, explode every interval to the bands it overlaps, and
equi-join on the band with the range predicate as a residual filter.

Cost model: each point lands in EXACTLY one band (so no output dedup is
ever needed); each interval is replicated ``ceil(len/w)+1`` times. Pick
``w`` near the typical interval length — replication stays O(1) per
interval while the join is a plain shuffled hash join on a well-spread
integer key. Skewed value distributions (many points in one band) are
ordinary AQE skew-join territory, versus a nested loop that has no skew
handling at all.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BAND = "_range_band"


def banded_range_join(
    points: DataFrame,
    intervals: DataFrame,
    value: str,
    lo: str,
    hi: str,
    band_width: float,
    how: str = "inner",
    extra_cond: Optional[Column] = None,
) -> DataFrame:
    """Join each point row (``value``) to interval rows with
    ``lo <= value <= hi`` via a band equi-join.

    ``band_width`` must be positive; intervals with ``lo > hi`` match
    nothing (dropped by the residual filter). Only ``inner`` is supported:
    banding replicates intervals, so outer semantics would need a
    dedup-and-reconcile pass that belongs at the call site.
    """
    if band_width <= 0:
        raise ValueError(f"band_width must be positive, got {band_width}")
    if how != "inner":
        raise ValueError("banded_range_join supports inner joins only")
    p = points.withColumn(
        _BAND, F.floor(F.col(value) / F.lit(float(band_width))).cast("bigint")
    )
    i = intervals.withColumn(
        _BAND,
        F.explode(
            F.sequence(
                F.floor(F.col(lo) / F.lit(float(band_width))).cast("bigint"),
                F.floor(F.col(hi) / F.lit(float(band_width))).cast("bigint"),
            )
        ),
    )
    cond = (F.col(value) >= F.col(lo)) & (F.col(value) <= F.col(hi))
    if extra_cond is not None:
        cond = cond & extra_cond
    return p.join(i, _BAND).filter(cond).drop(_BAND)

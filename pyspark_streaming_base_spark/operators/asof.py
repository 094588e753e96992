"""Reusable as-of (backward) join operator.

Spark has no native ASOF JOIN (DuckDB/Pandas do). The scalable composition
is union-and-window: interleave left ("probe") and right ("reference")
rows in one per-key time-ordered window and carry the latest right payload
forward — ONE shuffle on the key, no range-condition nested loop, no
per-group Python. O(n log n) per key partition versus the O(n·m) a naive
theta join plans; skewed keys are AQE window territory.

Semantics match ``pandas.merge_asof(direction="backward",
allow_exact_matches=True)`` and DuckDB ``ASOF JOIN ... ON l.t >= r.t``
(property-tested against pandas in ``tests/test_properties.py``).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def asof_backward_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    carry: Sequence[str],
    right_tiebreak: Optional[Sequence[str]] = None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_time <= left_time`` within the same ``on`` key group.

    Returns all ``left`` columns plus each ``carry`` column of the matched
    right row as ``r_<name>`` (NULL when no right row precedes). Ties at
    equal ``right_time`` resolve to the greatest ``right_tiebreak`` tuple
    (required for determinism when right times can repeat per key).
    """
    on = list(on)
    carry = list(carry)
    tiebreak = [c for c in (right_tiebreak or [])]

    l2 = left.select(
        *[F.col(c) for c in on],
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_kind"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        F.struct(
            *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in carry]
        ).alias("_rrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_tb_{i}") for i, c in enumerate(tiebreak)],
    )
    r2 = right.select(
        *[F.col(c) for c in on],
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_kind"),
        F.lit(None).cast(l2.schema["_lrow"].dataType).alias("_lrow"),
        F.struct(*[F.col(c) for c in carry]).alias("_rrow"),
        *[F.col(c).alias(f"_tb_{i}") for i, c in enumerate(tiebreak)],
    )
    both = l2.unionByName(r2)

    # Right rows sort before left rows at equal time (inclusive <=); among
    # right ties the greatest tiebreak wins because last() takes the final
    # non-null value in window order.
    order: list[Column] = [F.col("_t").asc(), F.col("_kind").asc()]
    order += [F.col(f"_tb_{i}").asc_nulls_first() for i in range(len(tiebreak))]
    w = (
        W.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = F.last(
        F.when(F.col("_kind") == 0, F.col("_rrow")), ignorenulls=True
    ).over(w)
    out = (
        both.withColumn("_carried", carried)
        .filter(F.col("_kind") == 1)
        .select(
            *[F.col("_lrow")[c].alias(c) for c in left.columns],
            *[F.col("_carried")[c].alias(f"r_{c}") for c in carry],
        )
    )
    return out

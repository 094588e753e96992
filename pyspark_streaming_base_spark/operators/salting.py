"""Salted join for skewed keys.

AQE's skew-join handling (on in SessionFactory) splits oversized shuffle
partitions at runtime, and is the first line of defense. Explicit salting
still matters where AQE can't act: stream-static joins (no runtime
re-plan of the streaming side), skewed ``groupBy`` feeding a join, or a
known pathological key (null / default-value hot keys) you want spread
*before* the shuffle files are even written.

Mechanics: the big side's rows get a deterministic salt in ``[0, n)``
derived from a high-cardinality column, so one hot join key fans out over
``n`` shuffle partitions; the other side is replicated ``n×`` so every
(key, salt) bucket still finds its match. Replication cost is
``n × |right|`` — pick the smaller-but-not-broadcastable side to
replicate and keep ``n`` at the skew factor, not higher.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "_salt_skew"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    salt_on: str,
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Join ``left`` (big, skewed) to ``right`` (replicated) on ``on``.

    ``salt_on`` is a left column of high cardinality (ideally a unique
    id): the salt is ``xxhash64(salt_on) mod salt_buckets`` — deterministic,
    so retries/re-runs place rows identically. Only ``inner`` and ``left``
    joins are legal: under replication, right/full semantics would emit
    one null-extended row per *unmatched replica* instead of per row.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins, got {how!r}: replicating "
            "the right side breaks right/full outer semantics"
        )
    n = int(salt_buckets)
    if n < 2:
        raise ValueError("salt_buckets must be >= 2")
    l2 = left.withColumn(
        _SALT, F.pmod(F.xxhash64(F.col(salt_on)), F.lit(n)).cast("int")
    )
    # sequence of int literals → explode yields int, matching the left cast
    r2 = right.withColumn(_SALT, F.explode(F.sequence(F.lit(0), F.lit(n - 1))))
    return l2.join(r2, [*on, _SALT], how).drop(_SALT)

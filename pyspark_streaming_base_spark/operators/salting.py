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
    so retries/re-runs place rows identically. Rows where ``salt_on`` IS
    NULL fall back to a row-position salt (``monotonically_increasing_id``
    mod n): xxhash64 of NULL is the bare seed, which would pile every
    NULL-keyed row into ONE bucket — exactly the hot-key shape this
    operator exists to break. (The fallback is stable within a run and
    across task retries, but not across re-runs with different input
    splits; any salt value is *correct* — the right side matches all of
    them — so this only affects placement, never results.) Only ``inner``
    and ``left`` joins are legal: under replication, right/full semantics
    would emit one null-extended row per *unmatched replica* instead of
    per row.
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
        _SALT,
        F.when(
            F.col(salt_on).isNull(),
            F.pmod(F.monotonically_increasing_id(), F.lit(n)),
        )
        .otherwise(F.pmod(F.xxhash64(F.col(salt_on)), F.lit(n)))
        .cast("int"),
    )
    # sequence of int literals → explode yields int, matching the left cast
    r2 = right.withColumn(_SALT, F.explode(F.sequence(F.lit(0), F.lit(n - 1))))
    return l2.join(r2, [*on, _SALT], how).drop(_SALT)

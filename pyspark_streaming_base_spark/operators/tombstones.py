"""Shared tombstone-delete machinery for the persisted-index family
(BM25 ``operators/bm25.py``, MinHash ``operators/minhash.py``, IVF
``operators/ivf.py``, IVFADC ``operators/pq.py``, semantic blocking
``operators/semdedup.py``) — ONE definition of the lifecycle so every
index deletes the same way (the CLAUDE.md single-helper rule).

The pattern: a delete is an O(batch) append of ids to a tombstone
parquet table; probes read a LIVE view (index rows anti-joined against
the tombstone set) so deleted documents neither match nor contribute to
derived statistics; compaction folds tombstones into a staged-swap
rewrite of the physical tables when the tombstone list outgrows its
anti-join. Semantics: a tombstone set — unknown ids are no-ops, repeats
are idempotent. Single-writer maintenance contract, like the appends.
"""

from __future__ import annotations

import os
import shutil
from typing import Optional

from pyspark.sql import DataFrame, SparkSession


def write_tombstones(
    spark: SparkSession, tomb_path: str, ids, id_col: str
) -> None:
    """Append a delete batch to the tombstone table at ``tomb_path``.
    ``ids``: a DataFrame carrying ``id_col``, or an iterable of values
    (assumed bigint ids, the family's id convention)."""
    if not isinstance(ids, DataFrame):
        ids = spark.createDataFrame([(int(i),) for i in ids], f"{id_col} bigint")
    ids.select(id_col).write.mode("append").parquet(tomb_path)


def read_tombstones(spark: SparkSession, tomb_path: str) -> Optional[DataFrame]:
    """The distinct tombstoned ids, or None when nothing was ever
    deleted (the common fresh-index case — avoids planning a no-op
    anti-join)."""
    try:
        return spark.read.parquet(tomb_path).distinct()
    except Exception:
        return None


def apply_tombstones(
    spark: SparkSession, tomb_path: str, df: DataFrame, id_col: str
) -> DataFrame:
    """``df`` minus tombstoned ids — the LIVE view. One anti-join; the
    tombstone side is a bare id list, broadcast by AQE while it stays
    small (compaction is the remedy when it doesn't)."""
    tomb = read_tombstones(spark, tomb_path)
    if tomb is None:
        return df
    return df.join(tomb.select(id_col), id_col, "anti")


def swap_in(live_path: str, staged_df: DataFrame) -> None:
    """Staged-swap rewrite of one physical table: write the new snapshot
    to ``<live>.compacting``, then replace the live directory. A crash
    before the swap leaves the original index intact; a stale stage dir
    is simply overwritten by the next attempt."""
    stage = f"{live_path}.compacting"
    staged_df.write.mode("overwrite").parquet(stage)
    shutil.rmtree(live_path)
    os.rename(stage, live_path)


def clear_tombstones(tomb_path: str) -> None:
    shutil.rmtree(tomb_path, ignore_errors=True)

"""Shared tombstone-delete machinery for the persisted-index family
(BM25 ``operators/bm25.py``, MinHash ``operators/minhash.py``, IVF
``operators/ivf.py``, IVFADC ``operators/pq.py``, semantic blocking
``operators/semdedup.py``, containment ``operators/containment.py``) —
ONE definition of the lifecycle so every index deletes the same way
(the CLAUDE.md single-helper rule).

The pattern: a delete is an O(batch) append of ids to a tombstone
parquet table; probes read a LIVE view (index rows anti-joined against
the tombstone set) so deleted documents neither match nor contribute to
derived statistics; compaction folds tombstones into a staged-swap
rewrite of the physical tables when the tombstone list outgrows its
anti-join. Semantics: a tombstone set — unknown ids are no-ops, repeats
are idempotent. Single-writer maintenance contract, like the appends.

Reader safety (the part appends get for free and rewrites don't): the
live table path is a GENERATION POINTER — a symlink flipped atomically
with ``os.replace`` — so a probe racing a compaction resolves either
the old snapshot or the new one, never a missing directory. The
previous generation is retained through the next swap (a reader that
resolved the pointer just before the flip keeps a full
compaction-cycle grace period before its files disappear);
``vacuum_generations`` reclaims everything but the current snapshot
once no readers remain. Crash-safety: the only mutation of the live
path is the single atomic pointer flip — a crash before it leaves the
old snapshot live, a crash after it leaves the new one live, and stale
generation/pointer temp files are swept by the next swap or vacuum.
One documented exception: the FIRST swap over a legacy real-directory
layout (an index built before this scheme) must rename that directory
aside before the flip — a one-time, two-rename migration window.

This module is local-FS (``os``-level) like the rest of the persisted
index family; on an object store without atomic rename the pointer
would be a manifest file (the ``sinks/manifest_parquet.py`` protocol).
"""

from __future__ import annotations

import os
import shutil
import uuid
import warnings
from typing import Callable, Optional

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession

#: Tombstone-to-live row ratio at which probes warn and
#: ``maybe_compact`` fires: past this, the anti-join side stops being
#: trivially broadcastable relative to the index and every probe pays
#: for deletes that one rewrite would retire.
COMPACT_RATIO = 0.10

#: Driver-side delete batches (plain Python iterables) are capped —
#: bigger deletes must arrive as a DataFrame so the ids never ride
#: through the driver.
MAX_DRIVER_DELETE_BATCH = 100_000


class TombstoneCompactionNeeded(UserWarning):
    """The tombstone set has outgrown ``COMPACT_RATIO`` of the live
    table — schedule ``compact_*`` (or ``maybe_compact``) for this
    index."""


def write_tombstones(
    spark: SparkSession, tomb_path: str, ids, id_col: str
) -> None:
    """Append a delete batch to the tombstone table at ``tomb_path``.
    ``ids``: a DataFrame carrying ``id_col``, or a small iterable of
    values (assumed bigint ids, the family's id convention) — iterables
    materialize on the driver, so batches past
    ``MAX_DRIVER_DELETE_BATCH`` are rejected; ship those as a
    DataFrame."""
    if not isinstance(ids, DataFrame):
        ids = list(ids)
        if len(ids) > MAX_DRIVER_DELETE_BATCH:
            raise ValueError(
                f"delete batch of {len(ids)} ids exceeds the driver-side "
                f"cap ({MAX_DRIVER_DELETE_BATCH}); pass a DataFrame so the "
                "ids stay distributed"
            )
        ids = spark.createDataFrame([(int(i),) for i in ids], f"{id_col} bigint")
    ids.select(id_col).write.mode("append").parquet(tomb_path)


def read_tombstones(spark: SparkSession, tomb_path: str) -> Optional[DataFrame]:
    """The distinct tombstoned ids, or None when nothing was ever
    deleted (the common fresh-index case — avoids planning a no-op
    anti-join). ONLY the path-missing case maps to None: any other read
    failure (corrupt parquet, permissions, transient FS error)
    propagates, because treating it as "nothing deleted" would silently
    resurrect tombstoned docs — the wrong failure mode for a takedown
    path."""
    if not os.path.exists(tomb_path):
        return None
    try:
        return spark.read.parquet(tomb_path).distinct()
    except AnalysisException:
        # the dir vanished between the existence check and the read
        # (a racing clear_tombstones) — same meaning as path-missing.
        # Decided by RE-CHECKING the filesystem, not by matching the
        # exception message (Spark versions phrase PATH_NOT_FOUND
        # differently); anything else propagates.
        if not os.path.exists(tomb_path):
            return None
        raise


def apply_tombstones(
    spark: SparkSession,
    tomb_path: str,
    df: DataFrame,
    id_col: str,
    live_path: Optional[str] = None,
    warn_ratio: Optional[float] = COMPACT_RATIO,
) -> DataFrame:
    """``df`` minus tombstoned ids — the LIVE view. One anti-join; the
    tombstone side is a bare id list, broadcast by AQE while it stays
    small (compaction is the remedy when it doesn't). When the caller
    passes ``live_path`` (the physical table backing ``df``), the
    tombstone-to-live row ratio is checked from parquet footers —
    driver-side metadata only, no job — and a
    ``TombstoneCompactionNeeded`` warning fires past ``warn_ratio`` so
    an operator who never schedules compaction hears about the
    silently-degrading probe instead of paying for it forever."""
    tomb = read_tombstones(spark, tomb_path)
    if tomb is None:
        return df
    if live_path is not None and warn_ratio is not None:
        ratio = tombstone_ratio(tomb_path, live_path)
        if ratio is not None and ratio >= warn_ratio:
            warnings.warn(
                f"tombstones at {tomb_path} are {ratio:.0%} of the live "
                f"rows at {live_path} (threshold {warn_ratio:.0%}); "
                "schedule compaction",
                TombstoneCompactionNeeded,
                stacklevel=2,
            )
    return df.join(tomb.select(id_col), id_col, "anti")


def _parquet_rows(path: str) -> Optional[int]:
    """Row count from parquet FOOTERS under ``path`` — O(files)
    driver-side metadata, no Spark job (the bounded-collect budget
    SCALE.md allows). None when nothing readable is there."""
    import pyarrow.parquet as pq

    if not os.path.exists(path):
        return None
    total, found = 0, False
    for root, _dirs, files in os.walk(path, followlinks=True):
        for fn in files:
            if fn.endswith(".parquet"):
                total += pq.read_metadata(os.path.join(root, fn)).num_rows
                found = True
    return total if found else None


def tombstone_ratio(tomb_path: str, live_path: str) -> Optional[float]:
    """Tombstone rows / live rows from parquet footers, or None when
    either side is missing/empty. The tombstone count includes
    idempotent repeat-appends (footers can't distinct), so this is an
    upper bound — exactly the right bias for a compaction trigger."""
    tomb = _parquet_rows(tomb_path)
    live = _parquet_rows(live_path)
    if tomb is None or not live:
        return None
    return tomb / live


def maybe_compact(
    tomb_path: str,
    live_path: str,
    compact_fn: Callable[[], None],
    ratio: float = COMPACT_RATIO,
) -> bool:
    """Run ``compact_fn`` iff the tombstone-to-live ratio reached
    ``ratio``; returns whether it ran. The scheduling hook callers put
    after delete batches: ``maybe_compact(tp, lp, lambda:
    compact_bm25_index(spark, path))``."""
    r = tombstone_ratio(tomb_path, live_path)
    if r is not None and r >= ratio:
        compact_fn()
        return True
    return False


def snapshot_path(live_path: str) -> str:
    """Resolve the generation POINTER to the immutable snapshot
    directory it names. Probes must read the resolved path, not the
    pointer: file paths listed through the symlink would dangle if a
    compaction flipped it mid-read, while the resolved generation dir
    is never mutated and survives at least one further swap (see
    ``swap_in``'s retention rule)."""
    return os.path.realpath(live_path) if os.path.islink(live_path) else live_path


def read_live(spark: SparkSession, live_path: str) -> DataFrame:
    """``spark.read.parquet`` of the CURRENT snapshot behind
    ``live_path`` — the one read entry point for every persisted-index
    probe, so the pointer-resolution rule lives in one place."""
    return spark.read.parquet(snapshot_path(live_path))


def _generation_dirs(live_path: str) -> list:
    parent = os.path.dirname(os.path.abspath(live_path)) or "."
    prefix = os.path.basename(live_path) + ".gen."
    if not os.path.isdir(parent):
        return []
    return [
        os.path.join(parent, n)
        for n in os.listdir(parent)
        if n.startswith(prefix)
    ]


def swap_in(live_path: str, staged_df: DataFrame, partition_by=()) -> None:
    """Staged-swap rewrite of one physical table, safe for concurrent
    readers: write the new snapshot to a fresh generation directory
    ``<live>.gen.<id>``, then flip the ``live_path`` symlink to it with
    one atomic ``os.replace``. A reader resolving the pointer sees the
    old snapshot or the new one, never a missing directory; the
    pre-flip generation is RETAINED (a reader already inside it keeps
    its files) and reclaimed by the NEXT swap or by
    ``vacuum_generations``. Crash-safety: a crash before the flip
    leaves the old snapshot live (stale generation dirs are swept
    later); after the flip, the new one.

    Legacy migration: an index built before this scheme has a real
    directory at ``live_path`` — that first swap renames it aside
    before the flip (a one-time two-rename window; every subsequent
    swap is the atomic pointer flip)."""
    gen = f"{live_path}.gen.{uuid.uuid4().hex}"
    writer = staged_df.write.mode("overwrite")
    if partition_by:
        # tables laid out hive-partitioned (e.g. the containment index's
        # size slices) keep that layout through compaction
        writer = writer.partitionBy(*partition_by)
    writer.parquet(gen)

    prev: Optional[str] = (
        os.path.realpath(live_path) if os.path.exists(live_path) else None
    )
    tmp = f"{live_path}.ptr.{uuid.uuid4().hex}"
    os.symlink(os.path.abspath(gen), tmp)
    try:
        if os.path.islink(live_path) or not os.path.lexists(live_path):
            os.replace(tmp, live_path)
        else:
            # legacy real-directory live: rename aside, then flip
            legacy = f"{live_path}.gen.legacy-{uuid.uuid4().hex}"
            os.rename(live_path, legacy)
            prev = legacy
            os.replace(tmp, live_path)
    except BaseException:
        if os.path.lexists(tmp):
            os.remove(tmp)
        raise

    # sweep generations older than (current, previous): current serves
    # new readers, previous covers readers who resolved the pointer
    # just before this flip
    keep = {os.path.realpath(live_path)}
    if prev is not None:
        keep.add(os.path.realpath(prev))
    for d in _generation_dirs(live_path):
        if os.path.realpath(d) not in keep:
            shutil.rmtree(d, ignore_errors=True)


def vacuum_generations(live_path: str) -> int:
    """Reclaim every generation directory except the current pointer
    target — the maintenance job to run once no reader can still hold
    the previous snapshot. Returns the number of directories removed."""
    if not os.path.lexists(live_path):
        return 0
    current = os.path.realpath(live_path)
    removed = 0
    for d in _generation_dirs(live_path):
        if os.path.realpath(d) != current:
            shutil.rmtree(d, ignore_errors=True)
            removed += 1
    return removed


def clear_tombstones(tomb_path: str) -> None:
    shutil.rmtree(tomb_path, ignore_errors=True)

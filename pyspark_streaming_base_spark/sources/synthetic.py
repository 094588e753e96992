"""Synthetic-events connector: a PySpark 4 Python DataSource
(``pyspark.sql.datasource``) implementing BOTH the batch and the
microbatch-streaming read paths in pure Python — the jar-free analogue of
the reference's connector tier (its Kafka/Delta sources,
``sources/kafka_source.py:11``, ``sources/delta_source.py:15``, wrap JVM
formats; this one IS the format).

Rows are a pure function of ``event_id`` (splitmix64 bit mix — no RNG, no
wall clock), so any (partition-count, batch-size, restart) slicing yields
the same multiset: the determinism invariant the correctness gates need
from a test/bench source, and the property the tests pin.

Scale notes: generation is embarrassingly parallel — ``partitions()``
splits the id range, each task generates its slice locally (no driver
materialization, no shuffle). Streaming offsets are plain row indices, so
checkpoint resume is exact; ``rows_per_batch`` is the admission-control
knob (same role as ``maxOffsetsPerTrigger`` on the Kafka source, A14).
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone
from typing import Iterator, Tuple

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

#: Fixed origin for event timestamps (UTC) — no wall-clock dependence.
_EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)
_EVENT_TYPES = ("click", "view", "purchase", "scroll")


def _mix(x: int) -> int:
    """splitmix64 finalizer — the same public integer mix used for the
    LSH hyperplanes (``queries/similarity.py``): deterministic, seedless,
    avalanche-complete."""
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


def _row(event_id: int, n_users: int) -> Tuple:
    h = _mix(event_id)
    ts = _EPOCH + timedelta(seconds=event_id * 7)  # fixed 7s cadence
    user_id = h % n_users
    event_type = _EVENT_TYPES[(h >> 17) % len(_EVENT_TYPES)]
    value = ((h >> 20) % 1_000_000) / 100.0  # 0.00 .. 9999.99, 2 decimals
    return (event_id, ts, user_id, event_type, value)


class _IdRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


def _split(start: int, end: int, n: int):
    """Split [start, end) into ≤n contiguous, gap-free, non-overlapping
    ranges (the union property the determinism test asserts)."""
    total = end - start
    n = max(1, min(n, total)) if total > 0 else 1
    bounds = [start + (total * i) // n for i in range(n + 1)]
    return [_IdRange(lo, hi) for lo, hi in zip(bounds, bounds[1:]) if hi > lo]


class SyntheticEventsBatchReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", "1000"))
        self.n_parts = int(options.get("numpartitions", "8"))
        self.n_users = int(options.get("users", "100"))

    def partitions(self):
        return _split(0, self.n_rows, self.n_parts)

    def read(self, partition: _IdRange) -> Iterator[Tuple]:
        for i in range(partition.start, partition.end):
            yield _row(i, self.n_users)


class SyntheticEventsStreamReader(DataSourceStreamReader):
    """Microbatch reader: the offset is just the next row index. With
    ``max_rows`` set, ``latestOffset`` plateaus and
    ``processAllAvailable``/availableNow terminates — an unbounded stream
    caps each batch at ``rows_per_batch`` instead."""

    def __init__(self, options):
        self.rows_per_batch = int(options.get("rows_per_batch", "100"))
        self.max_rows = int(options.get("max_rows", "0"))  # 0 = unbounded
        self.n_parts = int(options.get("numpartitions", "4"))
        self.n_users = int(options.get("users", "100"))

    _cursor = 0

    def initialOffset(self):
        return {"index": 0}

    def latestOffset(self):
        # The cursor is in-memory, so a query RESTART creates a reader
        # whose cursor lags the checkpointed offset. Every offset Spark
        # hands back (partitions(), commit()) raises the floor, and the
        # end<=start guard in partitions() makes any interim stale batch
        # empty — rows are never re-emitted, because emission is driven by
        # the (start, end) ranges Spark plans, not by the cursor.
        self._cursor += self.rows_per_batch
        if self.max_rows:
            self._cursor = min(self._cursor, self.max_rows)
        return {"index": self._cursor}

    def partitions(self, start, end):
        lo, hi = start["index"], end["index"]
        self._cursor = max(self._cursor, lo, hi)
        if hi <= lo:
            return []
        return _split(lo, hi, self.n_parts)

    def read(self, partition: _IdRange) -> Iterator[Tuple]:
        for i in range(partition.start, partition.end):
            yield _row(i, self.n_users)

    def commit(self, end):
        # offsets are pure indices; nothing external to clean up — but the
        # committed offset is another restart-safety floor for the cursor
        self._cursor = max(self._cursor, end["index"])


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events")`` /
    ``spark.readStream.format("synthetic_events")`` after
    ``spark.dataSource.register(SyntheticEventsDataSource)``.

    Options (all strings, reference-style A4 convention): ``rows`` (batch
    total), ``rows_per_batch``, ``max_rows`` (stream), ``numpartitions``,
    ``users``.
    """

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return (
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double"
        )

    def reader(self, schema: StructType) -> DataSourceReader:
        return SyntheticEventsBatchReader(self.options)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return SyntheticEventsStreamReader(self.options)

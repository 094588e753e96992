"""Streaming observability: a bounded progress-capture listener and
throughput summaries.

The reference framework wires sources and sinks but exposes no runtime
metrics surface at all; a production streaming engine needs one. This
module adapts Spark's ``StreamingQueryListener`` (the public listener API
carrying everything the UI shows — per-batch rows, rates, durations,
state-store sizes) into plain-Python snapshots:

* ``ProgressCapture`` — collects per-query progress dicts into a bounded
  ring buffer (``maxlen`` per query; admission control so a weeks-long
  query cannot grow driver memory unboundedly);
* ``summary()`` — batch count, row totals, mean/max processing rate and
  batch duration, last watermark, aggregated state rows — the numbers an
  operator alerts on (falling rate, rising batch duration, state growth).

Listener callbacks run on Spark's listener-bus thread; captures are
guarded by a lock and snapshots return copies, so reader code never races
the bus. Use ``attach``/``detach`` (or the context manager) around the
query lifetime.
"""

from __future__ import annotations

import threading
from collections import defaultdict, deque
from typing import Any, Deque, Dict, List, Optional

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


class ProgressCapture(StreamingQueryListener):
    """Capture StreamingQueryProgress events, bounded per query name."""

    def __init__(self, maxlen: int = 256) -> None:
        self._lock = threading.Lock()
        self._progress: Dict[str, Deque[dict]] = defaultdict(
            lambda: deque(maxlen=maxlen)
        )
        self._terminated: Dict[str, Optional[str]] = {}

    # -- listener callbacks (listener-bus thread) ---------------------------
    def onQueryStarted(self, event: Any) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event: Any) -> None:  # noqa: N802
        p = event.progress
        row = {
            "name": p.name,
            "batchId": p.batchId,
            "numInputRows": p.numInputRows,
            "inputRowsPerSecond": p.inputRowsPerSecond,
            "processedRowsPerSecond": p.processedRowsPerSecond,
            "durationMs": dict(p.durationMs or {}),
            "stateRows": sum(
                (s.numRowsTotal or 0) for s in (p.stateOperators or [])
            ),
            "watermark": p.eventTime.get("watermark") if p.eventTime else None,
        }
        with self._lock:
            self._progress[p.name or ""].append(row)

    def onQueryIdle(self, event: Any) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event: Any) -> None:  # noqa: N802
        with self._lock:
            self._terminated[str(event.id)] = event.exception

    # -- reader API (any thread) --------------------------------------------
    def snapshot(self, name: str) -> List[dict]:
        with self._lock:
            return list(self._progress.get(name, ()))

    def summary(self, name: str) -> dict:
        rows = self.snapshot(name)
        if not rows:
            return {"name": name, "n_batches": 0}
        rates = [
            r["processedRowsPerSecond"]
            for r in rows
            if r["processedRowsPerSecond"] is not None
        ]
        durations = [
            r["durationMs"].get("triggerExecution", 0) for r in rows
        ]
        return {
            "name": name,
            "n_batches": len(rows),
            "total_input_rows": sum(r["numInputRows"] for r in rows),
            "mean_proc_rows_per_sec": (sum(rates) / len(rates)) if rates else None,
            "max_trigger_ms": max(durations) if durations else None,
            "last_state_rows": rows[-1]["stateRows"],
            "last_watermark": rows[-1]["watermark"],
        }

    # -- lifecycle -----------------------------------------------------------
    def attach(self, spark: SparkSession) -> "ProgressCapture":
        spark.streams.addListener(self)
        self._spark = spark
        return self

    def detach(self) -> None:
        spark = getattr(self, "_spark", None)
        if spark is not None:
            spark.streams.removeListener(self)
            self._spark = None

    def __enter__(self) -> "ProgressCapture":
        return self

    def __exit__(self, *exc: Any) -> None:
        self.detach()

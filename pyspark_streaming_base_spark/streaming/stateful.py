"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY.md §2C C22).

``running_aggregate`` maintains per-key running (count, sum, max) state
across micro-batches — the canonical "arbitrary stateful op" the built-in
aggregations can't express when you need custom state transitions or
timeout-driven emission.

Scale notes: state lives in the state store, partitioned by key — size it
by distinct keys, not events. ``GroupStateTimeout`` is how abandoned keys
get evicted; unbounded keyed state is the classic streaming OOM at scale.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double, max_value double"
STATE_SCHEMA = "n bigint, total double, mx double"


def _update(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (n, total, mx) = state.get if state.exists else (0, 0.0, float("-inf"))
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        mx = max(mx, float(pdf["value"].max()))
    state.update((n, total, mx))
    yield pd.DataFrame(
        [{"user_id": key[0], "n_events": n, "total_value": total, "max_value": mx}]
    )


def running_aggregate(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum, max) over ``value`` with explicit state.

    Works on a streaming DataFrame (state persists across micro-batches,
    update mode) — the batch equivalent is a plain groupBy, which the tests
    use as the oracle.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SESSION_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, n_events bigint"
)
SESSION_STATE = "start_us long, end_us long, n bigint"


def sessionize(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Timeout-driven sessionization: a user's session CLOSES (emits one
    row) when the watermark passes ``last_event + gap`` — the
    "emit when the key goes quiet" pattern that windowed aggregation
    can't express when the session payload needs custom state.

    Event-time timeout (not processing-time): firing is driven by the
    data's own clock, so results are replay-deterministic and the state
    store never outlives the watermark horizon — bounded state at 100 TB.
    The input must already carry ``withWatermark('ts', …)``.

    Batch twin: q72-style gaps-and-islands; sessions still open at drain
    end stay in the state store (the twin test accounts for them).
    """
    gap_us = gap_seconds * 1_000_000

    def row(key, s):
        return {
            "user_id": key[0],
            "session_start": pd.Timestamp(s[0], unit="us"),
            "session_end": pd.Timestamp(s[1], unit="us"),
            "n_events": s[2],
        }

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            closed = state.get
            state.remove()
            yield pd.DataFrame([row(key, closed)])
            return
        ts: list[int] = []
        for pdf in pdfs:
            ts.extend(int(v) // 1000 for v in pdf["ts"].astype("int64"))  # ns → µs
        ts.sort()
        # split this batch (seeded with carried state) into gap-separated
        # sessions: every session followed by a later event IN EVENT TIME is
        # closed by that evidence alone, no watermark needed
        cur = list(state.get) if state.exists else None
        closed = []
        for t_us in ts:
            if cur is None:
                cur = [t_us, t_us, 1]
            elif t_us - cur[1] <= gap_us:
                cur[1] = max(cur[1], t_us)
                cur[2] += 1
            else:
                closed.append(cur)
                cur = [t_us, t_us, 1]
        close_ms = cur[1] // 1000 + gap_seconds * 1000
        if close_ms <= state.getCurrentWatermarkMs():
            # quiet gap already elapsed (a timeout in the past is illegal):
            # the trailing session is closed as of this batch too
            closed.append(cur)
            if state.exists:
                state.remove()
        else:
            state.update(tuple(cur))
            # close when the watermark passes the quiet gap after the last event
            state.setTimeoutTimestamp(close_ms)
        if closed:
            yield pd.DataFrame([row(key, s) for s in closed])

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=SESSION_SCHEMA,
        stateStructType=SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )

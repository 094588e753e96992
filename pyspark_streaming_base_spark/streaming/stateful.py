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

from typing import Any, Iterable, Iterator, Optional, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double, max_value double"
STATE_SCHEMA = "n bigint, total double, mx double"


def running_aggregate(events: DataFrame, idle_timeout_seconds: int = 0) -> DataFrame:
    """Per-user running (count, sum, max) over ``value`` with explicit state.

    Works on a streaming DataFrame (state persists across micro-batches,
    update mode) — the batch equivalent is a plain groupBy, which the tests
    use as the oracle.

    ``idle_timeout_seconds > 0`` evicts a key's state after that much
    processing-time silence — the knob that keeps keyed state bounded
    under key churn (the classic streaming OOM). Eviction RESETS that
    key's running totals if it ever reappears; leave at 0 only when the
    key space itself is bounded.
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_seconds > 0
        else GroupStateTimeout.NoTimeout
    )

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()  # idle key evicted; nothing to emit
            return
        (n, total, mx) = state.get if state.exists else (0, 0.0, float("-inf"))
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            mx = max(mx, float(pdf["value"].max()))
        state.update((n, total, mx))
        if idle_timeout_seconds > 0:
            state.setTimeoutDuration(idle_timeout_seconds * 1000)
        yield pd.DataFrame(
            [{"user_id": key[0], "n_events": n, "total_value": total, "max_value": mx}]
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )


def running_aggregate_tws(events: DataFrame, ttl_ms: int = 0) -> DataFrame:
    """``running_aggregate`` on the transformWithState API (Spark 4's
    successor to applyInPandasWithState): typed ValueState, optional
    native state TTL (per-key eviction without hand-rolled timeout
    plumbing), and a processor object that composes init/input/timer
    hooks.

    Requires the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass`` =
    ``...RocksDBStateStoreProvider``) — the right store at scale anyway
    (state spills off-heap instead of living on the JVM heap) — and the
    ``protobuf`` package (Spark's TWS driver-worker protocol; not
    installed in every environment, hence the explicit gate here instead
    of a crashed executor later).
    """
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as exc:  # pragma: no cover
        raise RuntimeError(
            "transformWithStateInPandas requires the 'protobuf' package "
            "(pip install protobuf); use running_aggregate() on "
            "applyInPandasWithState otherwise"
        ) from exc
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningAgg(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "agg", STATE_SCHEMA, ttlDurationMs=ttl_ms or None
            )

        def handleInputRows(self, key, rows, timerValues):
            got = self._state.get() if self._state.exists() else None
            (n, total, mx) = got if got is not None else (0, 0.0, float("-inf"))
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                mx = max(mx, float(pdf["value"].max()))
            self._state.update((n, total, mx))
            yield pd.DataFrame(
                [
                    {
                        "user_id": key[0],
                        "n_events": n,
                        "total_value": total,
                        "max_value": mx,
                    }
                ]
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        RunningAgg(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
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
        # split this batch into gap-separated sessions, then MERGE the
        # carried state in as an interval: late events (older than the
        # carried session, admitted by watermark lateness) form or extend
        # earlier sessions correctly instead of inflating the current one.
        batch_sessions: list[list[int]] = []
        for t_us in ts:
            if batch_sessions and t_us - batch_sessions[-1][1] <= gap_us:
                last = batch_sessions[-1]
                last[1] = max(last[1], t_us)
                last[2] += 1
            else:
                batch_sessions.append([t_us, t_us, 1])
        if state.exists:
            batch_sessions.append(list(state.get))
            batch_sessions.sort(key=lambda s: s[0])
        merged: list[list[int]] = []
        for s in batch_sessions:
            if merged and s[0] - merged[-1][1] <= gap_us:
                merged[-1][1] = max(merged[-1][1], s[1])
                merged[-1][2] += s[2]
            else:
                merged.append(s)
        # every session followed by a later one is closed by event-time
        # evidence alone; only the trailing session can still be open
        closed, cur = merged[:-1], merged[-1]
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


EWMA_OUTPUT_SCHEMA = "user_id bigint, n_events bigint, ewma double"
EWMA_STATE_SCHEMA = "n bigint, s double"


def ewma_stream(
    events: DataFrame,
    alpha: float = 0.5,
    state_ttl_minutes: Optional[float] = None,
    ttl_timeout: str = "processing",
    delay_threshold: str = "1 minute",
) -> DataFrame:
    """Per-user running EWMA (``s_j = α·x_j + (1−α)·s_{j-1}``) maintained
    across micro-batches — the streaming form of q110's smoother, with
    per-key state of exactly TWO scalars (count + current value), the
    smallest possible stateful footprint.

    Rows are folded in (ts, event_id) order WITHIN each micro-batch;
    cross-batch order is the source's responsibility (stage files in
    time order, as any replayable log does). With α = 1/2 every update
    is exact IEEE arithmetic, so the streamed state equals the batch
    recursion bit-for-bit — asserted in the twin test, a stronger claim
    than the usual approximate streaming equivalence.

    State expiry (r13 — the last NoTimeout-with-per-user-state path in
    this module, the same users-ever-seen hazard the transition ops
    closed): ``state_ttl_minutes`` + ``ttl_timeout`` mirror
    :func:`transition_stream` exactly — ``"processing"`` wall-clock
    silence (continuous triggers only; pending processing-time timeouts
    spin availableNow drains), ``"event"`` the drain-safe clock
    (watermarked input, eviction when the watermark passes
    ``last_seen + ttl``). An evicted user who reappears RESTARTS the
    smoother from scratch (n=0 — a cold start, never a fabricated
    carry); leave None only when the key space itself is bounded.

    The per-row Python fold is justified the same way the other state
    ops are: state transitions are inherently sequential per key, the
    work is O(batch) with two floats of state, and the vectorized
    alternative (closed-form weights) cannot span micro-batch
    boundaries.
    """
    if ttl_timeout not in ("processing", "event"):
        raise ValueError(f"ttl_timeout must be processing|event, got {ttl_timeout!r}")
    event_mode = state_ttl_minutes is not None and ttl_timeout == "event"
    ttl_ms = (
        None
        if state_ttl_minutes is None
        else max(1, int(float(state_ttl_minutes) * 60_000))
    )

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()  # idle user: drop the (count, value) pair
            return
        (n, s) = state.get if state.exists else (0, 0.0)
        # a large group arrives as MULTIPLE Arrow chunks within one
        # micro-batch; sorting each chunk independently would fold
        # cross-chunk rows in delivery order — concatenate first so the
        # (ts, event_id) order holds across the whole batch (the chunk
        # list is bounded by the group's rows in this batch)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        last_seen_ms = 0
        if chunks:
            batch = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
            last_seen_ms = int(batch["ts"].astype("int64").max()) // 1_000_000
            for x in batch.sort_values(["ts", "event_id"])["value"]:
                x = float(x)
                s = x if n == 0 else alpha * x + (1.0 - alpha) * s
                n += 1
        state.update((n, s))
        if ttl_ms is not None:
            if event_mode:
                state.setTimeoutTimestamp(
                    max(last_seen_ms, state.getCurrentWatermarkMs()) + ttl_ms
                )
            else:
                state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame([{"user_id": key[0], "n_events": n, "ewma": s}])

    ev = events.withWatermark("ts", delay_threshold) if event_mode else events
    return ev.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if state_ttl_minutes is None
            else (
                GroupStateTimeout.EventTimeTimeout
                if event_mode
                else GroupStateTimeout.ProcessingTimeTimeout
            )
        ),
    )


#: Streaming Misra-Gries geometry: counters per salt group. Salting by
#: ``hash(tok)`` keeps each token's ENTIRE stream in one group, so each
#: group runs an independent exact MG over its own substream — the
#: property the candidate guarantee needs.
MG_COUNTERS = 64
MG_SALTS = 32
MG_OUTPUT_SCHEMA = "salt bigint, tok string, cnt bigint, n_seen bigint"
MG_STATE_SCHEMA = "toks array<string>, cnts array<bigint>, n bigint"


def heavy_hitters_stream(
    tokens: DataFrame,
    counters: int = MG_COUNTERS,
) -> DataFrame:
    """Streaming heavy-hitter candidates: per-salt Misra-Gries state
    maintained across micro-batches — q102's sketch phase as a STREAM
    (q102 then exact-verifies candidates; a deployment does the same
    with a periodic batch join).

    Input: a streaming DataFrame with columns (salt, tok) where
    ``salt = pmod(xxhash64(tok), MG_SALTS)`` — computed by the caller so
    the partitioning is visible in the plan. Each update-mode emission is
    the group's CURRENT counter table plus ``n_seen``, the group's
    substream length, so the consumer can apply the MG guarantee: any
    token with true frequency > n_seen/counters is guaranteed present,
    and every emitted count satisfies
    ``true − n_seen/counters ≤ cnt ≤ true`` (Misra & Gries 1982 —
    public; the decrement floor is per GROUP, which salting makes exact
    rather than per-partition-approximate).

    Scale: state is ≤ counters entries × MG_SALTS groups — constant in
    the stream length; each micro-batch shuffles only (salt, tok) pairs.
    """

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            toks, cnts, n = state.get
            table = dict(zip(list(toks), list(cnts)))
        else:
            table, n = {}, 0
        for pdf in pdfs:
            for tok in pdf["tok"]:
                n += 1
                if tok in table:
                    table[tok] += 1
                elif len(table) < counters:
                    table[tok] = 1
                else:
                    dead = [k for k in table if table[k] == 1]
                    for k in table:
                        table[k] -= 1
                    for k in dead:
                        del table[k]
        state.update((list(table.keys()), list(table.values()), n))
        yield pd.DataFrame(
            {
                "salt": [key[0]] * len(table),
                "tok": list(table.keys()),
                "cnt": list(table.values()),
                "n_seen": [n] * len(table),
            }
        )

    return tokens.groupBy("salt").applyInPandasWithState(
        update,
        outputStructType=MG_OUTPUT_SCHEMA,
        stateStructType=MG_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


TRANSITION_OUTPUT_SCHEMA = "user_id bigint, prev_type string, event_type string"
TRANSITION_STATE_SCHEMA = "last_type string"


def transition_stream(
    events: DataFrame,
    state_ttl_minutes: Optional[int] = None,
    ttl_timeout: str = "processing",
    delay_threshold: str = "1 minute",
) -> DataFrame:
    """Per-user event-type TRANSITIONS as a stream — q182's lag-window
    twin for the live path (the batch lag is not append-streamable; the
    streaming form keeps exactly ONE string of state per user: the last
    event type seen). Each micro-batch emits one row per transition
    (prev_type → event_type) in (ts, event_id) order, with the
    cross-batch boundary transition recovered from state — so the
    emitted row multiset equals the batch lag's row multiset exactly
    (asserted in the twin test), and a downstream counts aggregate
    reproduces q182's matrix incrementally.

    PRECONDITION — in-order micro-batch arrival: rows are sorted
    (ts, event_id) *within* each micro-batch, but the stored boundary is
    whatever arrived LAST, so an event delivered a batch late is folded
    after it (arrival order), and the emitted multiset then differs from
    the batch lag's. The equality claim above holds when batches arrive
    in event-time order — exactly what the twin test stages and what an
    offset-ordered source (Kafka per-partition, the Delta change feed)
    provides for per-user streams; behind an unordered source, put
    q79-style late-data admission in front.

    State expiry: ``state_ttl_minutes`` drops an idle user's one-string
    state after that long with no new events (re-appearing users simply
    restart with no boundary, so one boundary transition is forgone,
    never fabricated). Default None keeps ``NoTimeout`` for the
    exact-twin contract; production paths should set it (CLAUDE.md:
    admission control + bounded state on every streaming path). TWO
    clocks, picked by ``ttl_timeout``:

    * ``"processing"`` (default, the r10 behavior): wall-clock silence.
      ONLY for continuously-triggered queries — under
      ``trigger(availableNow=True)`` pending processing-time timeouts
      keep the drain loop scheduling batches (measured r11: a one-file
      drain spun to epoch ≈142 before being killed).
    * ``"event"`` (r13, the drain-safe clock): the input is watermarked
      (``delay_threshold``; EventTimeTimeout requires one) and a user's
      state is removed when the watermark passes
      ``last_seen + state_ttl_minutes`` — "idle" measured in the data's
      own time, so an ``availableNow`` drain TERMINATES (event-time
      timeouts only fire while data still advances the watermark; a
      pending one cannot schedule batches after the source is
      exhausted). Caveat the watermark brings: rows later than
      ``delay_threshold`` against the stream's max event time are
      admission-dropped by Spark's stateful-operator late filter —
      under this operator's in-order precondition (above) nothing is
      dropped as long as within-batch disorder stays inside the
      threshold, which is exactly the contract an offset-ordered
      source provides.

    With ``state_ttl_minutes=None`` the watermark/event machinery is
    not engaged at all (``ttl_timeout`` is ignored).

    Append output mode: a transition row never changes once emitted —
    the state only ever CONSUMES the boundary, never rewrites history.

    Scale: state is one short string per user (the smallest footprint in
    this module); per-batch work is O(batch rows) with the same
    concat-then-sort chunk handling as :func:`ewma_stream` (a group
    larger than one Arrow chunk must fold in event order across chunks,
    not delivery order).
    """
    if ttl_timeout not in ("processing", "event"):
        raise ValueError(f"ttl_timeout must be processing|event, got {ttl_timeout!r}")
    event_mode = state_ttl_minutes is not None and ttl_timeout == "event"
    # fractional minutes legal (tests use seconds-scale TTLs); floor of
    # 1 ms — the timeout setters reject non-positive values
    ttl_ms = (
        None
        if state_ttl_minutes is None
        else max(1, int(float(state_ttl_minutes) * 60_000))
    )

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        empty = pd.DataFrame(
            {
                "user_id": pd.Series([], dtype="int64"),
                "prev_type": pd.Series([], dtype=object),
                "event_type": pd.Series([], dtype=object),
            }
        )
        if state.hasTimedOut:
            state.remove()  # idle user: drop the boundary string
            yield empty
            return
        last = state.get[0] if state.exists else None
        chunks = [pdf for pdf in pdfs if len(pdf)]
        out = []
        last_seen_ms = 0
        if chunks:
            batch = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
            last_seen_ms = int(batch["ts"].astype("int64").max()) // 1_000_000
            for et in batch.sort_values(["ts", "event_id"])["event_type"]:
                if last is not None:
                    out.append(
                        {
                            "user_id": key[0],
                            "prev_type": last,
                            "event_type": et,
                        }
                    )
                last = str(et)
        state.update((last,))
        if ttl_ms is not None:
            if event_mode:
                # evict when the WATERMARK passes last_seen + ttl (the
                # max() keeps the timestamp strictly past the current
                # watermark, which setTimeoutTimestamp requires)
                state.setTimeoutTimestamp(
                    max(last_seen_ms, state.getCurrentWatermarkMs()) + ttl_ms
                )
            else:
                state.setTimeoutDuration(ttl_ms)
        if out:
            yield pd.DataFrame(out)
        else:  # typed empty frame so Arrow keeps the output schema
            yield empty

    ev = events.withWatermark("ts", delay_threshold) if event_mode else events
    return ev.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=TRANSITION_OUTPUT_SCHEMA,
        stateStructType=TRANSITION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if state_ttl_minutes is None
            else (
                GroupStateTimeout.EventTimeTimeout
                if event_mode
                else GroupStateTimeout.ProcessingTimeTimeout
            )
        ),
    )


TRANSITION_BUF_STATE_SCHEMA = (
    "last_type string, bts array<bigint>, beid array<bigint>, bet array<string>"
)


def transition_stream_buffered(
    events: DataFrame,
    delay_threshold: str = "10 minutes",
    idle_ttl_minutes: Optional[float] = None,
) -> DataFrame:
    """Late-tolerant :func:`transition_stream` — the production posture
    for funnel/transition mining behind an UNORDERED source (r11 verdict
    item: the plain variant's batch-equality claim holds only for
    event-time-ordered micro-batch arrival).

    Mechanism: a per-user WATERMARK BUFFER. Incoming rows are held in
    state; each invocation emits — in (ts, event_id) event-time order —
    only the buffered rows whose event time has passed the current
    watermark (``state.getCurrentWatermarkMs``), carrying the boundary
    type exactly like the plain variant. Rows newer than the watermark
    wait; an EVENT-TIME timeout (armed at the oldest buffered row + 1 ms)
    re-invokes the group when the watermark passes it even if no new
    rows arrive, so buffered suffixes flush without fresh input. The
    emitted multiset therefore equals the batch lag's UNCONDITIONALLY
    for every event the watermark has passed, however arrival shuffles
    rows across micro-batches — asserted against a staging the plain
    variant provably gets wrong (``test_transition_stream.py``).

    Rows later than the watermark itself (ts < wm on arrival) are
    admission-dropped — the same verdict Spark's own stateful-operator
    late-row filter gives them; ``delay_threshold`` is the knob that
    trades tolerated disorder for state size.

    State bound: the buffer holds at most one delay-window of events per
    user (vs the plain variant's single string) — watermark admission is
    what makes that a bound, the module's standing rule. That is the
    PER-USER bound; ``idle_ttl_minutes`` bounds the OTHER axis (r12
    verdict item 1): without it, a drained buffer leaves a
    ``(last, [], [], [])`` row with no timeout armed, so state grows
    with users-ever-seen. With it, whenever an invocation leaves the
    buffer empty the EventTimeTimeout is re-armed at
    ``watermark + idle_ttl`` (the same event-time clock the flush
    timeouts already use — drains still terminate), and a fire with
    nothing buffered removes the state row: total state is
    O(users active within the last idle_ttl of event time), not
    O(users ever seen). An evicted user who reappears restarts with no
    boundary — one transition forgone, never fabricated (the plain
    variant's TTL contract). Default None preserves the exact
    users-ever-seen twin semantics for bounded-key replays; production
    paths should set it (the module's standing rule). Works under
    ``availableNow`` drains: event-time timeouts are driven by the data's
    own watermark, which is finite, so the drain terminates (unlike the
    plain variant's processing-time TTL spin) — but the final
    delay-window of events stays buffered at termination, exactly the
    rows a resumed query would flush first (checkpoint-recoverable, not
    lost; the twin test closes the drain with a watermark-advancing
    sentinel batch instead).

    Append mode: emitted transitions are final — a row is emitted only
    once its event time is watermark-sealed, so no later arrival can
    reorder history (the plain variant cannot make that claim late).
    """
    ev = events.withWatermark("ts", delay_threshold)
    idle_ms = (
        None
        if idle_ttl_minutes is None
        else max(1, int(float(idle_ttl_minutes) * 60_000))
    )

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        empty = pd.DataFrame(
            {
                "user_id": pd.Series([], dtype="int64"),
                "prev_type": pd.Series([], dtype=object),
                "event_type": pd.Series([], dtype=object),
            }
        )
        wm_ns = state.getCurrentWatermarkMs() * 1_000_000
        if state.exists:
            last, bts, beid, bet = state.get
            buf = list(zip(list(bts), list(beid), list(bet)))
        else:
            last, buf = None, []
        if not state.hasTimedOut:
            for pdf in pdfs:
                if not len(pdf):
                    continue
                ts_ns = pdf["ts"].astype("int64")  # house ns pattern
                for t_, e_, et_ in zip(ts_ns, pdf["event_id"], pdf["event_type"]):
                    if int(t_) < wm_ns:
                        continue  # late beyond the watermark: admission drop
                    buf.append((int(t_), int(e_), str(et_)))
        buf.sort(key=lambda r: (r[0], r[1]))
        out, keep = [], []
        for t_, e_, et_ in buf:
            if t_ < wm_ns:
                if last is not None:
                    out.append(
                        {"user_id": key[0], "prev_type": last, "event_type": et_}
                    )
                last = et_
            else:
                keep.append((t_, e_, et_))
        if not keep and idle_ms is not None and state.hasTimedOut and not buf:
            # idle fire with nothing buffered: the watermark has passed
            # idle_ttl beyond the point this user's buffer drained with
            # no new admitted rows — drop the state row entirely (the
            # users-ever-seen growth the idle TTL exists to stop)
            state.remove()
            yield empty
            return
        state.update(
            (
                last,
                [r[0] for r in keep],
                [r[1] for r in keep],
                [r[2] for r in keep],
            )
        )
        if keep:
            # fire when the watermark passes the oldest buffered row
            # (must exceed the current watermark — the +1 ms covers an
            # exact-boundary row)
            state.setTimeoutTimestamp(keep[0][0] // 1_000_000 + 1)
        elif idle_ms is not None:
            # buffer empty: re-arm the SAME event-time clock as the
            # flush timeouts at watermark + idle_ttl (timeouts are
            # cleared on every invocation, so this must be re-set each
            # time the group runs with an empty buffer; > wm holds
            # because idle_ms >= 1)
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + idle_ms)
        yield pd.DataFrame(out) if out else empty

    return ev.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=TRANSITION_OUTPUT_SCHEMA,
        stateStructType=TRANSITION_BUF_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )

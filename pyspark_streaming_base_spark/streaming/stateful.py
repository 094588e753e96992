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

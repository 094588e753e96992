"""Pre-flight output-mode × watermark × operator legality checks.

SURVEY.md §7's watch list: "output-mode × watermark × aggregation legality
rules (Spark rejects some combos at ``start()``) — surface good errors
early". Spark's own rejections arrive as deep ``AnalysisException`` stack
traces at query start (or, for a missing watermark, sometimes only when
state grows unbounded); this module checks the analyzed logical plan
up front and raises ONE actionable message naming the fix.

Checked rules (all public Structured Streaming semantics):

1. ``complete`` mode requires a streaming aggregation — anything else is
   rejected by Spark with "Complete output mode not supported…".
2. ``append`` mode over a streaming aggregation requires an event-time
   watermark on the aggregation's window/event-time key — without one no
   row could ever finalize, so Spark rejects the query.
3. A stream-stream join only supports ``append`` mode.
4. Advisory (raises only with ``strict=True``): ``update``/aggregation
   without a watermark is legal Spark but state never evicts — the
   admission-control posture (SCALE.md) treats unbounded state as an
   error at 100 TB.

Detection walks the analyzed plan via the JVM plan tree's node names —
no physical planning is triggered, so the check is O(plan size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class StreamingLegalityError(ValueError):
    """Illegal streaming plan/output-mode combination, caught pre-flight."""


def _plan_node_names(df: DataFrame) -> list[str]:
    """Class names of every node in the analyzed logical plan."""
    jplan = df._jdf.queryExecution().analyzed()
    nodes = []
    stack = [jplan]
    while stack:
        node = stack.pop()
        nodes.append(node.getClass().getSimpleName())
        children = node.children()
        it = children.iterator()
        while it.hasNext():
            stack.append(it.next())
    return nodes


def _streaming_relation_count(names: list[str]) -> int:
    return sum(
        1
        for n in names
        if n.startswith("StreamingRelation") or n.startswith("StreamingDataSourceV2")
    )


def check_output_mode(df: DataFrame, mode: str, strict: bool = False) -> None:
    """Raise :class:`StreamingLegalityError` if ``mode`` cannot work for
    ``df``'s plan. Call before ``writeStream…start()`` to replace Spark's
    deep start-time AnalysisException with an actionable message.

    ``strict=True`` additionally rejects legal-but-unbounded-state shapes
    (aggregation or dedup with no watermark outside ``complete`` mode).
    """
    if not df.isStreaming:
        return
    mode = (mode or "append").lower()
    names = _plan_node_names(df)
    has_agg = "Aggregate" in names
    has_watermark = "EventTimeWatermark" in names
    is_stream_stream_join = "Join" in names and _streaming_relation_count(names) >= 2

    if mode == "complete" and not has_agg:
        raise StreamingLegalityError(
            "outputMode='complete' requires a streaming aggregation; this "
            "plan has none. Use 'append' (or add the aggregation)."
        )
    if mode == "append" and has_agg and not has_watermark:
        raise StreamingLegalityError(
            "outputMode='append' over a streaming aggregation needs an "
            "event-time watermark (withWatermark) on the grouping's "
            "event-time column — without one no window ever finalizes, so "
            "no row would ever be emitted. Add withWatermark, or use "
            "'update'/'complete'."
        )
    if is_stream_stream_join and mode != "append":
        raise StreamingLegalityError(
            f"stream-stream joins support only outputMode='append' "
            f"(got '{mode}')."
        )
    if strict and has_agg and not has_watermark and mode != "complete":
        raise StreamingLegalityError(
            "strict mode: aggregation without a watermark keeps ALL "
            "groups in the state store forever (unbounded state at scale). "
            "Add withWatermark or run with strict=False."
        )

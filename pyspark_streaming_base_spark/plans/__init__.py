"""Physical-plan inspection helpers — the feedback loop for the 100 TB
design rules ("push down and prune", "stay JVM-side", "broadcast small
dims"). Used by the perf test suite to assert plan shape, not just results.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The ``explain('formatted')`` text of a DataFrame (captured from
    ``df.explain`` — the stable public surface across Spark versions)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters section(s) of the scan nodes."""
    plan = formatted_plan(df)
    return "\n".join(line.strip() for line in plan.splitlines() if "PushedFilters" in line)


def scan_read_schema(df: DataFrame) -> str:
    """ReadSchema of the scan nodes — verifies column pruning."""
    plan = formatted_plan(df)
    return "\n".join(line.strip() for line in plan.splitlines() if "ReadSchema" in line)


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the physical plan (before
    AQE runtime re-planning) — the shuffle budget of the query. Broadcast
    and reused exchanges don't count (they're the point of the hints)."""
    import re

    plan = formatted_plan(df)
    ops = re.findall(r"^\s*(?:[:+\-\s]*)\(\d+\)\s+([A-Za-z]+)", plan, re.MULTILINE)
    return sum(1 for op in ops if op == "Exchange")

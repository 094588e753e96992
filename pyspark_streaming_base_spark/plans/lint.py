"""Plan linter: flag the scale anti-patterns before a query ships.

``lint(df)`` inspects the physical plan and returns a list of
``Finding(rule, severity, detail)`` — the checks mirror the repo's scale
rules (CLAUDE.md / SCALE.md), so a pipeline can gate on
``assert not errors(lint(df))`` the same way CI gates on tests:

* ``cartesian-product``    — CartesianProduct or a non-trivial
  BroadcastNestedLoopJoin multiplies rows: almost always a missing join
  key (a 1-row broadcast crossJoin is idiomatic and allowed);
* ``python-row-udf``       — BatchEvalPython = row-at-a-time Python in
  the hot path (10–100× slower than Arrow/expressions);
* ``single-partition-exchange`` — Exchange SinglePartition under a wide
  plan serializes the job through one task (the classic offender is a
  window function with ORDER BY but no PARTITION BY; a global
  ``orderBy`` is NOT flagged — Spark range-partitions it in parallel);
* ``no-pushed-filters``    — a Filter sits above a scan that pushed
  nothing: the predicate shape defeats pushdown (e.g. a UDF or an
  expression over the column).

The linter reads ``explain('formatted')`` text — the same stable surface
the plan-shape tests use; it needs no JVM internals and works on any
un-executed DataFrame.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import List

from pyspark.sql import DataFrame

from pyspark_streaming_base_spark.plans import formatted_plan


@dataclass(frozen=True)
class Finding:
    rule: str
    severity: str  # "error" | "warn"
    detail: str


def _ops(plan: str) -> List[str]:
    return re.findall(r"^\s*(?:[:+\-\s]*)\(\d+\)\s+([A-Za-z]+)", plan, re.MULTILINE)


def lint(df: DataFrame) -> List[Finding]:
    plan = formatted_plan(df)
    ops = _ops(plan)
    findings: List[Finding] = []

    if "CartesianProduct" in plan:
        findings.append(
            Finding(
                "cartesian-product",
                "error",
                "CartesianProduct multiplies both inputs; add a join key",
            )
        )
    if "BroadcastNestedLoopJoin" in plan:
        # BNLJ is fine for a 1-row/aggregate broadcast; flag every one as
        # a warn (regardless of join type) so callers review the broadcast
        # side's cardinality

        findings.append(
            Finding(
                "nested-loop-join",
                "warn",
                "BroadcastNestedLoopJoin: verify the broadcast side is "
                "by-construction tiny (1-row aggregates are idiomatic)",
            )
        )
    if "BatchEvalPython" in plan:
        findings.append(
            Finding(
                "python-row-udf",
                "error",
                "row-at-a-time Python UDF in the plan; use built-in "
                "expressions or an Arrow-batched pandas_udf",
            )
        )
    # NOTE: no chained-exchange rule — Catalyst already collapses adjacent
    # repartitions (verified in tests), so Exchange→Exchange can't survive
    # optimization; a surviving SinglePartition exchange is the real smell.
    # The >4-operator guard skips trivial driver-side folds (tiny final
    # collects), but NEVER when a Window is present: a global window whose
    # rank-filter rewrite (WindowGroupLimit / TakeOrderedAndProject)
    # failed to fire is exactly the serialized-stage bug the rule exists
    # for, and localCheckpoint lineage truncation (q103) can shrink such
    # a plan below the operator-count bar.
    if re.search(r"SinglePartition", plan) and (len(ops) > 4 or "Window" in ops):
        findings.append(
            Finding(
                "single-partition-exchange",
                "warn",
                "SinglePartition exchange serializes the stage through "
                "one task; use per-group limits or incremental merges",
            )
        )
    # Filter above a scan that pushed nothing
    scans = plan.split("Scan parquet")
    for seg in scans[1:]:
        head = seg[:600]
        if "PushedFilters: []" in head and re.search(r"\(\d+\)\s+Filter", plan):
            findings.append(
                Finding(
                    "no-pushed-filters",
                    "warn",
                    "a Filter exists but the scan pushed no predicates; "
                    "check the predicate is a plain column comparison",
                )
            )
            break
    return findings


def errors(findings: List[Finding]) -> List[Finding]:
    return [f for f in findings if f.severity == "error"]

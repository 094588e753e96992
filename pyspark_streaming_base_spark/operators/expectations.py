"""Data-quality expectations: declarative row-level rules with a
pass/quarantine split and per-rule violation metrics.

The pattern every managed-pipeline product exposes (rules as named boolean
expressions; failing rows quarantined, not dropped silently; violation
counts as first-class metrics) expressed as plain DataFrame operations so
it works identically in batch and Structured Streaming:

* ``apply_expectations`` tags each row with its failed rule names — ONE
  projection, no shuffle, no Python;
* ``split`` derives the pass and quarantine DataFrames from the tagged
  frame (two filters over one scan — Catalyst reuses the tagged plan);
* ``violation_counts`` is a single explode + groupBy for per-rule metrics
  (map-side combined; cardinality = number of rules).

Scale: the tagging projection is embarrassingly parallel; metrics shuffle
O(rules × tasks) rows. In streaming, tag before the sink and route the
quarantine leg through ``foreachBatch`` to its own table — rules are pure
row expressions, so the stream stays append-legal.
"""

from __future__ import annotations

from typing import Dict, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Column added by :func:`apply_expectations` (array of failed rule names).
VIOLATIONS_COL = "_violations"


def apply_expectations(df: DataFrame, rules: Dict[str, Column]) -> DataFrame:
    """Tag each row with the names of the rules it FAILS.

    ``rules`` maps rule name → boolean Column that is True when the row is
    acceptable. A NULL rule result counts as a failure (unknown is not
    acceptable), matching the semantics of SQL ``CHECK`` constraints under
    ``NOT NULL`` enforcement rather than permissive WHERE semantics.
    """
    if not rules:
        raise ValueError("apply_expectations needs at least one rule")
    if VIOLATIONS_COL in df.columns:
        raise ValueError(f"column {VIOLATIONS_COL!r} already present")
    failed = F.array_compact(
        F.array(
            *[
                F.when(~F.coalesce(cond, F.lit(False)), F.lit(name))
                for name, cond in rules.items()
            ]
        )
    )
    return df.withColumn(VIOLATIONS_COL, failed)


def split(tagged: DataFrame) -> Tuple[DataFrame, DataFrame]:
    """(passing rows without the tag column, quarantined rows with it)."""
    ok = tagged.filter(F.size(VIOLATIONS_COL) == 0).drop(VIOLATIONS_COL)
    bad = tagged.filter(F.size(VIOLATIONS_COL) > 0)
    return ok, bad


def violation_counts(tagged: DataFrame) -> DataFrame:
    """Per-rule violation counts: (rule, n_violations)."""
    return (
        tagged.select(F.explode(VIOLATIONS_COL).alias("rule"))
        .groupBy("rule")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_violations"))
    )

"""Exact-aggregation helpers for oracle-matched float math.

Problem: ``sum(double)`` is order-dependent — Spark sums per-partition then
merges, DuckDB sums in its own order, so the last few bits differ and an
exact value-hash comparison fails. Rounding after the fact is unsafe (the
accumulated error can exceed any fixed rounding grid near a boundary).

Fix: accumulate in exact DECIMAL arithmetic on both sides, then cast the
exact decimal result back to DOUBLE. Conversion of the *same* exact decimal
to double is deterministic (round-to-nearest), so both engines produce
bit-identical doubles with associative, order-independent aggregation.

``DEC`` (decimal(25,6)) keeps 6 fractional digits — the synthetic data's
doubles carry real fractional parts, so products like
``l_extendedprice * (1 - l_discount)`` are first computed in double (both
engines do the multiply in double → bit-identical per row) and only then
cast to decimal for exact summation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Decimal type used for exact accumulation. 25 digits total / 6 fractional
#: is enough for sums of ~1e12 rows of ~1e6-magnitude values — sized for the
#: 100 TB target, not just the test scale factors.
DEC = "decimal(25,6)"


def dsum(col: Column) -> Column:
    """Order-independent sum of a double column, returned as double."""
    return F.sum(col.cast(DEC)).cast("double")


def davg(col: Column) -> Column:
    """Order-independent average: exact decimal sum / count, in double."""
    return (F.sum(col.cast(DEC)).cast("double") / F.count(col)).alias("avg")


def sql_dsum(expr: str) -> str:
    """DuckDB twin of :func:`dsum` for an SQL expression string."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(25,6))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    """DuckDB twin of :func:`davg`."""
    return (
        f"CAST(SUM(CAST(({expr}) AS DECIMAL(25,6))) AS DOUBLE)"
        f" / COUNT({expr})"
    )

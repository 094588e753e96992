"""Schema reconciliation for heterogeneous ingestion: align a DataFrame
to a target schema by NAME with safe casts — the operator every
multi-source pipeline needs before a union or a keyed upsert.

Spark's ``unionByName(allowMissingColumns=True)`` solves only the
two-frames case and silently widens types; this makes the policy
explicit and reusable against a declared target:

* missing column → NULL of the target type (``on_missing='null'``) or an
  error (``'error'``);
* extra column → dropped (``on_extra='drop'``) or an error (``'error'``);
* present column → cast to the target type, but only when the cast is
  LOSSLESS by Spark's own rules (``Cast.canUpCast``-style whitelist:
  within-family widenings and anything→string); narrowing casts raise
  instead of silently truncating — a wrong-typed column at 100 TB is a
  corrupt table, not a warning.

Pure projection — fuses into the scan, no shuffle, streaming-safe.
"""

from __future__ import annotations

from typing import Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ByteType,
    DataType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructType,
    TimestampType,
)

#: Lossless widening chains (within a family, left → right is safe).
_NUMERIC_ORDER = (ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType)


def _is_safe_cast(src: DataType, dst: DataType) -> bool:
    if src == dst:
        return True
    if isinstance(dst, StringType):
        return True  # anything → string is representation, not loss
    if type(src) in _NUMERIC_ORDER and type(dst) in _NUMERIC_ORDER:
        # Spark Cast.canUpCast semantics: widen only when the destination
        # mantissa holds every source value exactly — float carries 24
        # bits (≥ short), double 53 (≥ int); long fits neither.
        integral_bits = {ByteType: 7, ShortType: 15, IntegerType: 31, LongType: 63}
        if type(src) in integral_bits:
            if type(dst) in integral_bits:
                return integral_bits[type(dst)] > integral_bits[type(src)]
            mantissa = 24 if isinstance(dst, FloatType) else 53
            return integral_bits[type(src)] < mantissa
        # src is float/double
        return isinstance(src, FloatType) and isinstance(dst, DoubleType)
    if isinstance(src, DecimalType) and isinstance(dst, DecimalType):
        return (
            dst.precision - dst.scale >= src.precision - src.scale
            and dst.scale >= src.scale
        )
    if isinstance(src, DateType) and isinstance(dst, TimestampType):
        return True
    return False


def align_schema(
    df: DataFrame,
    target: StructType,
    on_missing: str = "null",
    on_extra: str = "drop",
) -> DataFrame:
    """Project ``df`` onto ``target`` (same names, order, and types)."""
    if on_missing not in ("null", "error"):
        raise ValueError(f"on_missing must be 'null'|'error', got {on_missing!r}")
    if on_extra not in ("drop", "error"):
        raise ValueError(f"on_extra must be 'drop'|'error', got {on_extra!r}")
    have = {f.name.lower(): f for f in df.schema.fields}
    want = {f.name.lower() for f in target.fields}

    extra = [f.name for f in df.schema.fields if f.name.lower() not in want]
    if extra and on_extra == "error":
        raise ValueError(f"unexpected columns {extra}")

    cols = []
    for f in target.fields:
        src = have.get(f.name.lower())
        if src is None:
            if on_missing == "error":
                raise ValueError(f"missing column {f.name!r}")
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
            continue
        if not _is_safe_cast(src.dataType, f.dataType):
            raise ValueError(
                f"unsafe cast for {f.name!r}: "
                f"{src.dataType.simpleString()} → {f.dataType.simpleString()}"
            )
        c = F.col(src.name)
        if src.dataType != f.dataType:
            c = c.cast(f.dataType)
        cols.append(c.alias(f.name))
    return df.select(*cols)


def union_aligned(target: StructType, *dfs: DataFrame) -> DataFrame:
    """Union any number of heterogeneous frames through one target schema."""
    if not dfs:
        raise ValueError("union_aligned needs at least one DataFrame")
    aligned = [align_schema(d, target) for d in dfs]
    out = aligned[0]
    for d in aligned[1:]:
        out = out.unionByName(d)
    return out


def diff_schema(df: DataFrame, target: StructType) -> Tuple[list, list, list]:
    """(missing, extra, retyped) column-name lists — the preflight report."""
    have = {f.name.lower(): f for f in df.schema.fields}
    want = {f.name.lower(): f for f in target.fields}
    missing = [f.name for f in target.fields if f.name.lower() not in have]
    extra = [f.name for f in df.schema.fields if f.name.lower() not in want]
    retyped = [
        f.name
        for f in target.fields
        if f.name.lower() in have and have[f.name.lower()].dataType != f.dataType
    ]
    return missing, extra, retyped

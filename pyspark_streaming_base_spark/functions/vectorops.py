"""Shared vector expression helpers — dot product and cosine similarity
over ``array<float>``/``array<double>`` columns as pure built-in
expression folds (JVM-side, no UDF).

The fold accumulates sequentially in double — the same order DuckDB's
``list_dot_product`` uses — so similarity values agree bit-for-bit with
the oracle."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dvec(col: str | Column) -> Column:
    """array<float> → array<double> so the fold accumulates in double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (same accumulation order as DuckDB's
    list_dot_product, so results agree bit-for-bit in double)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def l2sq(a: Column, b: Column) -> Column:
    """Sequential-fold squared L2 distance — the ONE definition shared by
    Lloyd's assign step (``queries/pipeline.py``) and the frozen-centroid
    assignment (``operators/semdedup.py``), so incremental and
    from-scratch assignments are bit-identical by construction."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def plane_component(p: int, d: int) -> float:
    """Deterministic pseudo-random hyperplane component in [-1, 1).

    Derived from a splitmix64-style integer mix of (plane, dim) — stable
    across engines/runs, no RNG state (Date-free, seed-free by design).
    The ONE plane-mix definition shared by every LSH consumer
    (``queries/similarity.py`` hash tables, ``operators/semdedup.py``
    sub-bucket signatures) — callers namespace their planes by offsetting
    ``p`` so different consumers never share a hyperplane.
    """
    x = (p * 1_000_003 + d * 97 + 0x9E3779B9) & 0xFFFFFFFFFFFFFFFF
    x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9 & 0xFFFFFFFFFFFFFFFF
    x = (x ^ (x >> 27)) * 0x94D049BB133111EB & 0xFFFFFFFFFFFFFFFF
    x = x ^ (x >> 31)
    return (x % 2_000_000) / 1_000_000.0 - 1.0

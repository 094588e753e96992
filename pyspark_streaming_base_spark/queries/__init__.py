"""Query registry: every operator from SURVEY.md §2 as a named query.

Each query is registered with:

* a Spark callable ``(spark, sf_dir) -> DataFrame`` (the engine under test),
* optionally a DuckDB-compatible ANSI-SQL oracle string (the driver runs
  both at sf=0.01 and compares row-count + schema + order-insensitive value
  hash — ``/root/repo/__spark_entry__.py`` contract).

Determinism rules for oracle-matched queries (see ``_exact.py``):

* float SUM/AVG aggregates go through exact DECIMAL accumulation and are
  cast back to DOUBLE, so values match DuckDB bit-for-bit regardless of
  partition/summation order;
* any LIMIT / top-k breaks ties on a unique key;
* column names are aliased identically on both sides.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: Optional[str]  # DuckDB SQL, or None → driver does rows-only check
    doc: str = ""


REGISTRY: Dict[str, QuerySpec] = {}


def query(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` as query ``name`` with optional oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def load_all() -> Dict[str, QuerySpec]:
    """Import every query module so REGISTRY is fully populated."""
    from pyspark_streaming_base_spark.queries import (  # noqa: F401
        relational,
        windows,
        dedup,
        similarity,
        text,
        streaming,
        multimodal,
        udfs,
    )

    return REGISTRY

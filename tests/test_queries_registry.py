"""Registry-level tests: every query runs at sf0.001 and returns rows with a
stable schema; oracle SQL strings parse in DuckDB. The full value-level
oracle comparison runs at sf0.01 via ``tools/check_correctness.py`` (and the
driver's own gate); these tests are the fast inner loop.
"""

from __future__ import annotations

import duckdb
import pytest

from pyspark_streaming_base_spark.queries import load_all
from pyspark_streaming_base_spark.queries._tables import TABLES

from tests.conftest import SF_SMALL

REGISTRY = load_all()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_runs(spark, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, SF_SMALL)
    assert len(df.columns) > 0
    assert df.count() >= 0  # executes the plan


@pytest.mark.parametrize(
    "name", sorted(n for n, s in REGISTRY.items() if s.oracle is not None)
)
def test_oracle_parses(name):
    con = duckdb.connect()
    for tbl in TABLES:
        con.sql(
            f"CREATE VIEW {tbl} AS SELECT * FROM "
            f"read_parquet('{SF_SMALL}/{tbl}.parquet')"
        )
    spec = REGISTRY[name]
    con.sql(spec.oracle).fetchall()


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 30

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


def test_driver_priority_prefix():
    """The driver checks only the first 50 registry entries; that prefix must
    stay exactly DRIVER_PRIORITY and cover every SURVEY §2 component family."""
    from pyspark_streaming_base_spark.queries import DRIVER_PRIORITY

    names = list(REGISTRY)
    assert len(DRIVER_PRIORITY) == 50
    assert len(set(DRIVER_PRIORITY)) == 50
    assert names[:50] == list(DRIVER_PRIORITY)
    # one representative per component family that has query-level evidence
    required = {
        "q02_filter_pushdown",      # C1
        "q03_derived_projection",   # C2
        "q04_revenue_by_nation",    # C3
        "q05_semi_join",            # C4
        "q07_theta_join",           # C5
        "q01_pricing_summary",      # C6
        "q10_count_distinct",       # C7
        "q35_grouping_sets",        # C8
        "q96_min_cost_supplier",    # C9 (rotated rep; windows family)
        "q30_topk_per_group",       # C10
        "q15_set_ops",              # C11
        "q16_string_funcs",         # C12
        "q17_date_funcs",           # C13
        "q18_math_funcs",           # C14
        "q25_from_json",            # C15
        "q22_exact_dedup",          # C16
        "q40_ngram_jaccard_pairs",  # C17
        "q60_knn_bruteforce",       # C18
        "q47_repetition_score",     # C19 (rotated rep; text analysis)
        "q70_tumbling_window",      # C20
        "q72_session_window",       # C21
        "q79_late_data_audit",      # C22
        "q73_stream_static_join",   # C23
        "q28_udaf_weighted_avg",    # C25/B8 (grouped-agg pandas UDF)
        "q98_arrow_digest",         # C25 Arrow map tier
        "q80_binary_metadata",      # multimodal
    }
    assert required <= set(DRIVER_PRIORITY)


def test_coverage_header_counts():
    """COVERAGE.md's inventory header must track the live registry counts
    (it drifted to 131/115 in r7 while the registry grew to 155/133)."""
    import pathlib
    import re

    text = pathlib.Path(__file__).resolve().parents[1].joinpath("COVERAGE.md").read_text()
    m = re.search(r"operator inventory \((\d+) queries, (\d+) oracle-checked\)", text)
    assert m, "COVERAGE.md inventory header missing"
    n_oracle = sum(1 for s in REGISTRY.values() if s.oracle is not None)
    assert (int(m.group(1)), int(m.group(2))) == (len(REGISTRY), n_oracle)
    # Inline prose counts drift too (r10's "all 155" survived two rounds):
    # any registry-sized "all <N>" phrase — "all <N>)" or "all <N>
    # queries" — must be the live registry size. ("all 33 metrics"-style
    # per-query facts are exempt by the pattern.)
    for n in re.findall(r"\ball (\d+)(?:\)|\s+quer)", text):
        assert int(n) == len(REGISTRY), f"stale inline count 'all {n}'"


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 30

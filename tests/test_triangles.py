"""triangle_counts: degree-ordered wedge enumeration must equal the
brute-force triangle definition on any graph (each triangle found exactly
once), tolerate messy edge lists (duplicates, reversals, self-loops), and
never plan a cartesian product."""

from __future__ import annotations

from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark_streaming_base_spark.operators.triangles import triangle_counts
from pyspark_streaming_base_spark.plans import formatted_plan


def _brute(edges):
    """Per-vertex (degree, triangles, coeff) from the set definition."""
    es = {(min(u, v), max(u, v)) for u, v in edges if u != v}
    adj: dict = {}
    for u, v in es:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    tri = {x: 0 for x in adj}
    for a, b, c in combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            tri[a] += 1
            tri[b] += 1
            tri[c] += 1
    return {
        x: (
            len(adj[x]),
            tri[x],
            (2.0 * tri[x] / (len(adj[x]) * (len(adj[x]) - 1)))
            if len(adj[x]) >= 2
            else 0.0,
        )
        for x in adj
    }


def _run(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r.id: (r.degree, r.triangles, r.coeff)
        for r in triangle_counts(df).collect()
    }


def test_fixed_graph(spark):
    # two triangles sharing an edge + a pendant + an isolated edge
    edges = [(1, 2), (2, 3), (1, 3), (2, 4), (3, 4), (4, 5), (8, 9)]
    assert _run(spark, edges) == _brute(edges)


def test_messy_input_canonicalized(spark):
    clean = [(1, 2), (2, 3), (1, 3)]
    messy = clean + [(2, 1), (3, 2), (1, 2), (7, 7)]  # reversed, dup, loop
    assert _run(spark, messy) == _run(spark, clean) == _brute(clean)


def test_hub_graph(spark):
    """A star (hub degree 20) plus one rim edge: exactly one triangle;
    the degree ordering must generate wedges at RIM vertices, never d²
    at the hub — correctness here is the observable of that choice."""
    edges = [(0, i) for i in range(1, 21)] + [(1, 2)]
    got = _run(spark, edges)
    assert got == _brute(edges)
    assert got[0][1] == 1 and got[1][1] == 1 and got[3][1] == 0


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=0, max_value=9),
        ),
        min_size=0,
        max_size=30,
    )
)
def test_equals_bruteforce_property(spark, edges):
    clean = [(u, v) for u, v in edges if u != v]
    if not clean:
        return
    assert _run(spark, edges) == _brute(edges)


def test_no_cartesian_in_plan(spark):
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(50)], "src long, dst long"
    )
    plan = formatted_plan(triangle_counts(df))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

"""Property-based exactness check for the degree-ordered node-iterator
(operators/graph.py::enumerate_triangles): on random small graphs the
oriented wedge-close join must return EXACTLY the triangle set a
brute-force scan over all vertex triples finds — orientation may only
bound fan-out, never lose (or double-count) a triangle. Ties in degree
(the subtle case: orientation falls back to vertex id) are common at
these sizes by construction.
"""

from __future__ import annotations

from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sp500_stock_etl_spark.operators.graph import enumerate_triangles

edge_strategy = st.sets(
    st.tuples(st.integers(0, 7), st.integers(0, 7)).filter(lambda e: e[0] != e[1]),
    min_size=0,
    max_size=16,
).map(lambda es: sorted({(min(a, b), max(a, b)) for a, b in es}))


def _brute(edges: list[tuple[int, int]]) -> set[tuple[int, int, int]]:
    eset = set(edges)
    nodes = sorted({n for e in edges for n in e})
    return {
        (a, b, c)
        for a, b, c in combinations(nodes, 3)
        if (a, b) in eset and (b, c) in eset and (a, c) in eset
    }


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=edge_strategy)
def test_node_iterator_matches_brute_force(spark, edges):
    if not edges:
        return
    df = spark.createDataFrame(edges, "u bigint, v bigint")
    got = {tuple(r) for r in enumerate_triangles(df).collect()}
    assert got == _brute(edges)

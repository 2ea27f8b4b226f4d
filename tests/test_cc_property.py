"""Property-based check for the large-star/small-star connected
components (operators/dedup.py::connected_components): on random
graphs the contracted labels must equal a sequential union-find's —
star contraction may only reshape the graph, never merge or split a
component. Random graphs at these sizes routinely contain the shapes
that break naive contractions: chains, cycles, twin edges, and
min-id nodes of degree one.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import pytest

from sp500_stock_etl_spark.operators.dedup import (
    connected_components,
    connected_components_star,
)

edge_strategy = st.lists(
    st.tuples(st.integers(0, 11), st.integers(0, 11)),
    min_size=1,
    max_size=20,
)


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@pytest.mark.parametrize("algo", [connected_components, connected_components_star])
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=edge_strategy)
def test_both_algorithms_match_union_find(spark, algo, edges):
    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {r.node: r.component for r in algo(df).collect()}
    assert got == _union_find(edges)

"""Connected-components dedup-cluster resolution: propagation depth,
disjoint components, cycles, and isolated-pair behavior."""

from __future__ import annotations

from sp500_stock_etl_spark.operators.dedup import connected_components


def _cc(spark, pairs):
    df = spark.createDataFrame(pairs, "src bigint, dst bigint")
    return {
        r.node: r.component for r in connected_components(df).collect()
    }


def test_long_path_needs_real_propagation(spark):
    # Path 10-11-...-19: diameter 9 — the min label must walk the
    # whole chain, not just one hop.
    got = _cc(spark, [(i, i + 1) for i in range(10, 19)])
    assert got == {i: 10 for i in range(10, 20)}


def test_disjoint_components_and_cycle(spark):
    pairs = [(1, 2), (2, 3), (3, 1), (7, 8), (100, 42)]
    got = _cc(spark, pairs)
    assert got[1] == got[2] == got[3] == 1
    assert got[7] == got[8] == 7
    assert got[100] == got[42] == 42
    assert len(got) == 7


def test_edge_order_and_direction_irrelevant(spark):
    a = _cc(spark, [(5, 4), (3, 4), (2, 3)])
    b = _cc(spark, [(2, 3), (4, 5), (4, 3)])
    assert a == b == {2: 2, 3: 2, 4: 2, 5: 2}


def test_nonconvergence_raises(spark):
    """A component whose diameter exceeds max_iter must fail loudly,
    not return silently split clusters (round-4 advice)."""
    import pytest

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "src bigint, dst bigint"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=3).collect()

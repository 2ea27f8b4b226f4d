"""CBO end-to-end proof (r8, r7 verdict item 6): ANALYZE statistics
actually FLIP a join order on a 3-table star — the 100 TB payoff of
the stats plumbing tests/test_cbo_stats.py pins at the estimate level.

The star: fact(l_partkey, o_custkey, price) x dim_part (full) x
dim_cust (filtered to one mktsegment). Written join order puts the
UNFILTERED part dim first. Without stats, Catalyst keeps the written
order (join reorder cannot fire without rowCount statistics on every
child). With ANALYZE (+ column stats for the filter's selectivity)
and spark.sql.cbo.joinReorder.enabled, the optimizer moves the
selective customer dim ahead of the part dim — joining the fact
against ~1/5 of customers first shrinks every downstream exchange.
At 100 TB that reorder is the difference between shuffling the full
fact x part join product and never materializing it.

The broadcast threshold is pinned low (64 KB) so the physical
strategy is planned from size ESTIMATES, not from everything fitting
under the default 10 MB threshold.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sp500_stock_etl_spark.io.readers import load_table

_TABLES = ("t_flip_fact", "t_flip_dim_part", "t_flip_dim_cust")


@pytest.fixture(scope="module")
def star_tables(spark, sf_correct):
    for t in _TABLES:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    li = load_table(spark, sf_correct, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice"
    )
    orders = load_table(spark, sf_correct, "orders").select(
        "o_orderkey", "o_custkey"
    )
    fact = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_partkey", "o_custkey", "l_extendedprice"
    )
    fact.write.saveAsTable("t_flip_fact")
    load_table(spark, sf_correct, "part").write.saveAsTable(
        "t_flip_dim_part"
    )
    load_table(spark, sf_correct, "customer").write.saveAsTable(
        "t_flip_dim_cust"
    )
    yield
    for t in _TABLES:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def _star_query(spark):
    f = spark.table("t_flip_fact")
    p = spark.table("t_flip_dim_part")
    c = spark.table("t_flip_dim_cust").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    # Written order: the UNFILTERED part dim first — the order a
    # stats-driven optimizer should NOT keep.
    return (
        f.join(p, f.l_partkey == p.p_partkey)
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("p_brand")
        .agg(F.sum("l_extendedprice").alias("rev"))
    )


def _dim_positions(df):
    """First occurrence of each dim relation in the optimized plan
    string — a depth-first proxy for join order (the relation joined
    first sits deeper/earlier in the tree printout)."""
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    pos = {t: plan.find(t) for t in ("t_flip_dim_part", "t_flip_dim_cust")}
    assert -1 not in pos.values(), plan
    return pos


@pytest.fixture()
def _conf_guard(spark):
    keys = (
        "spark.sql.cbo.enabled",
        "spark.sql.cbo.joinReorder.enabled",
        "spark.sql.autoBroadcastJoinThreshold",
    )
    prev = {k: spark.conf.get(k, None) for k in keys}
    yield
    for k, v in prev.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_analyze_stats_flip_join_order(spark, star_tables, _conf_guard):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024))

    # --- Without stats/CBO: written order survives optimization.
    spark.conf.set("spark.sql.cbo.enabled", "false")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
    before = _dim_positions(_star_query(spark))
    assert before["t_flip_dim_part"] < before["t_flip_dim_cust"], before

    # --- ANALYZE all three + column stats for the join/filter keys.
    for t in _TABLES:
        spark.sql(f"ANALYZE TABLE {t} COMPUTE STATISTICS")
    spark.sql(
        "ANALYZE TABLE t_flip_dim_cust COMPUTE STATISTICS "
        "FOR COLUMNS c_custkey, c_mktsegment"
    )
    spark.sql(
        "ANALYZE TABLE t_flip_dim_part COMPUTE STATISTICS "
        "FOR COLUMNS p_partkey"
    )
    spark.sql(
        "ANALYZE TABLE t_flip_fact COMPUTE STATISTICS "
        "FOR COLUMNS l_partkey, o_custkey"
    )

    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    after = _dim_positions(_star_query(spark))

    # THE FLIP: the selective customer dim now joins ahead of the
    # unfiltered part dim.
    assert after["t_flip_dim_cust"] < after["t_flip_dim_part"], (
        before,
        after,
    )


def test_flip_preserves_results(spark, star_tables, _conf_guard):
    """Reordered and written plans must agree — the optimization is
    semantics-preserving (collect both under the two configs)."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024))
    spark.conf.set("spark.sql.cbo.enabled", "false")
    base = {
        r["p_brand"]: round(r["rev"], 6)
        for r in _star_query(spark).collect()
    }
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    flipped = {
        r["p_brand"]: round(r["rev"], 6)
        for r in _star_query(spark).collect()
    }
    # Float sums may differ in the last bits across orders; compare
    # at 1e-6 relative slack.
    assert base.keys() == flipped.keys()
    for k, v in base.items():
        assert abs(v - flipped[k]) <= 1e-6 * max(1.0, abs(v)), (
            k,
            v,
            flipped[k],
        )

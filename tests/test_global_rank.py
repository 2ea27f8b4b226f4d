"""Property test for the distributed global-rank + ntile pattern
(operators/window_metrics.with_global_rank / ntile_from_rank): must
equal the single-task ``Window.orderBy`` row_number/ntile bit for bit
on random inputs — including N smaller than the partition count,
N < k buckets, and heavy ties broken by the id column."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import Window, functions as F

from sp500_stock_etl_spark.operators.window_metrics import (
    ntile_from_rank,
    with_global_rank,
)


@settings(max_examples=15, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=5), min_size=1, max_size=40),
    st.sampled_from([2, 3, 4, 7]),
)
def test_global_rank_ntile_matches_window(spark, scores, k):
    rows = [(i, s) for i, s in enumerate(scores)]
    df = spark.createDataFrame(rows, "id long, score long")

    w = Window.orderBy("score", "id")
    want = {
        (r["id"], r["rn"], r["nt"])
        for r in df.select(
            "id",
            F.row_number().over(w).alias("rn"),
            F.ntile(k).over(w).alias("nt"),
        ).collect()
    }

    ranked = with_global_rank(df, ["score", "id"], num_partitions=4)
    total = ranked.agg(F.count(F.lit(1)).cast("long").alias("t"))
    got = {
        (r["id"], r["global_rank"], r["nt"])
        for r in ranked.join(F.broadcast(total))
        .select(
            "id",
            "global_rank",
            ntile_from_rank(F.col("global_rank"), F.col("t"), k).alias("nt"),
        )
        .collect()
    }
    assert got == want, (scores, k, got ^ want)


@settings(max_examples=12, deadline=None)
@given(st.lists(st.integers(min_value=-5, max_value=5), min_size=1, max_size=40))
def test_global_cumsum_matches_window(spark, vals):
    from sp500_stock_etl_spark.operators.window_metrics import (
        with_global_cumsum,
    )

    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "id long, v long")
    w = Window.orderBy("v", "id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = {
        (r["id"], r["cs"])
        for r in df.select("id", F.sum("v").over(w).alias("cs")).collect()
    }
    got = {
        (r["id"], r["global_cumsum"])
        for r in with_global_cumsum(
            df, ["v", "id"], "v", num_partitions=4
        ).collect()
    }
    assert got == want, (vals, got ^ want)

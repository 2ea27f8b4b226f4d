#!/usr/bin/env python
"""Interleaved A/B for triangle_count_basket (guide §1.2 / §5).

The audited plan for the registered query shows the un-persisted edge
pipeline (lineitem scan -> distinct items -> self-join -> groupBy ->
support filter) re-expanded for every reference inside
``enumerate_triangles``: `deg` reads the edge frame twice, `with_deg`
once, and the `oriented` frame is consumed three times (e1/e2/e3) —
30 parquet scans / 152 Exchange nodes for one query. NEW persists the
canonical edge frame and the oriented frame (track_persist, released
after the query's action like the LSH bucket caches).

Output-equality gate first; then alternating OLD/NEW reps in one
session, noop sink, same methodology as bench.py.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from sp500_stock_etl_spark.caching import release_caches, track_persist  # noqa: E402
from sp500_stock_etl_spark.io.readers import load_table  # noqa: E402
from sp500_stock_etl_spark.session import get_spark  # noqa: E402

_TRIANGLE_SUPPORT = 2


def basket_edges(spark, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a = items.select(F.col("l_orderkey"), F.col("l_partkey").alias("pu"))
    b = items.select(F.col("l_orderkey"), F.col("l_partkey").alias("pv"))
    return (
        a.join(b, "l_orderkey")
        .where(F.col("pu") < F.col("pv"))
        .groupBy("pu", "pv")
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= _TRIANGLE_SUPPORT)
        .select(F.col("pu").alias("u"), F.col("pv").alias("v"))
    )


def triangles(edges: DataFrame, persist: bool) -> DataFrame:
    """enumerate_triangles body; ``persist=True`` is the candidate."""
    keep = track_persist if persist else (lambda df: df)
    e = keep(edges.select(F.col("u").alias("pu"), F.col("v").alias("pv")))
    deg = (
        e.select(F.col("pu").alias("node"))
        .unionAll(e.select(F.col("pv").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    du = deg.select(F.col("node").alias("pu"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("pv"), F.col("deg").alias("dv"))
    with_deg = e.join(du, "pu").join(dv, "pv")
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("pu") < F.col("pv"))
    )
    oriented = keep(
        with_deg.select(
            F.when(u_first, F.col("pu")).otherwise(F.col("pv")).alias("src"),
            F.when(u_first, F.col("pv")).otherwise(F.col("pu")).alias("dst"),
            F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("dst_deg"),
        )
    )
    e1 = oriented.select(
        F.col("src"), F.col("dst").alias("x"), F.col("dst_deg").alias("xd")
    )
    e2 = oriented.select(
        F.col("src"), F.col("dst").alias("y"), F.col("dst_deg").alias("yd")
    )
    wedges = e1.join(e2, "src").where(
        (F.col("xd") < F.col("yd"))
        | ((F.col("xd") == F.col("yd")) & (F.col("x") < F.col("y")))
    )
    e3 = oriented.select(F.col("src").alias("x"), F.col("dst").alias("y"))
    tri = wedges.join(e3, ["x", "y"])
    ids = F.array_sort(F.array("src", "x", "y"))
    return tri.select(
        F.element_at(ids, 1).alias("u"),
        F.element_at(ids, 2).alias("v"),
        F.element_at(ids, 3).alias("w"),
    )


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r15-triangle-ab")
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    old_rows = sorted(map(tuple, triangles(basket_edges(spark, sf), False).collect()))
    release_caches()
    new_rows = sorted(map(tuple, triangles(basket_edges(spark, sf), True).collect()))
    release_caches()
    assert old_rows == new_rows, "OLD vs NEW output mismatch"
    print(f"outputs identical: {len(new_rows)} triangles", flush=True)

    walls = {"OLD": [], "NEW": []}
    for label, persist in (("OLD", False), ("NEW", True)):  # warm
        noop(triangles(basket_edges(spark, sf), persist))
        release_caches()
    for _ in range(reps):
        for label, persist in (("OLD", False), ("NEW", True)):
            spark.sparkContext.setJobDescription(f"r15-triangle-ab:{label}")
            t0 = time.perf_counter()
            noop(triangles(basket_edges(spark, sf), persist))
            walls[label].append(round(time.perf_counter() - t0, 3))
            release_caches()
    spark.sparkContext.setJobDescription(None)
    for label in ("OLD", "NEW"):
        w = sorted(walls[label])
        print(
            f"{label} best={w[0]:.3f} med={w[len(w) // 2]:.3f} walls={walls[label]}"
        )


if __name__ == "__main__":
    main()

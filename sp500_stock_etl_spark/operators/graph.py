"""Graph operators over edge-list DataFrames (round 5).

Complements the iterative connected-components resolver in
``operators/dedup.py`` with the join-shaped graph analytics class:
triangle enumeration via the degree-ordered node-iterator — the
textbook distributed formulation (each edge oriented from its
(degree, id)-smaller endpoint bounds every out-degree by O(sqrt(E)),
so wedge fan-out tracks the graph's arboricity instead of its hottest
node's degree).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def enumerate_triangles(
    edges: DataFrame, u_col: str = "u", v_col: str = "v"
) -> DataFrame:
    """All triangles of an undirected simple graph, one row per
    triangle, vertex ids sorted ascending as (u, v, w).

    ``edges`` must hold each undirected edge once with ``u < v`` (the
    canonical edge-list form). Orientation: every edge points from its
    (degree, id)-smaller endpoint; a triangle's three vertices are then
    totally ordered, so it is found exactly once — as a wedge at its
    smallest vertex closed by the oriented third edge. Three
    hash-join shuffles total (degree agg, wedge self-join, closing
    join); no vertex ever fans out more than O(sqrt(E)) wedges.
    """
    e = edges.select(F.col(u_col).alias("pu"), F.col(v_col).alias("pv"))
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
    oriented = with_deg.select(
        F.when(u_first, F.col("pu")).otherwise(F.col("pv")).alias("src"),
        F.when(u_first, F.col("pv")).otherwise(F.col("pu")).alias("dst"),
        F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("dst_deg"),
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

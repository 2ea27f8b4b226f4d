"""Iterative clustering over the embeddings table (north star):
Lloyd's k-means, expressed Spark-first.

This is the "iterative algorithm" class the driver contract exempts
from SQL oracles (each iteration depends on the previous one's global
state). The Spark shape per iteration:

1. **Assign** — centroids are k x d driver-side literals (k*d doubles,
   trivially broadcastable); the distance to each centroid is a native
   column expression (zip_with + aggregate, left-to-right fold), and
   the argmin is a single `least`-of-structs — all map-side,
   whole-stage-codegen, zero shuffles.
2. **Update** — new centroids via posexplode(dim) → groupBy(cluster,
   dim) avg → rebuild arrays driver-side. One shuffle of n*d skinny
   rows per iteration. At 100 TB you'd swap this for the partial-
   aggregate form (per-partition running (sum, count) vectors merged
   on the driver — Spark MLlib's treeAggregate layout); the assign
   step is already scale-shaped.

Determinism: assignment ties break to the LOWEST centroid id (struct
ordering on (dist, cid)); initial centroids are the embeddings of the
k smallest ids. Centroid means sum doubles in shuffle order, so exact
bit-parity across cluster layouts is not guaranteed — acceptable for
a monitoring/exploration operator; the tests assert the invariants
that matter (inertia monotonically non-increasing, assignments
self-consistent, full determinism at fixed partitioning).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .similarity import dot


def sq_dist(vec: Column, centroid: list[float]) -> Column:
    """Squared L2 distance to a literal centroid, one fused fold:
    sum((v_i - c_i)^2) via zip_with + aggregate (no UDF)."""
    lit = F.array(*[F.lit(float(c)) for c in centroid])
    diffs = F.zip_with(vec, lit, lambda a, b: a - b)
    return F.aggregate(
        diffs, F.lit(0.0), lambda acc, x: acc + x * x
    )


def assign_clusters(
    emb: DataFrame, centroids: list[list[float]], vec_col: str = "embedding"
) -> DataFrame:
    """Add (cluster, sq_dist): argmin over k distance expressions via
    least() on (dist, cid) structs — ties go to the lowest cid."""
    candidates = [
        F.struct(
            sq_dist(F.col(vec_col), c).alias("d"),
            F.lit(i).alias("cid"),
        )
        for i, c in enumerate(centroids)
    ]
    best = F.least(*candidates)
    return emb.withColumn("cluster", best["cid"]).withColumn(
        "sq_dist", best["d"]
    )


def update_centroids(
    assigned: DataFrame, k: int, dims: int, vec_col: str = "embedding"
) -> list[list[float]]:
    """Elementwise mean per cluster in the partial-aggregate layout
    (Spark MLlib's treeAggregate communication pattern, expressed
    declaratively): d per-dimension SUM aggregates + a count, grouped
    by cluster. Tungsten's hash aggregate computes per-partition
    partials map-side, so the exchange carries exactly
    k·(d+1) doubles PER PARTITION — independent of row count — and the
    driver collects k skinny rows. The previous posexplode form
    shuffled n·d exploded rows per iteration: at 100 TB that is the
    whole corpus re-keyed every round, vs a few KB of partials here.
    Empty clusters return None (caller reuses the old centroid)."""
    sums = [
        F.sum(F.element_at(F.col(vec_col), i + 1)).alias(f"s{i}")
        for i in range(dims)
    ]
    rows = (
        assigned.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n"), *sums)
        .collect()
    )
    acc: dict[int, list[float]] = {
        r["cluster"]: [r[f"s{i}"] / r["n"] for i in range(dims)] for r in rows
    }
    return [acc.get(i) for i in range(k)]  # type: ignore[return-value]


def kmeans_lloyd(
    emb: DataFrame,
    id_col: str = "emb_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 3,
) -> DataFrame:
    """Deterministic-init Lloyd's: centroids start at the k smallest
    ids' vectors; returns (id, cluster, sq_dist) after `iters` rounds."""
    first = emb.orderBy(id_col).limit(k).select(vec_col).collect()
    centroids = [list(r[0]) for r in first]
    dims = len(centroids[0])
    for _ in range(iters - 1):
        assigned = assign_clusters(emb, centroids, vec_col)
        updated = update_centroids(assigned, k, dims, vec_col)
        centroids = [
            u if u is not None else centroids[i] for i, u in enumerate(updated)
        ]
    final = assign_clusters(emb, centroids, vec_col)
    return final.select(
        F.col(id_col),
        F.col("cluster").cast("int").alias("cluster"),
        "sq_dist",
    )


def inertia(assigned: DataFrame) -> float:
    """Sum of squared distances — the Lloyd's objective. Decimal cast
    makes the cross-partition sum order-free (deterministic)."""
    return float(
        assigned.agg(
            F.sum(F.col("sq_dist").cast("decimal(28,10)")).alias("s")
        ).collect()[0]["s"]
    )

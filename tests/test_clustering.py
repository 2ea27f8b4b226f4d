"""Invariants for the iterative k-means operator (rows-only in the
driver contract): the Lloyd's objective must not increase, final
assignments must be self-consistent, and the whole run must be
deterministic at fixed partitioning."""

from __future__ import annotations

from pyspark.sql import functions as F

from sp500_stock_etl_spark.io.readers import load_table
from sp500_stock_etl_spark.operators import clustering as C


def _emb(spark, sf):
    return load_table(spark, sf, "embeddings")


def test_inertia_monotone_nonincreasing(spark, sf_correct):
    emb = _emb(spark, sf_correct)
    first = emb.orderBy("vec_id").limit(8).select("embedding").collect()
    centroids = [list(r[0]) for r in first]
    dims = len(centroids[0])
    inertias = []
    for _ in range(3):
        assigned = C.assign_clusters(emb, centroids)
        inertias.append(C.inertia(assigned))
        updated = C.update_centroids(assigned, 8, dims)
        centroids = [
            u if u is not None else centroids[i] for i, u in enumerate(updated)
        ]
    # Lloyd's: each assign+update step cannot increase the objective
    # (tiny float slack for the nondeterministic centroid means).
    for a, b in zip(inertias, inertias[1:]):
        assert b <= a * (1 + 1e-9), inertias


def test_assignments_self_consistent_and_deterministic(spark, sf_correct):
    emb = _emb(spark, sf_correct)
    out1 = C.kmeans_lloyd(emb, id_col="vec_id", k=8, iters=3)
    rows1 = {r["vec_id"]: (r["cluster"], r["sq_dist"]) for r in out1.collect()}
    assert len(rows1) == emb.count()
    assert all(0 <= c < 8 for c, _ in rows1.values())
    assert all(d >= 0.0 for _, d in rows1.values())
    # every cluster id in range and at least 2 clusters non-empty
    assert len({c for c, _ in rows1.values()}) >= 2
    # determinism at fixed partitioning: same run → same assignment
    out2 = C.kmeans_lloyd(emb, id_col="vec_id", k=8, iters=3)
    rows2 = {r["vec_id"]: (r["cluster"], r["sq_dist"]) for r in out2.collect()}
    assert rows1 == rows2


def test_pq_codebooks_invariants(spark, sf_dir):
    """Product quantization: codes in [0, k), reconstruction error
    strictly better than the untrained (init-only) codebooks in
    aggregate, and bit-for-bit deterministic across runs."""
    from sp500_stock_etl_spark.io.readers import load_table
    from sp500_stock_etl_spark.operators.similarity import (
        pq_codebooks_encode,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    out = pq_codebooks_encode(emb, m=4, k=8, iters=2)
    rows = {r["vec_id"]: tuple(r) for r in out.collect()}
    assert len(rows) == emb.count()
    for r in rows.values():
        for c in r[1:5]:
            assert 0 <= c < 8
        assert r[5] >= 0.0

    # Determinism: an independent build produces identical codes.
    again = {
        r["vec_id"]: tuple(r)
        for r in pq_codebooks_encode(emb, m=4, k=8, iters=2).collect()
    }
    assert rows == again

    # Training helps: total squared error after 2 Lloyd rounds is
    # lower than with the init-only (iters=0) codebooks.
    from pyspark.sql import functions as F

    def total_err(iters):
        return (
            pq_codebooks_encode(emb, m=4, k=8, iters=iters)
            .agg(F.sum(F.col("recon_sq_err").cast("decimal(28,10)")))
            .collect()[0][0]
        )

    assert total_err(2) < total_err(0)


def test_pq_literal_column_assign_matches_unrolled(spark, sf_correct):
    """r15 optimization pin (r14 verdict item 3): the trainer's assign
    now carries the m*k centroids as ONE nested-array literal column
    (transform + element_at + the same zip_with/aggregate fold)
    instead of m*k unrolled literal-fold subtrees behind a CASE on s.
    The two expressions must pick bit-identical clusters — same
    distance doubles in the same fold order, same lowest-code
    tie-break — on real embedding subvectors."""
    from sp500_stock_etl_spark.operators.clustering import sq_dist

    emb = load_table(spark, sf_correct, "embeddings")
    m, k = 4, 8
    dims = len(emb.select("embedding").first()[0])
    sub = dims // m
    to_d = F.transform(F.col("embedding"), lambda v: v.cast("double"))
    sub_rows = emb.select(
        F.col("vec_id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("s"),
                        F.slice(to_d, s * sub + 1, sub).alias("sv"),
                    )
                    for s in range(m)
                ]
            )
        ).alias("e"),
    ).select("vec_id", "e.s", "e.sv")
    # Deterministic non-trivial codebooks from the first k vectors.
    first = emb.orderBy("vec_id").limit(k).select(to_d.alias("v")).collect()
    cbs = [
        [list(first[j][0])[s * sub : (s + 1) * sub] for j in range(k)]
        for s in range(m)
    ]

    unrolled = None
    for s in range(m):
        arr = F.array(*[sq_dist(F.col("sv"), c) for c in cbs[s]])
        code = (F.array_position(arr, F.array_min(arr)) - 1).cast("int")
        unrolled = (
            F.when(F.col("s") == s, code)
            if unrolled is None
            else unrolled.when(F.col("s") == s, code)
        )

    arr = F.transform(
        F.element_at(F.lit(cbs), F.col("s") + 1),
        lambda c: F.aggregate(
            F.zip_with(F.col("sv"), c, lambda a, b: a - b),
            F.lit(0.0),
            lambda acc, x: acc + x * x,
        ),
    )
    lit_col = (F.array_position(arr, F.array_min(arr)) - 1).cast("int")

    mismatches = (
        sub_rows.withColumn("old", unrolled)
        .withColumn("new", lit_col)
        .where(~F.col("old").eqNullSafe(F.col("new")))
        .count()
    )
    assert mismatches == 0

#!/usr/bin/env python
"""Interleaved A/B of the full pq_codebooks_encode operator: the r15
literal-column assign (HEAD) vs the r14 unrolled-literal CASE assign
(OLD, replicated here verbatim), same session, alternating reps —
the controlled instrument for the r14-verdict-item-3 change on a box
with multi-minute contention windows.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from sp500_stock_etl_spark.io.readers import load_table  # noqa: E402
from sp500_stock_etl_spark.operators.clustering import sq_dist  # noqa: E402
from sp500_stock_etl_spark.operators.similarity import (  # noqa: E402
    pq_codebooks_encode,
)
from sp500_stock_etl_spark.session import get_spark  # noqa: E402


def pq_old(emb, id_col="vec_id", vec_col="embedding", m=4, k=8, iters=2, dims=64):
    """r14 body of pq_codebooks_encode (unrolled literal CASE assign)."""
    sub = dims // m
    to_d = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    sub_rows = emb.select(
        F.col(id_col),
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
    ).select(id_col, "e.s", "e.sv")
    w = Window.partitionBy("s").orderBy(id_col)
    init_rows = (
        sub_rows.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("s", "rn", "sv")
        .collect()
    )
    codebooks = [[None] * k for _ in range(m)]
    for r in init_rows:
        codebooks[r["s"]][r["rn"] - 1] = list(r["sv"])

    def assign_expr(cbs):
        expr = None
        for s in range(m):
            arr = F.array(*[sq_dist(F.col("sv"), c) for c in cbs[s]])
            code = (F.array_position(arr, F.array_min(arr)) - 1).cast("int")
            expr = (
                F.when(F.col("s") == s, code)
                if expr is None
                else expr.when(F.col("s") == s, code)
            )
        return expr

    for _ in range(iters):
        assigned = sub_rows.withColumn("cluster", assign_expr(codebooks))
        sums = [
            F.sum(F.element_at(F.col("sv"), i + 1)).alias(f"d{i}")
            for i in range(sub)
        ]
        rows = (
            assigned.groupBy("s", "cluster")
            .agg(F.count(F.lit(1)).alias("n"), *sums)
            .collect()
        )
        for r in rows:
            codebooks[r["s"]][r["cluster"]] = [
                r[f"d{i}"] / r["n"] for i in range(sub)
            ]

    cols = [F.col(id_col)]
    err = None
    for s in range(m):
        sv = F.slice(to_d, s * sub + 1, sub)
        arr = F.array(*[sq_dist(sv, c) for c in codebooks[s]])
        best = F.array_min(arr)
        cols.append(
            (F.array_position(arr, best) - 1).cast("int").alias(f"code_{s}")
        )
        err = best if err is None else err + best
    return emb.select(*cols, err.alias("recon_sq_err"))


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf = "/root/testdata/sf0.1"
    spark = get_spark("r15-pq-ab")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, sf, "embeddings")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # Output-equality gate first: the two paths must produce identical
    # codes and recon errors.
    new_rows = sorted(map(tuple, pq_codebooks_encode(emb).collect()))
    old_rows = sorted(map(tuple, pq_old(emb).collect()))
    assert new_rows == old_rows, "OLD vs NEW output mismatch"
    print(f"outputs identical: {len(new_rows)} rows")

    walls = {"OLD": [], "NEW": []}
    for label, fn in (("OLD", pq_old), ("NEW", pq_codebooks_encode)):  # warm
        noop(fn(emb))
    for r in range(reps):
        for label, fn in (("OLD", pq_old), ("NEW", pq_codebooks_encode)):
            spark.sparkContext.setJobDescription(f"r15-pq-ab:{label}")
            t0 = time.perf_counter()
            noop(fn(emb))
            walls[label].append(round(time.perf_counter() - t0, 3))
    spark.sparkContext.setJobDescription(None)
    for label in ("OLD", "NEW"):
        w = sorted(walls[label])
        print(
            f"{label} best={w[0]:.3f} med={w[len(w) // 2]:.3f} walls={walls[label]}"
        )


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Prototype the PQ trainer's per-round assign without fresh literal
trees (r15, r14 verdict item 3). Compares, on the real sf0.1 embedding
table:

  OLD  per-round CASE over m=4 subspaces x k=8 literal-centroid folds
       (the unrolled assign_expr in pq_codebooks_encode)
  LIT  one nested-array literal column (Literal(ArrayData) ->
       codegen references[], not inlined) + element_at/transform fold
  BCJ  same expression, centroids via crossJoin(broadcast(1-row df))

Checks assignment equality OLD==NEW row-for-row (bit-parity of the
distance fold implies identical argmin), then times one Lloyd round's
assign+aggregate per variant, interleaved.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sp500_stock_etl_spark.io.readers import load_table  # noqa: E402
from sp500_stock_etl_spark.operators.clustering import sq_dist  # noqa: E402
from sp500_stock_etl_spark.session import get_spark  # noqa: E402

M, K, DIMS = 4, 8, 64
SUB = DIMS // M


def main() -> None:
    sf = "/root/testdata/sf0.1"
    spark = get_spark("r15-pq-proto")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, sf, "embeddings")
    to_d = F.transform(F.col("embedding"), lambda v: v.cast("double"))
    sub_rows = emb.select(
        F.col("vec_id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("s"),
                        F.slice(to_d, s * SUB + 1, SUB).alias("sv"),
                    )
                    for s in range(M)
                ]
            )
        ).alias("e"),
    ).select("vec_id", "e.s", "e.sv").localCheckpoint()
    print("rows:", sub_rows.count())

    # fake codebooks (round-varying values simulated by a shift)
    import random

    random.seed(42)

    def cbs(shift: float):
        return [
            [[random.random() + shift for _ in range(SUB)] for _ in range(K)]
            for _ in range(M)
        ]

    def old_assign(cb):
        expr = None
        for s in range(M):
            arr = F.array(*[sq_dist(F.col("sv"), c) for c in cb[s]])
            code = (F.array_position(arr, F.array_min(arr)) - 1).cast("int")
            expr = (
                F.when(F.col("s") == s, code)
                if expr is None
                else expr.when(F.col("s") == s, code)
            )
        return sub_rows.withColumn("cluster", expr)

    def new_dists(cb_col):
        per_s = F.element_at(cb_col, F.col("s") + 1)
        return F.transform(
            per_s,
            lambda c: F.aggregate(
                F.zip_with(F.col("sv"), c, lambda a, b: a - b),
                F.lit(0.0),
                lambda acc, x: acc + x * x,
            ),
        )

    def lit_assign(cb):
        arr = new_dists(F.lit(cb))
        code = (F.array_position(arr, F.array_min(arr)) - 1).cast("int")
        return sub_rows.withColumn("cluster", code)

    def bcj_assign(cb):
        cb_df = spark.createDataFrame(
            [(cb,)], "cb: array<array<array<double>>>"
        )
        arr = new_dists(F.col("cb"))
        code = (F.array_position(arr, F.array_min(arr)) - 1).cast("int")
        return (
            sub_rows.crossJoin(F.broadcast(cb_df))
            .withColumn("cluster", code)
            .drop("cb")
        )

    # --- equality check on one round ---
    cb0 = cbs(0.0)
    try:
        a_lit = lit_assign(cb0)
        lit_ok = True
    except Exception as e:  # noqa: BLE001
        print("LIT variant unsupported:", e)
        lit_ok = False
    old_rows = {
        (r["vec_id"], r["s"]): r["cluster"]
        for r in old_assign(cb0).select("vec_id", "s", "cluster").collect()
    }
    for label, frame in [("LIT", a_lit if lit_ok else None), ("BCJ", bcj_assign(cb0))]:
        if frame is None:
            continue
        new_rows = {
            (r["vec_id"], r["s"]): r["cluster"]
            for r in frame.select("vec_id", "s", "cluster").collect()
        }
        eq = old_rows == new_rows
        print(f"{label} assignments equal OLD: {eq} ({len(new_rows)} rows)")
        assert eq

    # --- timing: one full Lloyd round (assign + groupBy agg collect) ---
    sums = [
        F.sum(F.element_at(F.col("sv"), i + 1)).alias(f"d{i}")
        for i in range(SUB)
    ]

    def one_round(mk, cb):
        t0 = time.perf_counter()
        mk(cb).groupBy("s", "cluster").agg(
            F.count(F.lit(1)).alias("n"), *sums
        ).collect()
        return round(time.perf_counter() - t0, 3)

    variants = [("OLD", old_assign)] + ([("LIT", lit_assign)] if lit_ok else []) + [
        ("BCJ", bcj_assign)
    ]
    walls = {n: [] for n, _ in variants}
    for name, mk in variants:  # warm (first compile)
        one_round(mk, cbs(0.1))
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    for r in range(reps):
        for name, mk in variants:
            walls[name].append(one_round(mk, cbs(0.2 + r)))  # fresh values
    for name, _ in variants:
        w = sorted(walls[name])
        print(f"{name} round: best={w[0]:.3f} med={w[len(w) // 2]:.3f} walls={walls[name]}")


if __name__ == "__main__":
    main()

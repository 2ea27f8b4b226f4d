#!/usr/bin/env python
"""Interleaved A/B for dedup_semantic_clusters' per-pair dot product
(guide §1.2 step 2, per-task work).

Decomposition (scripts/r15_semclusters_decompose.py) attributes ~2.2 s
of the plan's ~2.7 s to the pair stage whose only non-join work is
S.dot — a zip_with + aggregate higher-order fold, which Catalyst
evaluates with interpreted lambdas per element (HOFs are
CodegenFallback). Candidate: unroll the fold at the fixture's static
dim (64) into a left-associative chain

    0.0 + a[1]*b[1] + a[2]*b[2] + ... + a[64]*b[64]

which is whole-stage-codegen-able and performs the IDENTICAL IEEE
multiply/add sequence (same order, same start accumulator), so every
cosine is bit-for-bit the fold's value.

Gate: full-output collect equality (all rows, tuple-wise, incl. the
double max_dup_cosine). Then alternating reps, noop sink.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Column, functions as F  # noqa: E402

from sp500_stock_etl_spark.io.readers import load_table  # noqa: E402
from sp500_stock_etl_spark.operators import similarity as S  # noqa: E402
from sp500_stock_etl_spark.plans.queries_northstar import (  # noqa: E402
    _SEMDEDUP_OFFSET,
    _SEMDEDUP_TAU,
)
from sp500_stock_etl_spark.session import get_spark  # noqa: E402

_DIM = 64


def dot_unrolled(a: Column, b: Column, dim: int = _DIM) -> Column:
    expr = F.lit(0.0)
    for i in range(1, dim + 1):
        expr = expr + F.element_at(a, i) * F.element_at(b, i)
    return expr


def build(spark, sf_dir, unrolled: bool):
    emb = load_table(spark, sf_dir, "embeddings")
    to_d = F.transform(F.col("embedding"), lambda v: v.cast("double"))
    base = emb.select("vec_id", "label", to_d.alias("v"))
    d = F.size(F.col("v"))
    variant = F.transform(
        F.col("v"),
        lambda v, i: F.when(i < d - 4, v).otherwise(F.lit(0.0)),
    )
    var = base.where(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + _SEMDEDUP_OFFSET).alias("vec_id"),
        "label",
        variant.alias("v"),
    )
    full = base.unionByName(var)
    normed = full.withColumn("__n__", S.norm(F.col("v"))).select(
        "vec_id",
        "label",
        F.transform(F.col("v"), lambda x: x / F.col("__n__")).alias("nv"),
    )
    a = normed.select(
        F.col("vec_id").alias("a_id"), "label", F.col("nv").alias("av")
    )
    b = normed.select(
        F.col("vec_id").alias("vid"), "label", F.col("nv").alias("bv")
    )
    dotfn = dot_unrolled if unrolled else S.dot
    pairs = (
        a.join(b, "label")
        .where(F.col("a_id") < F.col("vid"))
        .select("vid", dotfn(F.col("av"), F.col("bv")).alias("c"))
        .where(F.col("c") >= _SEMDEDUP_TAU)
    )
    agg = pairs.groupBy("vid").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_dups"),
        F.max("c").alias("max_dup_cosine"),
    )
    return full.join(agg, full.vec_id == agg.vid, "left").select(
        "vec_id",
        "label",
        F.coalesce("n_dups", F.lit(0).cast("bigint")).alias("n_dups"),
        "max_dup_cosine",
        F.col("vid").isNull().alias("keep"),
    )


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r15-semdot-ab")
    spark.sparkContext.setLogLevel("ERROR")

    import struct

    def key(rows):
        out = []
        for r in sorted(rows, key=lambda r: r[0]):
            c = r["max_dup_cosine"]
            bits = None if c is None else struct.pack("<d", c).hex()
            out.append((r["vec_id"], r["label"], r["n_dups"], bits, r["keep"]))
        return out

    old_rows = key(build(spark, sf, False).collect())
    new_rows = key(build(spark, sf, True).collect())
    assert old_rows == new_rows, "OLD vs NEW output mismatch (bitwise)"
    print(f"outputs bitwise identical: {len(new_rows)} rows", flush=True)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    walls = {"OLD": [], "NEW": []}
    for label, unrolled in (("OLD", False), ("NEW", True)):  # warm
        noop(build(spark, sf, unrolled))
    for _ in range(reps):
        for label, unrolled in (("OLD", False), ("NEW", True)):
            spark.sparkContext.setJobDescription(f"r15-semdot:{label}")
            t0 = time.perf_counter()
            noop(build(spark, sf, unrolled))
            walls[label].append(round(time.perf_counter() - t0, 3))
    spark.sparkContext.setJobDescription(None)
    for label in ("OLD", "NEW"):
        w = sorted(walls[label])
        print(
            f"{label} best={w[0]:.3f} med={w[len(w) // 2]:.3f} walls={walls[label]}"
        )


if __name__ == "__main__":
    main()

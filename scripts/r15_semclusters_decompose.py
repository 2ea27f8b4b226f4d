#!/usr/bin/env python
"""Phase decomposition of dedup_semantic_clusters (guide §1.1):
where do its ~3.5-4 s go — the normalize pass, the within-label
quadratic pair join + dot, or the agg + final left join?

Each phase is timed with the noop sink on the same session,
best-of-N, phases interleaved to ride out box contention.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sp500_stock_etl_spark.io.readers import load_table  # noqa: E402
from sp500_stock_etl_spark.operators import similarity as S  # noqa: E402
from sp500_stock_etl_spark.plans.queries_northstar import (  # noqa: E402
    _SEMDEDUP_OFFSET,
    _SEMDEDUP_TAU,
)
from sp500_stock_etl_spark.session import get_spark  # noqa: E402


def build(spark, sf_dir, upto: str):
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
    if upto == "union":
        return full
    normed = full.withColumn("__n__", S.norm(F.col("v"))).select(
        "vec_id",
        "label",
        F.transform(F.col("v"), lambda x: x / F.col("__n__")).alias("nv"),
    )
    if upto == "normed":
        return normed
    a = normed.select(
        F.col("vec_id").alias("a_id"), "label", F.col("nv").alias("av")
    )
    b = normed.select(
        F.col("vec_id").alias("vid"), "label", F.col("nv").alias("bv")
    )
    joined = a.join(b, "label").where(F.col("a_id") < F.col("vid"))
    if upto == "join_only":
        return joined.select("vid")
    pairs = joined.select(
        "vid", S.dot(F.col("av"), F.col("bv")).alias("c")
    ).where(F.col("c") >= _SEMDEDUP_TAU)
    if upto == "pairs":
        return pairs
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
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r15-semclusters")
    spark.sparkContext.setLogLevel("ERROR")
    phases = ["union", "normed", "join_only", "pairs", "full"]
    walls = {p: [] for p in phases}
    for p in phases:  # warm
        build(spark, sf, p).write.format("noop").mode("overwrite").save()
    for _ in range(reps):
        for p in phases:
            spark.sparkContext.setJobDescription(f"r15-sem:{p}")
            t0 = time.perf_counter()
            build(spark, sf, p).write.format("noop").mode("overwrite").save()
            walls[p].append(round(time.perf_counter() - t0, 3))
    spark.sparkContext.setJobDescription(None)
    for p in phases:
        w = sorted(walls[p])
        print(f"{p:10s} best={w[0]:.3f} med={w[len(w) // 2]:.3f} walls={walls[p]}")
    n_label = (
        build(spark, sf, "union").groupBy("label").count().collect()
    )
    n_label.sort(key=lambda r: -r["count"])
    print("labels:", len(n_label), "top sizes:", [r["count"] for r in n_label[:5]])


if __name__ == "__main__":
    main()

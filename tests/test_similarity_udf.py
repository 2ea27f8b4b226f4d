"""The Pandas-UDF escape hatch (SURVEY.md §2.12): Arrow-batched cosine
must rank-match the native Catalyst fold — same neighbors, same order,
scores equal to float tolerance (numpy's SIMD summation differs in the
last ulp, which is exactly why oracle queries use the native fold)."""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from sp500_stock_etl_spark.io.readers import load_table
from sp500_stock_etl_spark.operators import similarity as S


def test_pandas_cosine_rank_matches_native(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("__qvec__")
    )
    corpus = emb.select("vec_id", F.col("embedding").alias("__cvec__"))
    scored = (
        F.broadcast(queries)
        .crossJoin(corpus)
        .where(F.col("query_id") != F.col("vec_id"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )

    def topk(df):
        return (
            df.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= 5)
            .select("query_id", "vec_id", "rank", "cosine")
        )

    native = topk(
        scored.withColumn(
            "cosine", S.cosine(F.col("__qvec__"), F.col("__cvec__"))
        )
    ).collect()
    arrow = topk(
        scored.withColumn(
            "cosine", S.pandas_cosine(F.col("__qvec__"), F.col("__cvec__"))
        )
    ).collect()

    nat = {(r.query_id, r.rank): (r.vec_id, r.cosine) for r in native}
    arr = {(r.query_id, r.rank): (r.vec_id, r.cosine) for r in arrow}
    assert nat.keys() == arr.keys() and len(nat) > 0
    for key, (nid, ncos) in nat.items():
        aid, acos = arr[key]
        assert nid == aid, (key, nid, aid)
        assert abs(ncos - acos) < 1e-9

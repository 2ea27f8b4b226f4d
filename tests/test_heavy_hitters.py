"""Misra-Gries heavy-hitters invariants vs exact token counts: the
sketch may undercount by at most its own reported bound, never
overcount, and must contain every token whose true frequency exceeds
the bound."""

from __future__ import annotations

from pyspark.sql import functions as F

from sp500_stock_etl_spark.functions.text import norm_text
from sp500_stock_etl_spark.io.readers import load_table
from sp500_stock_etl_spark.operators import text_analysis as TA


def _exact_counts(docs):
    return {
        r.token: r.n
        for r in docs.select(
            F.explode(F.split(norm_text(F.col("text")), " ")).alias("token")
        )
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }


def test_misra_gries_bounds_and_coverage(spark, sf_correct):
    docs = load_table(spark, sf_correct, "documents").select("text")
    exact = _exact_counts(docs)
    rows = TA.misra_gries_heavy_hitters(docs, "text", k=64).collect()
    assert rows, "sketch must be non-empty on a non-empty corpus"
    bound = rows[0].max_undercount
    assert all(r.max_undercount == bound for r in rows)
    est = {r.token: r.est_freq for r in rows}
    # Never overcount; undercount within the reported bound.
    for tok, e in est.items():
        assert tok in exact
        assert e <= exact[tok], (tok, e, exact[tok])
        assert exact[tok] - e <= bound, (tok, e, exact[tok], bound)
    # Every sufficiently-frequent token is present.
    for tok, true in exact.items():
        if true > bound:
            assert tok in est, (tok, true, bound)


def test_misra_gries_small_k_still_sound(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("text")
    exact = _exact_counts(docs)
    rows = TA.misra_gries_heavy_hitters(docs, "text", k=4).collect()
    bound = rows[0].max_undercount if rows else 0
    for r in rows:
        assert r.est_freq <= exact[r.token]
        assert exact[r.token] - r.est_freq <= bound

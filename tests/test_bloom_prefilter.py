"""bloom_semi_prefilter invariants (round-5 operator).

The registry query (corpus_decontamination_bloom) already proves
end-to-end result equality with the exact semi-join via the shared
DuckDB oracle; these tests pin the operator's own contract so a
layout change can't silently break it:

- NO false negatives: every true member of the build set survives the
  prefilter (this is what makes prefilter+confirm exact);
- false positives are bounded: with k=5 hashes and 2^20 bits over a
  few thousand build values, the FP rate is well under 1%; the 5%
  assert leaves room for unlucky seeds without letting the filter
  degrade to a pass-through;
- the broadcast payload is the bitmap, whose entry count is bounded
  by set bits (<= n_hashes * |build|), not by probe size.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sp500_stock_etl_spark.operators.joins import bloom_semi_prefilter


def _strings(spark, prefix: str, n: int):
    return spark.range(n).select(
        F.concat(F.lit(prefix), F.col("id")).alias("v")
    )


def test_no_false_negatives(spark):
    build = _strings(spark, "member-", 3000)
    survivors = bloom_semi_prefilter(build, "v", build, "v")
    assert survivors.count() == 3000  # every member passes its own filter


def test_false_positive_rate_bounded(spark):
    build = _strings(spark, "member-", 3000)
    probe = _strings(spark, "outsider-", 20000)  # disjoint from build
    fp = bloom_semi_prefilter(probe, "v", build, "v").count()
    assert fp / 20000 < 0.05, f"FP rate {fp / 20000:.4f} exceeds 5%"


def test_prefilter_plus_confirm_equals_semi_join(spark):
    build = _strings(spark, "x", 500)
    probe = spark.range(2000).select(
        F.concat(F.lit("x"), (F.col("id") * 3).cast("bigint")).alias("v")
    )
    pre = bloom_semi_prefilter(probe, "v", build, "v")
    got = sorted(
        r.v for r in pre.join(build.distinct(), "v", "semi").collect()
    )
    want = sorted(r.v for r in probe.join(build, "v", "semi").collect())
    assert got == want

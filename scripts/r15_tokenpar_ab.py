#!/usr/bin/env python
"""Interleaved A/B for the token-pipeline plans' scan-parallelism fix
(guide §2.5 input-parallelism class; same mechanism as
scripts/r15_parallelism_ab.py for the shingle family).

At experiment time HEAD carried the candidate edits
(ensure_parallelism wrapped around the documents scan in
corpus_bpe_merges / corpus_tfidf_topterms / corpus_lm_quality_score /
corpus_bpe_encode / corpus_curation_v2). The OLD arm re-created the
pre-edit behavior by patching the plan modules' ``ensure_parallelism``
binding to identity — exact, because those modules' other queries are
not measured here.

RESULT (r15 continuation, interleaved, 3 reps): every token plan got
WORSE with the repartition — OLD sum-of-best 10.21 s vs NEW 12.31 s
(tfidf 1.05->1.55, bpe_merges 2.98->3.60, curation_v2 2.33->2.70,
bpe_encode 1.60->1.86, lm_quality 2.25->2.59). The regex tokenize is
too cheap per row to amortize the round-robin exchange (and its
sortBeforeRepartition local sort of raw text), unlike the md5-heavy
shingle/winnow stages (scripts/r15_parallelism_ab.py). The edits were
REVERTED; this script is the archival instrument and no longer runs
as-is against HEAD (the identity patch now equals HEAD for these
plans).

Full-output equality gates ran first for every measured plan (all
identical).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sp500_stock_etl_spark.caching import release_caches  # noqa: E402
from sp500_stock_etl_spark.plans import queries_northstar as NS  # noqa: E402
from sp500_stock_etl_spark.plans import queries_r6 as R6  # noqa: E402
from sp500_stock_etl_spark.plans.registry import all_queries  # noqa: E402
from sp500_stock_etl_spark.session import get_spark  # noqa: E402

PLANS = [
    "corpus_bpe_merges",
    "corpus_lm_quality_score",
    "corpus_curation_v2",
    "corpus_bpe_encode",
    "corpus_tfidf_topterms",
]

REAL = NS.ensure_parallelism


def set_arm(new: bool) -> None:
    fn = REAL if new else (lambda df, min_partitions=None: df)
    NS.ensure_parallelism = fn
    R6.ensure_parallelism = fn


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r15-tokenpar-ab")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()

    def run(name: str) -> float:
        t0 = time.perf_counter()
        registry[name].spark_fn(spark, sf).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = time.perf_counter() - t0
        release_caches()
        return round(wall, 3)

    try:
        for gate in PLANS:
            set_arm(False)
            old_rows = sorted(map(tuple, registry[gate].spark_fn(spark, sf).collect()))
            release_caches()
            set_arm(True)
            new_rows = sorted(map(tuple, registry[gate].spark_fn(spark, sf).collect()))
            release_caches()
            assert old_rows == new_rows, f"{gate}: OLD vs NEW mismatch"
            print(f"{gate}: outputs identical ({len(new_rows)} rows)", flush=True)

        walls = {n: {"OLD": [], "NEW": []} for n in PLANS}
        set_arm(True)
        for n in PLANS:  # warm
            run(n)
        for _ in range(reps):
            for arm in ("OLD", "NEW"):
                set_arm(arm == "NEW")
                for n in PLANS:
                    spark.sparkContext.setJobDescription(f"r15-tokpar:{arm}:{n}")
                    walls[n][arm].append(run(n))
    finally:
        set_arm(True)
    spark.sparkContext.setJobDescription(None)
    for n in PLANS:
        line = f"{n:30s}"
        for arm in ("OLD", "NEW"):
            w = sorted(walls[n][arm])
            line += f"  {arm} best={w[0]:.3f} med={w[len(w) // 2]:.3f}"
        print(line, flush=True)
    for arm in ("OLD", "NEW"):
        tot = sum(min(walls[n][arm]) for n in PLANS)
        print(f"{arm} sum-of-best={tot:.3f}")


if __name__ == "__main__":
    main()

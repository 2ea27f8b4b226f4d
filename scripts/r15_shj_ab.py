#!/usr/bin/env python
"""Interleaved A/B: AQE sort-merge -> shuffled-hash join conversion
(guide §3.1) on the bench plans whose audited physical plans carry
SortMergeJoin nodes.

Knob under test: spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold
(default 0 = off). When set, AQE rewrites a post-shuffle sort-merge
join to a shuffled-hash join at runtime IF every build-side partition
is measured below the threshold — a size-verified, partition-local
decision, so at cluster scale an oversized partition keeps the
spill-safe SMJ. Bucketed joins have no AQEShuffleRead and are
unaffected (the bucketed_fact_join exhibit keeps its no-exchange SMJ).

Arms alternate within one session per rep: OFF (0, session default)
vs ON (64MB = spark.sql.adaptive.advisoryPartitionSizeInBytes default,
so the build bound equals the partition size AQE already targets).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sp500_stock_etl_spark.caching import release_caches  # noqa: E402
from sp500_stock_etl_spark.plans.registry import all_queries  # noqa: E402
from sp500_stock_etl_spark.session import get_spark  # noqa: E402

_KEY = "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold"

PLANS = [
    "fact_fact_join",
    "dedup_semantic_clusters",
    "dedup_connected_components_star",
    "corpus_pagerank",
    "dedup_incremental_refresh",
    "tpcds_q51_cumulative_max",
    "tpcds_q97_channel_overlap",
    "triangle_count_basket",
    "corpus_doc_embedding_hybrid_dedup",
]


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r15-shj-ab")
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

    arms = (("OFF", "0"), ("ON", "67108864"))
    walls = {name: {"OFF": [], "NEW": []} for name in PLANS}
    walls = {name: {a: [] for a, _ in arms} for name in PLANS}
    for name in PLANS:  # warm (codegen/listing) once per plan
        run(name)
    for _ in range(reps):
        for arm, val in arms:
            spark.conf.set(_KEY, val)
            for name in PLANS:
                spark.sparkContext.setJobDescription(f"r15-shj:{arm}:{name}")
                walls[name][arm].append(run(name))
    spark.conf.set(_KEY, "0")
    spark.sparkContext.setJobDescription(None)
    for name in PLANS:
        line = f"{name:38s}"
        for arm, _ in arms:
            w = sorted(walls[name][arm])
            line += f"  {arm} best={w[0]:.3f} med={w[len(w) // 2]:.3f}"
        print(line, flush=True)
    for arm, _ in arms:
        tot = sum(min(walls[n][arm]) for n in PLANS)
        print(f"{arm} sum-of-best={tot:.3f}")


if __name__ == "__main__":
    main()

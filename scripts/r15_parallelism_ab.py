#!/usr/bin/env python
"""Interleaved A/B: ensure_parallelism on the CPU-heavy narrow map
stages (tokenize + shingle + md5/minhash) that inherit the scan's
1-task partitioning from single-row-group test files (guide §2.5
input-skew class; readers.ensure_parallelism is the existing
scale-safe mechanism — no-op when the scan already yields >= cores
splits, i.e. at any real scale).

Already applied (r8+): dedup_prefix_jaccard's base,
corpus_decontamination_bloom's train side. This A/B asks whether the
REST of the shingle family leaves the same wall on the table:

NEW arm monkeypatches dedup.with_shingles to round-robin the input
first (static frames only), and queries_r7.winnowed_fingerprints'
input likewise. Results are partitioning-independent (per-doc map
work + order-insensitive downstream joins/aggs); the full-output
equality gate below re-checks that anyway on one representative.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sp500_stock_etl_spark.caching import release_caches  # noqa: E402
from sp500_stock_etl_spark.io.readers import ensure_parallelism  # noqa: E402
from sp500_stock_etl_spark.operators import dedup as D  # noqa: E402
from sp500_stock_etl_spark.plans import queries_r7 as R7  # noqa: E402
from sp500_stock_etl_spark.plans.registry import all_queries  # noqa: E402
from sp500_stock_etl_spark.session import get_spark  # noqa: E402

PLANS = [
    "dedup_minhash_lsh",
    "dedup_incremental_refresh",
    "dedup_signature_store_roundtrip",
    "similarity_join_corpus",
    "corpus_doc_embedding_hybrid_dedup",
    "corpus_decontamination_overlap",
    "dedup_exact_substring",
]

OLD_WS = D.with_shingles
OLD_WF = R7.winnowed_fingerprints


def new_ws(df, id_col, text_col, ngram=3):
    if not df.isStreaming:
        df = ensure_parallelism(df)
    return OLD_WS(df, id_col, text_col, ngram)


def new_wf(tokd):
    return OLD_WF(ensure_parallelism(tokd))


def set_arm(new: bool) -> None:
    D.with_shingles = new_ws if new else OLD_WS
    R7.winnowed_fingerprints = new_wf if new else OLD_WF


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r15-par-ab")
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

    # Equality gate on the two cheapest-to-collect representatives.
    try:
        for gate in ("dedup_minhash_lsh", "dedup_exact_substring"):
            set_arm(False)
            old_rows = sorted(map(tuple, registry[gate].spark_fn(spark, sf).collect()))
            release_caches()
            set_arm(True)
            new_rows = sorted(map(tuple, registry[gate].spark_fn(spark, sf).collect()))
            release_caches()
            assert old_rows == new_rows, f"{gate}: OLD vs NEW mismatch"
            print(f"{gate}: outputs identical ({len(new_rows)} rows)", flush=True)

        walls = {n: {"OLD": [], "NEW": []} for n in PLANS}
        set_arm(False)
        for n in PLANS:  # warm
            run(n)
        for _ in range(reps):
            for arm in ("OLD", "NEW"):
                set_arm(arm == "NEW")
                for n in PLANS:
                    spark.sparkContext.setJobDescription(f"r15-par:{arm}:{n}")
                    walls[n][arm].append(run(n))
    finally:
        set_arm(False)
    spark.sparkContext.setJobDescription(None)
    for n in PLANS:
        line = f"{n:38s}"
        for arm in ("OLD", "NEW"):
            w = sorted(walls[n][arm])
            line += f"  {arm} best={w[0]:.3f} med={w[len(w) // 2]:.3f}"
        print(line, flush=True)
    for arm in ("OLD", "NEW"):
        tot = sum(min(walls[n][arm]) for n in PLANS)
        print(f"{arm} sum-of-best={tot:.3f}")


if __name__ == "__main__":
    main()

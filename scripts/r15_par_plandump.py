#!/usr/bin/env python
"""Dump before/after .explain('formatted') for the r15-continuation
scan-parallelism change (ensure_parallelism at the shingle/winnow CPU
stages). BEFORE is reconstructed exactly by patching the
ensure_parallelism binding to identity at both consumption points
(operators/dedup.py module binding; io.readers attr for the
function-local import in queries_r7.winnowed_fingerprints)."""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sp500_stock_etl_spark.caching import release_caches  # noqa: E402
from sp500_stock_etl_spark.io import readers as RD  # noqa: E402
from sp500_stock_etl_spark.operators import dedup as D  # noqa: E402
from sp500_stock_etl_spark.plans.registry import all_queries  # noqa: E402
from sp500_stock_etl_spark.session import get_spark  # noqa: E402

PLANS = [
    "dedup_exact_substring",
    "similarity_join_corpus",
    "dedup_minhash_lsh",
    "corpus_doc_embedding_hybrid_dedup",
    "entity_resolution_customers",
]

REAL = RD.ensure_parallelism


def set_arm(new: bool) -> None:
    fn = REAL if new else (lambda df, min_partitions=None: df)
    RD.ensure_parallelism = fn
    D.ensure_parallelism = fn


def main() -> None:
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r15-par-plandump")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(root, "plans", "r15")
    try:
        for tag, new in (("before", False), ("after", True)):
            set_arm(new)
            for name in PLANS:
                df = registry[name].spark_fn(spark, sf)
                buf = io.StringIO()
                with redirect_stdout(buf):
                    df.explain("formatted")
                with open(os.path.join(out, f"{name}_{tag}.txt"), "w") as f:
                    f.write(buf.getvalue())
                release_caches()
                print(f"dumped {name}_{tag}", flush=True)
    finally:
        set_arm(True)


if __name__ == "__main__":
    main()

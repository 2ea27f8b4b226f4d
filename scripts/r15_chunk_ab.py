#!/usr/bin/env python
"""Interleaved A/B: ensure_parallelism ahead of chunk_documents for
its four consumer plans (corpus_chunking, boilerplate_segments,
boilerplate_rewrite, corpus_training_build).

RESULT (r15 continuation, 3 reps interleaved, equality gate green):
ALL FOUR measured WORSE with the repartition (e.g. boilerplate
segments 0.977 -> 1.262 best) — md5-per-32-token-chunk is an order of
magnitude sparser than the per-span winnow hashing, so the round-robin
exchange does not amortize. NOT implemented; kept as the negative
boundary of the scan-parallelism mechanism (with the tokenize-explode
family, scripts/r15_tokenpar_ab.py).
"""
import os, sys, time
sys.path.insert(0, "/root/repo")
from sp500_stock_etl_spark.caching import release_caches
from sp500_stock_etl_spark.io.readers import ensure_parallelism
from sp500_stock_etl_spark.operators import text_analysis as TA
from sp500_stock_etl_spark.plans.registry import all_queries
from sp500_stock_etl_spark.session import get_spark

PLANS = ["corpus_chunking", "corpus_boilerplate_segments",
         "corpus_boilerplate_rewrite", "corpus_training_build"]
sf = "/root/testdata/sf0.1"
spark = get_spark("r15-chunk-ab")
spark.sparkContext.setLogLevel("ERROR")
reg = all_queries()
OLD = TA.chunk_documents
def NEW(df, id_col="doc_id", text_col="text", chunk_tokens=64, stride=48):
    return OLD(ensure_parallelism(df), id_col, text_col, chunk_tokens, stride)
def set_arm(new): TA.chunk_documents = NEW if new else OLD

def run(name):
    t0 = time.perf_counter()
    reg[name].spark_fn(spark, sf).write.format("noop").mode("overwrite").save()
    w = time.perf_counter() - t0; release_caches(); return round(w, 3)

try:
    for gate in ("corpus_boilerplate_segments",):
        set_arm(False); old = sorted(map(tuple, reg[gate].spark_fn(spark, sf).collect())); release_caches()
        set_arm(True);  new = sorted(map(tuple, reg[gate].spark_fn(spark, sf).collect())); release_caches()
        assert old == new; print(gate, "outputs identical:", len(new), flush=True)
    walls = {n: {"OLD": [], "NEW": []} for n in PLANS}
    set_arm(False)
    for n in PLANS: run(n)
    for _ in range(3):
        for arm in ("OLD", "NEW"):
            set_arm(arm == "NEW")
            for n in PLANS: walls[n][arm].append(run(n))
finally:
    set_arm(False)
for n in PLANS:
    line = f"{n:32s}"
    for arm in ("OLD","NEW"):
        w = sorted(walls[n][arm]); line += f"  {arm} best={w[0]:.3f} med={w[len(w)//2]:.3f}"
    print(line)

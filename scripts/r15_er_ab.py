#!/usr/bin/env python
"""Interleaved A/B: ensure_parallelism on entity_resolution_customers'
deletion-neighborhood variant explode (same single-task-scan class as
scripts/r15_parallelism_ab.py; the length+1 substring variants per
name are the CPU stage).

RESULT (r15 continuation, 4 reps interleaved, outputs identical,
2865 pairs): OLD best 2.211 / med 2.374 vs NEW best 1.111 / med 1.285
-> implemented in queries_extensions.er_candidate_pairs.
"""
import os, sys, time
sys.path.insert(0, "/root/repo")
from sp500_stock_etl_spark.caching import release_caches
from sp500_stock_etl_spark.io.readers import ensure_parallelism
from sp500_stock_etl_spark.plans.queries_extensions import _er_base, resolve_entities_lev1
from sp500_stock_etl_spark.session import get_spark

sf = "/root/testdata/sf0.1"
spark = get_spark("r15-er-ab")
spark.sparkContext.setLogLevel("ERROR")

def build(new):
    base = _er_base(spark, sf)
    if new:
        base = ensure_parallelism(base)
    return resolve_entities_lev1(base)

def noop(df): df.write.format("noop").mode("overwrite").save()

old = sorted(map(tuple, build(False).collect())); release_caches()
new = sorted(map(tuple, build(True).collect())); release_caches()
assert old == new, "mismatch"
print("outputs identical:", len(new), "pairs", flush=True)
walls = {"OLD": [], "NEW": []}
for lbl, n in (("OLD", False), ("NEW", True)): noop(build(n)); release_caches()
for _ in range(4):
    for lbl, n in (("OLD", False), ("NEW", True)):
        t0 = time.perf_counter(); noop(build(n)); walls[lbl].append(round(time.perf_counter()-t0,3)); release_caches()
for lbl in ("OLD","NEW"):
    w = sorted(walls[lbl]); print(f"{lbl} best={w[0]:.3f} med={w[len(w)//2]:.3f} walls={walls[lbl]}")

#!/usr/bin/env python
"""A/B evidence for the r14 Jaccard-union rewrite (OPTIMIZATION_r14.md §6).

Two instruments, both single-session and interleaved so the microVM's
multi-minute contention windows hit both arms equally:

1. MICROBENCH (the controlled one): a 1M-row localCheckpoint'ed frame
   of two ~120-element distinct string arrays with ~50% overlap; time
   `filter(j >= t).select(j)` to the noop sink with the NEW expression
   (inclusion-exclusion union) vs the OLD one
   (`size(array_distinct(concat))`), alternating arm order per rep.
   This isolates per-pair verify compute from everything else.
2. PER-QUERY A/B: run named registry queries alternating the two
   expressions by monkeypatching `dedup._jaccard_expr` — noisy at
   query grain (small pair counts make the expression immaterial),
   recorded for completeness.

Usage:
    python scripts/r14_jaccard_ab.py                  # microbench only
    python scripts/r14_jaccard_ab.py q1 q2 ...        # + per-query A/B
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sp500_stock_etl_spark.operators import dedup as D  # noqa: E402
from sp500_stock_etl_spark.session import get_spark  # noqa: E402

NEW = D._jaccard_expr


def OLD(a: str = "sh_a", b: str = "sh_b"):
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_distinct(F.concat(a, b))).cast("double")
    return inter / union


def microbench(spark, reps: int = 6) -> None:
    base = spark.range(1_000_000)

    def mk(off: int):
        return F.transform(
            F.sequence(F.lit(0), F.lit(119)),
            lambda i: F.concat(
                F.lit("shingle_token_"),
                (
                    (F.col("id") * F.lit(7) + i * F.lit(13)) % F.lit(200_000)
                    + F.lit(off)
                ).cast("string"),
            ),
        )

    df = base.select(
        mk(0).alias("sh_a"), mk(100_000).alias("sh_b")
    ).localCheckpoint()
    df.count()
    arms = {"new": NEW(), "old": OLD()}
    res: dict[str, list[float]] = {"new": [], "old": []}
    for rep in range(reps):
        order = ["new", "old"] if rep % 2 == 0 else ["old", "new"]
        for arm in order:
            t0 = time.perf_counter()
            (
                df.select(arms[arm].alias("j"))
                .where(F.col("j") >= 0.3)
                .write.format("noop")
                .mode("overwrite")
                .save()
            )
            res[arm].append(round(time.perf_counter() - t0, 3))
    for arm, walls in res.items():
        print(
            f"microbench {arm}: {walls} best={min(walls)} "
            f"median={sorted(walls)[len(walls) // 2]}",
            flush=True,
        )


def per_query(spark, names: list[str], reps: int = 4) -> None:
    from sp500_stock_etl_spark.plans.registry import all_queries

    registry = all_queries()
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for name in names:
        res: dict[str, list[float]] = {"new": [], "old": []}
        q = registry[name]
        q.spark_fn(spark, sf).write.format("noop").mode("overwrite").save()
        # r14 ADVICE (low): restore the monkeypatch in a finally so an
        # exception mid-loop cannot leave the module on OLD for the
        # rest of the process (would contaminate later per-query arms).
        try:
            for rep in range(reps):
                order = (
                    [("new", NEW), ("old", OLD)]
                    if rep % 2 == 0
                    else [("old", OLD), ("new", NEW)]
                )
                for arm, fn in order:
                    D._jaccard_expr = fn
                    t0 = time.perf_counter()
                    q.spark_fn(spark, sf).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    res[arm].append(round(time.perf_counter() - t0, 3))
        finally:
            D._jaccard_expr = NEW
        print(
            f"{name}: new={res['new']} best={min(res['new'])} | "
            f"old={res['old']} best={min(res['old'])}",
            flush=True,
        )


if __name__ == "__main__":
    spark = get_spark("r14-jaccard-ab")
    spark.sparkContext.setLogLevel("ERROR")
    microbench(spark)
    if sys.argv[1:]:
        per_query(spark, sys.argv[1:])

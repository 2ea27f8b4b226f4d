#!/usr/bin/env python
"""Skew-join probe (SURVEY §7.4 evidence): measure an engineered
hot-key join three ways — naive sort-merge, AQE skew-split, and
explicit salting — on the same data.

Setup: a fact table (lineitem ×N in-plan) whose join key is rewritten
so ~90% of rows share ONE hot key (the rest spread over 1k keys),
joined to a 1k-row keyed dim. Broadcast is disabled for the probe —
the scenario salting exists for is a dim too big to broadcast — so
the join is forced to sort-merge and the hot key lands on a single
reducer unless something intervenes:

1. naive: AQE skew splitting OFF → one straggler task does ~90% of
   the join work;
2. aqe_skew_split: AQE ON with thresholds lowered to engage at probe
   scale (at real scale the 256 MB defaults engage on their own);
3. salted: operators/skew.salted_join spreads the hot key over
   n_salts reducers by construction — the tool for the cases AQE
   can't re-plan (shuffle-hash, streaming state, bucketed layouts).

Prints one JSON line. Expect naive >> {aqe, salted}; the two
mitigations should be within noise of each other.
"""

from __future__ import annotations

import json
import os
import sys
import time
from contextlib import contextmanager
from functools import reduce

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from sp500_stock_etl_spark.io.readers import load_table  # noqa: E402
from sp500_stock_etl_spark.operators.skew import salted_join  # noqa: E402
from sp500_stock_etl_spark.session import get_spark  # noqa: E402

N_KEYS = 1000
HOT_FRACTION_MOD = 10  # l_orderkey % 10 < 9 → ~90% of rows on the hot key


@contextmanager
def confs(spark, **kv):
    old = {}
    for k, v in kv.items():
        key = k.replace("__", ".")
        old[key] = spark.conf.get(key, None)
        spark.conf.set(key, v)
    try:
        yield
    finally:
        for key, v in old.items():
            if v is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, v)


def timed(df) -> float:
    t = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t, 2)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("skew-probe")
    spark.sparkContext.setLogLevel("ERROR")

    li = load_table(spark, sf_dir, "lineitem")
    fact = reduce(
        lambda a, b: a.unionByName(b),
        [
            li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * 100_000_000))
            for i in range(n)
        ],
    ).withColumn(
        "join_key",
        F.when(F.col("l_orderkey") % HOT_FRACTION_MOD < 9, F.lit(0)).otherwise(
            F.pmod(F.col("l_orderkey"), F.lit(N_KEYS))
        ),
    )
    dim = spark.range(N_KEYS).select(
        F.col("id").alias("join_key"),
        F.concat(F.lit("grp_"), (F.col("id") % 7)).alias("dim_group"),
    )

    def plain():
        return (
            fact.join(dim, "join_key")
            .groupBy("dim_group")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("l_quantity").alias("qty"),
            )
        )

    def salted():
        return (
            salted_join(fact, dim, on="join_key", salt_source="l_linenumber", n_salts=32)
            .groupBy("dim_group")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("l_quantity").alias("qty"),
            )
        )

    no_broadcast = {"spark__sql__autoBroadcastJoinThreshold": "-1"}
    results = {}
    # Warmup scan so all three measurements hit a warm page cache.
    timed(fact.select(F.count(F.lit(1)).alias("c")))

    with confs(
        spark,
        **no_broadcast,
        spark__sql__adaptive__skewJoin__enabled="false",
        spark__sql__adaptive__coalescePartitions__enabled="false",
    ):
        results["naive_smj_sec"] = timed(plain())

    with confs(
        spark,
        **no_broadcast,
        spark__sql__adaptive__skewJoin__enabled="true",
        # Engage at probe scale; production keeps the 256 MB defaults.
        spark__sql__adaptive__skewJoin__skewedPartitionThresholdInBytes="1m",
        spark__sql__adaptive__advisoryPartitionSizeInBytes="256k",
    ):
        results["aqe_skew_split_sec"] = timed(plain())

    with confs(
        spark,
        **no_broadcast,
        spark__sql__adaptive__skewJoin__enabled="false",
    ):
        results["salted_sec"] = timed(salted())

    rows = fact.count()
    print(
        json.dumps(
            {
                "probe": "skew_join",
                "sf_dir": sf_dir,
                "replication": n,
                "fact_rows": rows,
                "hot_key_share": "~0.9",
                **results,
                "naive_over_salted_x": round(
                    results["naive_smj_sec"] / results["salted_sec"], 2
                ),
                "naive_over_aqe_x": round(
                    results["naive_smj_sec"] / results["aqe_skew_split_sec"], 2
                ),
            }
        )
    )


if __name__ == "__main__":
    main()

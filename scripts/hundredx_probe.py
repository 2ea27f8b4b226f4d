#!/usr/bin/env python
"""100x in-plan scale probe with SPILL and PEAK-MEMORY evidence
(round-8 verdict item 6: the first direct 100x-axis measurement —
wall-clock alone was the r1-r8 standard; this probe adds the memory
columns that show WHY the wall holds).

Family: the indicator risk-report capstone
(plans/queries_indicators.py::risk_report_frame) — daily P&L,
cumulative curve, drawdown, HHI, breadth, VaR95 — because it is the
family's integration exhibit and its scale story is the interesting
one: the replication axis is SYMBOLS (more series, constant per-key
depth, the way a real portfolio grows), the per-day aggregates keep a
calendar-bounded group count, and the one unpartitioned window runs
over days, not rows.

Replication is IN-PLAN via crossJoin(broadcast(range(n))) + symbol
remap — ONE parquet scan fans out n-fold inside the stage (a 100-way
union would bloat the plan; a broadcast range keeps it a single
nested-loop fan-out the optimizer folds into the scan stage).

Metrics come from the Spark UI REST API (a bespoke session with
spark.ui.enabled=true; the engine's default sessions keep it off):
per-stage memoryBytesSpilled / diskBytesSpilled / shuffle read+write
/ peakExecutionMemory, summed (peak: maxed) over the stages each run
contributed — stage ids are snapshotted before/after so concurrent
noise cannot leak in.

Usage: python scripts/hundredx_probe.py [n1 n2 ...]  (default 1 10 100)
Prints one JSON line per n; paste the table into BASELINE.md §11.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from sp500_stock_etl_spark.session import _RUNTIME_CONF, _ship_package  # noqa: E402

_UI_PORT = 4055


def _ui_json(path: str):
    with urllib.request.urlopen(
        f"http://localhost:{_UI_PORT}/api/v1/{path}", timeout=10
    ) as r:
        return json.load(r)


def _stages() -> dict[int, dict]:
    app_id = _ui_json("applications")[0]["id"]
    out = {}
    for s in _ui_json(f"applications/{app_id}/stages?status=complete"):
        out[(s["stageId"], s["attemptId"])] = s
    return out


def _max_exec_id() -> int:
    app_id = _ui_json("applications")[0]["id"]
    execs = _ui_json(f"applications/{app_id}/sql?length=1000")
    return max((e["id"] for e in execs), default=-1)


_SIZE_UNITS = {"B": 1, "KiB": 2**10, "MiB": 2**20, "GiB": 2**30, "TiB": 2**40}


def _parse_size_mb(value: str) -> float:
    """First '<float> <unit>' token in a UI-formatted metric value
    ('total (min, med, max ...)\\n29.5 GiB (...)' or plain '12.0 MiB')
    — the leading token is always the total."""
    import re

    m = re.search(r"([\d.]+)\s*(B|KiB|MiB|GiB|TiB)", value)
    if not m:
        return 0.0
    return round(float(m.group(1)) * _SIZE_UNITS[m.group(2)] / 1e6, 1)


def _sql_node_spill(exec_floor: int) -> list[dict]:
    """Per-OPERATOR spill for SQL executions newer than exec_floor:
    [{node, spill_mb}], largest first — names the Sort/HashAggregate/
    Window that spilled instead of an opaque stage id."""
    app_id = _ui_json("applications")[0]["id"]
    execs = _ui_json(f"applications/{app_id}/sql?details=true&length=1000")
    nodes: dict[str, float] = {}
    for e in execs:
        if e["id"] <= exec_floor:
            continue
        for node in e.get("nodes", []):
            for metric in node.get("metrics", []):
                if "spill" in metric["name"].lower():
                    mb = _parse_size_mb(metric["value"])
                    if mb > 0:
                        key = f'{node["nodeName"]}#{node["nodeId"]}'
                        nodes[key] = nodes.get(key, 0.0) + mb
    top = sorted(nodes.items(), key=lambda kv: -kv[1])[:6]
    return [{"node": k, "spill_mb": round(v, 1)} for k, v in top]


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [1, 10, 100]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    # At 100x, shuffle.partitions = cores (the sf0.1 tuning) makes each
    # sort/agg partition ~2M rows — too coarse for small heaps. The
    # cluster-correct fix is a high AQE initial partition count (big
    # stages keep it, small stages coalesce); expose it as a knob so
    # the probe can measure the partitioning axis, not just memory.
    init_parts = os.environ.get("SPARK_GRAFT_INITIAL_PARTITIONS")
    builder = (
        SparkSession.builder.appName("hundredx-probe")
        .master(f"local[{cpus}]")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(_UI_PORT))
    )
    if init_parts:
        builder = builder.config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            init_parts,
        )
    for k, v in _RUNTIME_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    _ship_package(spark)

    from sp500_stock_etl_spark.caching import release_caches
    from sp500_stock_etl_spark.plans.queries_indicators import (
        _stock,
        risk_report_frame,
    )

    def replicated_stock(n: int):
        st = _stock(spark, sf_dir)
        if n == 1:
            return st
        return st.crossJoin(
            F.broadcast(spark.range(n).select(F.col("id").alias("rep")))
        ).select(
            (F.col("symbol") + F.col("rep") * F.lit(100_000_000)).alias("symbol"),
            "trade_date",
            "order_key",
            "line_number",
            "cents",
        )

    # Warmup absorbs JVM/codegen startup so the n=1 row is steady-state.
    risk_report_frame(replicated_stock(1)).write.format("noop").mode(
        "overwrite"
    ).save()
    release_caches()

    for n in ns:
        before = set(_stages())
        exec_floor = _max_exec_id()
        t0 = time.perf_counter()
        df = risk_report_frame(replicated_stock(n))
        df.write.format("noop").mode("overwrite").save()
        wall = round(time.perf_counter() - t0, 2)
        # Metrics are snapshotted BEFORE the row-count sanity action so
        # the window covers exactly one execution of the plan (the
        # first cut of this probe counted every stage twice).
        mine = [s for k, s in _stages().items() if k not in before]
        per_node_spill = _sql_node_spill(exec_floor)
        rows = df.count()
        release_caches()
        rec = {
            "probe": "risk_report_100x",
            "n": n,
            "wall_sec": wall,
            "out_rows": rows,
            "input_rows": sum(s.get("inputRecords", 0) for s in mine),
            "shuffle_write_mb": round(
                sum(s.get("shuffleWriteBytes", 0) for s in mine) / 1e6, 1
            ),
            "shuffle_read_mb": round(
                sum(s.get("shuffleReadBytes", 0) for s in mine) / 1e6, 1
            ),
            "memory_spill_mb": round(
                sum(s.get("memoryBytesSpilled", 0) for s in mine) / 1e6, 1
            ),
            "disk_spill_mb": round(
                sum(s.get("diskBytesSpilled", 0) for s in mine) / 1e6, 1
            ),
            "peak_exec_memory_mb": round(
                max(
                    (s.get("peakExecutionMemory", 0) for s in mine),
                    default=0,
                )
                / 1e6,
                1,
            ),
            "n_stages": len(mine),
            # Per-stage attribution: the top spillers, so a regression
            # names its stage instead of hiding in the sum.
            "top_spill_stages": [
                {
                    "stage": s["stageId"],
                    "name": (s.get("name") or "")[:60],
                    "mem_spill_mb": round(s.get("memoryBytesSpilled", 0) / 1e6, 1),
                    "disk_spill_mb": round(s.get("diskBytesSpilled", 0) / 1e6, 1),
                    "tasks": s.get("numCompleteTasks", 0),
                }
                for s in sorted(
                    mine,
                    key=lambda s: -s.get("memoryBytesSpilled", 0),
                )[:5]
                if s.get("memoryBytesSpilled", 0) > 0
            ],
            "spill_by_operator": per_node_spill,
        }
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()

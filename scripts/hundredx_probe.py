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

Families:
- risk (default): the indicator risk-report capstone at n-x symbols
  (r11: the tuning.py partition advisor picks initialPartitionNum
  from the estimated volume — no hand-set env var);
- hybrid: the dual-evidence near-dup pipeline
  (corpus_doc_embedding_hybrid_dedup) at n-x corpora — replicas carry
  DISTINCT content (per-replica token suffixes; per-replica random
  sign flips on embeddings) so candidate volume must grow n-fold,
  never n^2-fold; the record includes lexical / embedding / agreement
  pair counts alongside the memory columns.
- cdc: the streaming CDC upsert at n-x feed AND store. Store-path env
  knobs: SPARK_GRAFT_CDC_BUCKETED=1 (partition-level merge),
  SPARK_GRAFT_CDC_FILESTATS=1 (manifest/file-level merge, r11;
  per-batch files/bytes read-back recorded), default = whole-store
  twin. Feed-sparsity knobs: SPARK_GRAFT_CDC_SPARSE_BUCKETS=K
  (bucket-sparse) and SPARK_GRAFT_CDC_SPARSE_RANGE=R
  (globally-range-clustered — hits every bucket, prunes by file).
- cc / sort families as documented at their functions.

Usage: python scripts/hundredx_probe.py [risk|hybrid|cc|cdc|sort] [n1 n2 ...]
(default: risk 1 10 100; hybrid defaults to 1 10 30)
Prints one JSON line per n; paste the table into BASELINE.md §11.
"""

from __future__ import annotations

import hashlib
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


def _sql_execs(app_id: str, details: bool = False) -> list[dict]:
    """All SQL executions, paging until the API returns a short page —
    a long-lived probe session can exceed any single `length`, and a
    silent truncation would mis-set exec_floor / drop spill rows."""
    page, offset, out = 1000, 0, []
    detail = "details=true&" if details else ""
    while True:
        batch = _ui_json(
            f"applications/{app_id}/sql?{detail}offset={offset}&length={page}"
        )
        out.extend(batch)
        if len(batch) < page:
            return out
        offset += page


def _max_exec_id() -> int:
    app_id = _ui_json("applications")[0]["id"]
    return max((e["id"] for e in _sql_execs(app_id)), default=-1)


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
    execs = _sql_execs(app_id, details=True)
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


def _build_session() -> SparkSession:
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
    return spark


def _replicate(df, n: int, id_cols: list[str], offset: int = 100_000_000):
    """n-x in-plan fan-out with disjoint id spaces; callers layer
    content perturbation (text suffix / sign flips) on top via the
    surviving ``rep`` column, then drop it."""
    if n == 1:
        return df.withColumn("rep", F.lit(0))
    rep = df.crossJoin(
        F.broadcast(df.sparkSession.range(n).select(F.col("id").alias("rep")))
    )
    for c in id_cols:
        rep = rep.withColumn(c, F.col(c) + F.col("rep") * F.lit(offset))
    return rep


def _measured(spark, label: str, n: int, run_action) -> dict:
    """Run ``run_action()`` (returns extra fields) inside a stage/SQL
    metrics window and emit one JSON record."""
    before = set(_stages())
    exec_floor = _max_exec_id()
    t0 = time.perf_counter()
    extra = run_action()
    wall = round(time.perf_counter() - t0, 2)
    # Metrics are snapshotted right after the timed action(s) so the
    # window covers exactly the run (the first cut of this probe also
    # counted the row-count sanity action and doubled every stage).
    from sp500_stock_etl_spark.hostinfo import host_stamp

    mine = [s for k, s in _stages().items() if k not in before]
    rec = {
        "probe": label,
        "n": n,
        **host_stamp(),
        "wall_sec": wall,
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
            max((s.get("peakExecutionMemory", 0) for s in mine), default=0)
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
                mine, key=lambda s: -s.get("memoryBytesSpilled", 0)
            )[:5]
            if s.get("memoryBytesSpilled", 0) > 0
        ],
        "spill_by_operator": _sql_node_spill(exec_floor),
        **extra,
    }
    print(json.dumps(rec), flush=True)
    return rec


def risk_probe(ns: list[int]) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = _build_session()

    from sp500_stock_etl_spark.caching import release_caches
    from sp500_stock_etl_spark.plans.queries_indicators import (
        _stock,
        risk_report_frame,
    )

    def replicated_stock(n: int):
        return _replicate(_stock(spark, sf_dir), n, ["symbol"]).drop("rep")

    # Warmup absorbs JVM/codegen startup so the n=1 row is steady-state.
    risk_report_frame(replicated_stock(1)).write.format("noop").mode(
        "overwrite"
    ).save()
    release_caches()

    # Partition advisor (r11, r10 verdict item 7): estimate the
    # replicated input volume and let the measured spill-cliff rule
    # pick initialPartitionNum — no hand-set SPARK_GRAFT_INITIAL_
    # PARTITIONS needed for the 1000x point, and a guaranteed no-op
    # in the smooth regime (advised=None).
    from sp500_stock_etl_spark.tuning import (
        sort_inflight_bytes,
        spill_safe_partitions,
    )

    base = _stock(spark, sf_dir)
    base_rows = base.count()

    for n in ns:
        est = sort_inflight_bytes(base_rows * n, base.schema)
        # Plan construction INSIDE the advisor scope: risk_report_frame
        # persists its daily rollup, and persist() compiles the cached
        # relation's physical plan AT CALL TIME — a frame built before
        # the conf change would keep 32-partition exchanges under the
        # cache no matter what the action later sees (found the hard
        # way: the first r11 1000x run OOMed in the window sort over a
        # 32-partition cached daily while every post-cache exchange
        # dutifully showed 251).
        with spill_safe_partitions(spark, est) as advised:
            df = risk_report_frame(replicated_stock(n))

            def action():
                df.write.format("noop").mode("overwrite").save()
                return {}

            _measured(spark, "risk_report_100x", n, action)
        print(
            json.dumps(
                {"n": n, "advised_initial_partitions": advised}
            ),
            flush=True,
        )
        # Row-count sanity OUTSIDE the metrics window, printed as its
        # own line (the first cut attached it to the record after the
        # record had already printed).
        print(json.dumps({"n": n, "out_rows": df.count()}), flush=True)
        release_caches()


def hybrid_probe(ns: list[int]) -> None:
    """n-x corpora through the dual-evidence near-dup pipeline. The
    scale claim under test is the CANDIDATE-VOLUME one: both sides are
    banded bucket joins, so with independent replica content the
    lexical pairs, embedding pairs, and agreement pairs must all grow
    n-fold (an all-pairs bug grows n^2-fold and this probe convicts
    it). Per-replica independence: every token gets a per-replica
    suffix (shingles disjoint across replicas) and every embedding a
    per-replica deterministic sign-flip pattern (cross-replica cosine
    ~ N(0, 1/64), far below the 0.9 threshold)."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = _build_session()

    from sp500_stock_etl_spark.caching import release_caches
    from sp500_stock_etl_spark.io.readers import load_table
    from sp500_stock_etl_spark.operators import dedup as D
    from sp500_stock_etl_spark.operators import similarity as S
    from sp500_stock_etl_spark.plans.queries_northstar import (
        _BANDS as _SRP_BANDS,
        _NEARDUP_OFFSET,
        _PLANES,
        _docs_with_neardups,
    )
    from sp500_stock_etl_spark.plans.queries_r7 import (
        _INC_BANDS,
        _INC_JT,
        _INC_NGRAM,
        _INC_NUM_HASHES,
    )

    _HYB_COS = 0.9
    _HYB_ZERO_FROM = 60

    def docs_n(n: int):
        base = _docs_with_neardups(spark, sf_dir)
        rep = _replicate(base, n, ["doc_id"], offset=1_000_000_000)
        # Per-replica token suffix: replica contents are disjoint at
        # the shingle level, so cross-replica lexical candidates are
        # structurally impossible (the dup RATE stays constant).
        return rep.select(
            "doc_id",
            F.regexp_replace(
                F.col("text"),
                F.lit(r"(\S+)"),
                F.concat(F.lit("$1q"), F.col("rep")),
            ).alias("text"),
        )

    def ebase_n(n: int):
        emb = load_table(spark, sf_dir, "embeddings")
        variants = emb.where(F.col("vec_id") % 5 == 0).select(
            (F.col("vec_id") + _NEARDUP_OFFSET).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: F.when(i < _HYB_ZERO_FROM, x).otherwise(
                    F.lit(0).cast("float")
                ),
            ).alias("embedding"),
        )
        base = emb.select("vec_id", "embedding").unionByName(variants)
        rep = _replicate(base, n, ["vec_id"], offset=1_000_000_000)
        # Per-replica sign flips: within-replica cosines are preserved
        # exactly (both vectors flip identically), cross-replica
        # cosines collapse to ~0.
        return rep.select(
            "vec_id",
            F.transform(
                "embedding",
                lambda x, i: F.when(
                    F.pmod(F.hash(F.col("rep") * F.lit(64) + i), F.lit(2))
                    == 0,
                    x,
                ).otherwise(-x),
            ).alias("embedding"),
        )

    n_vec_base = (
        load_table(spark, sf_dir, "embeddings").count() * 6 // 5
    )  # base + the %5 variants

    def build(n: int, fixed_r: bool):
        lex = D.minhash_lsh_dedup(
            docs_n(n), "doc_id", "text",
            ngram=_INC_NGRAM, num_hashes=_INC_NUM_HASHES,
            bands=_INC_BANDS, threshold=_INC_JT,
        )
        # The registered query PINS r = 8 planes/band (oracle
        # determinism at the test scale; queries_northstar.py:359).
        # The documented scale path is srp_params_for: r grows with
        # log N so expected bucket population — and candidates per
        # vector — stays constant. The probe runs the scaled r by
        # default and the pinned r on demand, so the quadratic cliff
        # of a fixed bucket space is a MEASURED exhibit, not a claim.
        r = _PLANES if fixed_r else S.srp_params_for(n_vec_base * n)
        ebase = ebase_n(n)
        sig = S.srp_id_band_rows(
            ebase, "__sid__", "vec_id", "embedding", _SRP_BANDS, r
        )
        band_cands = (
            sig.select(F.col("__sid__").alias("id_a"), "band", "sig")
            .join(
                sig.select(F.col("__sid__").alias("id_b"), "band", "sig"),
                ["band", "sig"],
            )
            .where(F.col("id_a") < F.col("id_b"))
        )
        epairs = S.cosine_neardup_pairs(
            ebase, threshold=_HYB_COS, planes=r, bands=_SRP_BANDS
        ).select(
            F.col("id_a").alias("doc_a"),
            F.col("id_b").alias("doc_b"),
            F.col("cosine").alias("cosine_sc"),
        )
        return r, lex, band_cands, epairs, lex.join(epairs, ["doc_a", "doc_b"])

    fixed_r = os.environ.get("SPARK_GRAFT_SRP_FIXED_R") == "1"

    # Warmup.
    build(1, fixed_r)[4].write.format("noop").mode("overwrite").save()
    release_caches()

    for n in ns:
        r, lex, band_cands, epairs, agree = build(n, fixed_r)

        def action():
            # No cache release between the actions: the shingle and
            # signature persists fill on the first count and the
            # agreement join reuses them, so the wall is one pipeline
            # plus cheap cached-side counts, not independent rebuilds.
            n_band = band_cands.count()
            n_lex = lex.count()
            n_emb = epairs.count()
            n_agree = agree.count()
            return {
                "srp_planes_per_band": r,
                "embedding_band_candidates": n_band,
                "lexical_pairs": n_lex,
                "embedding_pairs": n_emb,
                "agreement_pairs": n_agree,
            }

        _measured(spark, "hybrid_dedup_100x", n, action)
        release_caches()


def cc_probe(ns: list[int]) -> None:
    """Connected components at n-x EDGES with constant component
    diameter (each replica plants its own dup groups in a disjoint id
    space): the iterative min-label propagation must cost per-round
    join volume x a round count set by DIAMETER, not corpus size, so
    n-x edges = n-x per-round work at the same number of rounds."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = _build_session()

    from sp500_stock_etl_spark.caching import release_caches
    from sp500_stock_etl_spark.io.readers import load_table
    from sp500_stock_etl_spark.operators.dedup import connected_components

    n_docs = load_table(spark, sf_dir, "documents").count()

    def edges_n(n: int):
        # Star components of size <= 3 per replica (the exact-dup
        # shape): (i, i+10M) for i%3==0, (i, i+20M) for i%6==0.
        ids = spark.range(n_docs).select(F.col("id").alias("doc_id"))
        base = (
            ids.where(F.col("doc_id") % 3 == 0)
            .select(
                F.col("doc_id").alias("src"),
                (F.col("doc_id") + 10_000_000).alias("dst"),
            )
            .unionByName(
                ids.where(F.col("doc_id") % 6 == 0).select(
                    F.col("doc_id").alias("src"),
                    (F.col("doc_id") + 20_000_000).alias("dst"),
                )
            )
        )
        return _replicate(base, n, ["src", "dst"], offset=1_000_000_000).drop(
            "rep"
        )

    connected_components(edges_n(1)).write.format("noop").mode(
        "overwrite"
    ).save()
    release_caches()

    for n in ns:
        out = {}

        def action():
            # connected_components iterates EAGERLY (per-round
            # localCheckpoint), so the construction IS the work and
            # must happen inside the metrics window.
            out["df"] = connected_components(edges_n(n))
            out["df"].write.format("noop").mode("overwrite").save()
            return {}

        _measured(spark, "connected_components_100x", n, action)
        print(
            json.dumps(
                {
                    "n": n,
                    "components": out["df"]
                    .select("component")
                    .distinct()
                    .count(),
                    "nodes": out["df"].count(),
                }
            ),
            flush=True,
        )
        release_caches()


def cdc_probe(ns: list[int]) -> None:
    """n-x the streaming CDC merge (r9 verdict item 5): feed AND store
    both scale n-fold. Events replicate on event_id with a per-replica
    14-bit device key space (16384·n store keys), staged as four
    ts-ordered chunk files consumed with maxFilesPerTrigger=1 — the
    registered plan's exact shape (queries_streaming.py:1668), with
    the same ``_keep_newest`` union-rewrite in foreachBatch. Metrics:
    per-batch merge wall from the streaming progress log, per-version
    store rows + bytes, the stage window's shuffle/spill columns, and
    CARRY correctness: the final store must be row-for-row equal
    (exceptAll both ways = 0, all four columns, ts/value bit-exact) to
    the batch last-event-per-key rollup over the same replicated feed;
    ``carried_keys`` counts store keys whose last write predates the
    final chunk — the rows a cross-batch merge bug would lose."""
    import atexit
    import glob as _glob
    import shutil
    import tempfile

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = _build_session()

    from sp500_stock_etl_spark.io.readers import (
        _normalize_event_ts,
        load_table,
    )
    from sp500_stock_etl_spark.plans.queries_streaming import _keep_newest

    ev_raw = load_table(spark, sf_dir, "events")
    ev = ev_raw.select(
        "event_id",
        _normalize_event_ts(ev_raw.schema["ts"].dataType).alias("ts"),
        "value",
    )
    _OFFSET = 10_000_000
    _KEY_BITS = 14  # 16384 devices per replica

    from sp500_stock_etl_spark.plans.queries_streaming import (
        _cdc_device_expr,
    )

    # The registered query's xor-multiply scramble (NOT the old Knuth
    # multiplicative hash — that one is a low-discrepancy sequence, so
    # any contiguous id window covers every key and carry collapses to
    # zero), applied to the per-replica base id, then offset by
    # rep·2^14 so the store key space grows n-fold with the feed.
    _dev = _cdc_device_expr(
        lambda a, b: f"(({a}) ^ ({b}))",
        lambda a, b: f"(({a}) div {b})",
        id_expr=f"(event_id % {_OFFSET})",
    )

    def keyed_feed(n: int):
        rep = _replicate(ev, n, ["event_id"], offset=_OFFSET)
        return rep.select(
            (F.expr(_dev) + F.col("rep") * F.lit(1 << _KEY_BITS)).alias(
                "device_id"
            ),
            "ts",
            "event_id",
            "value",
        )

    _CUTS = ["2024-01-08", "2024-01-15", "2024-01-22"]

    def stage_chunks(keyed) -> str:
        d = tempfile.mkdtemp(prefix="sg_cdc_probe_feed_")
        atexit.register(shutil.rmtree, d, ignore_errors=True)
        conds = [
            F.col("ts") < _CUTS[0],
            (F.col("ts") >= _CUTS[0]) & (F.col("ts") < _CUTS[1]),
            (F.col("ts") >= _CUTS[1]) & (F.col("ts") < _CUTS[2]),
            F.col("ts") >= _CUTS[2],
        ]
        for i, cond in enumerate(conds):
            tmp = f"{d}/_w{i}"
            keyed.where(cond).coalesce(1).write.mode("overwrite").parquet(tmp)
            part = _glob.glob(f"{tmp}/part-*.parquet")
            if part:
                shutil.move(part[0], f"{d}/{i:03d}.parquet")
                os.utime(
                    f"{d}/{i:03d}.parquet",
                    (1700000000 + i, 1700000000 + i),
                )
            shutil.rmtree(tmp)
        return d

    # SPARK_GRAFT_CDC_BUCKETED=1 probes the PRODUCTION store path
    # (streaming_cdc_upsert_bucketed): Hive-partitioned by
    # bucket = device_id % 64, each batch rewriting only touched
    # buckets via merge_touched_partitions. Same feed, same
    # correctness gate.
    bucketed = os.environ.get("SPARK_GRAFT_CDC_BUCKETED") == "1"

    # SPARK_GRAFT_CDC_FILESTATS=1 probes the FILE-level manifest store
    # (streaming_cdc_upsert_filestats): key-range-clustered files per
    # bucket, merges select replaced files from the manifest's key
    # ranges, publish = atomic manifest swap. Per-batch read-back
    # stats (files/bytes) are recorded so the sparse-feed runs can
    # show read-back tracking touched KEYS on the streaming path too.
    filestats = os.environ.get("SPARK_GRAFT_CDC_FILESTATS") == "1"

    # SPARK_GRAFT_CDC_SPARSE_RANGE=R restricts every chunk AFTER the
    # first to the GLOBALLY-contiguous key range device_id < R·2^14
    # (the first R replicas' key spaces) — the clustered sparse shape
    # file-range pruning is built for: a key subset that is contiguous
    # in the global order but touches EVERY bucket (keys mod 64 cover
    # all buckets), so partition-level pruning gets nothing while file
    # ranges prune hard. Production analogue: recently-created
    # entities hot, old id ranges quiet. (A first cut restricted the
    # PER-REPLICA range device_id % 2^14 < M instead — that spreads n
    # clusters across the whole global range, one per replica, and the
    # 4 global range files per bucket all intersect: measured 256/256
    # files read, no pruning. Kept as a reminder that file stats prune
    # GLOBAL ranges, not per-tenant ones — per-tenant clustering needs
    # (tenant, key) as the range key.)
    sparse_range = int(os.environ.get("SPARK_GRAFT_CDC_SPARSE_RANGE", "0"))

    # SPARK_GRAFT_CDC_SPARSE_BUCKETS=K restricts every chunk AFTER the
    # first to devices in buckets < K (chunk 0 still builds the full
    # store): the production CDC regime where most entities are quiet
    # per window. Under it the bucketed path's per-batch read-back is
    # K/64 of the store while the whole-store twin still rewrites
    # everything — the measured crossover the uniform feed can't show.
    # The correctness gate (rollup over the SAME filtered feed) holds
    # in every mode.
    sparse_k = int(os.environ.get("SPARK_GRAFT_CDC_SPARSE_BUCKETS", "0"))

    for n in ns:
        keyed = keyed_feed(n)
        if sparse_k:
            keyed = keyed.where(
                (F.col("ts") < _CUTS[0])
                | (F.pmod("device_id", F.lit(64)) < sparse_k)
            )
        if sparse_range:
            keyed = keyed.where(
                (F.col("ts") < _CUTS[0])
                | (F.col("device_id") < sparse_range * (1 << _KEY_BITS))
            )
        staged = stage_chunks(keyed)
        store_base = tempfile.mkdtemp(prefix="sg_cdc_probe_store_")
        atexit.register(shutil.rmtree, store_base, ignore_errors=True)
        state: dict[str, str | None] = {"dir": None}
        merge_stats: list[dict] = []

        if filestats:
            from sp500_stock_etl_spark.io.manifest_store import (
                merge_manifest_store,
            )

            fstore = f"{store_base}/store"

            def _apply(batch_df, batch_id: int) -> None:
                latest = _keep_newest(batch_df).withColumn(
                    "bucket", F.pmod("device_id", F.lit(64)).cast("int")
                )
                merge_stats.append(
                    merge_manifest_store(
                        fstore, latest, "device_id", "bucket", _keep_newest
                    )
                )
                state["dir"] = fstore
        elif bucketed:
            from sp500_stock_etl_spark.io.writers import (
                merge_touched_partitions,
            )

            bstore = f"{store_base}/store"
            state["dir"] = None

            def _apply(batch_df, batch_id: int) -> None:
                latest = _keep_newest(batch_df).withColumn(
                    "bucket", F.pmod("device_id", F.lit(64)).cast("int")
                )
                merge_touched_partitions(
                    bstore, latest, "bucket", _keep_newest
                )
                state["dir"] = bstore
        else:

            def _apply(batch_df, batch_id: int) -> None:
                latest = _keep_newest(batch_df)
                if state["dir"] is not None:
                    old = batch_df.sparkSession.read.parquet(state["dir"])
                    latest = _keep_newest(old.unionByName(latest))
                new_dir = f"{store_base}/v{batch_id}"
                latest.write.mode("overwrite").parquet(new_dir)
                state["dir"] = new_dir

        schema = spark.read.parquet(staged).schema

        def action():
            q = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", "1")
                .parquet(staged)
                .writeStream.foreachBatch(_apply)
                .option(
                    "checkpointLocation",
                    tempfile.mkdtemp(prefix="sg_cdc_probe_ckpt_"),
                )
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            batches = [
                {
                    "batch": p["batchId"],
                    "rows": p["numInputRows"],
                    "wall_ms": p["durationMs"]["triggerExecution"],
                }
                for p in q.recentProgress
                if p["numInputRows"] > 0
            ]
            return {"batches": batches}

        rec = _measured(
            spark,
            "cdc_merge_bucketed_100x" if bucketed else "cdc_merge_100x",
            n,
            action,
        )

        # --- Outside the metrics window: store-size series + carry
        # correctness (bit-equal vs the batch rollup).
        versions = []
        for vdir in sorted(_glob.glob(f"{store_base}/v*")):
            files = _glob.glob(f"{vdir}/*.parquet")
            versions.append(
                {
                    "version": os.path.basename(vdir),
                    "rows": spark.read.parquet(vdir).count(),
                    "bytes": sum(os.path.getsize(f) for f in files),
                }
            )
        if filestats:
            from sp500_stock_etl_spark.io.manifest_store import read_store

            # Directory listing would see the retained dead generation;
            # the manifest IS the store.
            final = read_store(spark, state["dir"]).drop("bucket")
        else:
            final = spark.read.parquet(state["dir"]).drop("bucket")
        final_rows = final.count()
        rollup = _keep_newest(keyed)
        diff = (
            final.exceptAll(rollup).count()
            + rollup.exceptAll(final).count()
        )
        carried = final.where(F.col("ts") < _CUTS[2]).count()
        print(
            json.dumps(
                {
                    "n": n,
                    "bucketed": bucketed,
                    "filestats": filestats,
                    "sparse_buckets": sparse_k,
                    "sparse_range": sparse_range,
                    "store_versions": versions,
                    "merge_stats": [
                        {
                            k: s[k]
                            for k in (
                                "generation",
                                "files_read",
                                "files_total",
                                "bytes_read",
                                "bytes_total",
                            )
                        }
                        for s in merge_stats
                    ],
                    "final_store_rows": final_rows,
                    "bit_equal_vs_batch_rollup": diff == 0,
                    "symmetric_diff_rows": diff,
                    "carried_keys": carried,
                }
            ),
            flush=True,
        )
        from sp500_stock_etl_spark.caching import release_caches

        release_caches()
        shutil.rmtree(staged, ignore_errors=True)
        shutil.rmtree(store_base, ignore_errors=True)


def sort_probe(ns: list[int]) -> None:
    """Generalize the spill-regime cliff (BASELINE §12 risk series) to
    the other two sort-heavy shapes the r10 starters flagged. 1x =
    sf0.1 lineitem (600k rows), so the n axis matches the risk series
    row-for-row (1000x = 600M rows — the n the risk capstone cliffed
    at under 32 partitions / 8 GiB).

    Three runs per n:

    - global_sort — the registered O1 ordering (price desc, orderkey,
      linenumber) over ALL rows, noop sink. Range exchange + full
      per-partition UnsafeExternalSorter sort: rows/task grow n-fold
      at fixed partitioning, so the spill-file-merge cliff (each
      spill file costs a ~1 MB read-ahead buffer AT MERGE) must
      appear here if it generalizes.
    - topk — the SAME ordering with limit(100), collected (how the
      registered global_sort_topk is consumed). Claim under test:
      Spark plans TakeOrderedAndProject — a bounded per-partition
      heap + one driver merge, NO materialized sort — so this path
      is scan-bound and has no cliff at ANY n. The record carries
      plan flags (take_ordered / range_exchange) so a regression
      into a real global sort convicts itself, plus an
      order-sensitive hash of the 100 rows: at a given n the hash
      must be identical under every partitioning knob (bit-exact
      output independent of the memory/partition axis, same
      certificate the risk series used).
    - window — the reference's W1/W2 lag metrics over n-x SYMBOLS
      (WindowExec sorts each shuffle partition by (symbol, order);
      same sorter, same merge mechanics). Consumed by a 1-row
      xxhash64 checksum aggregate over every derived value — a
      bit-exactness certificate across n and across the
      partitioning knob for ~zero extra plan weight.

    Knob axis: SPARK_GRAFT_INITIAL_PARTITIONS (AQE initial partition
    count) — the cluster-correct remedy the risk series validated.
    Usage: python scripts/hundredx_probe.py sort [n1 n2 ...]
    (default 100 300 1000).
    """
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = _build_session()

    from sp500_stock_etl_spark.caching import release_caches
    from sp500_stock_etl_spark.io.readers import load_table
    from sp500_stock_etl_spark.operators.window_metrics import (
        with_lag_metrics,
    )
    from sp500_stock_etl_spark.plans.queries_indicators import _stock

    def replicated_li(n: int):
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_linenumber", "l_partkey", "l_extendedprice"
        )
        return _replicate(li, n, ["l_orderkey"]).drop("rep")

    _ORDER = (
        F.col("l_extendedprice").desc(),
        F.col("l_orderkey").asc(),
        F.col("l_linenumber").asc(),
    )

    # Warmup (JVM/codegen) so the first measured row is steady-state.
    replicated_li(1).orderBy(*_ORDER).limit(100).collect()
    release_caches()

    for n in ns:
        # --- 1. full global sort --------------------------------------
        gs = replicated_li(n).orderBy(*_ORDER)

        def gs_action():
            gs.write.format("noop").mode("overwrite").save()
            plan = gs._jdf.queryExecution().executedPlan().toString()
            return {
                "range_exchange": "rangepartitioning" in plan.lower(),
                "take_ordered": "TakeOrderedAndProject" in plan,
            }

        _measured(spark, "global_sort_100x", n, gs_action)
        release_caches()

        # --- 2. top-k over the same ordering --------------------------
        tk = replicated_li(n).orderBy(*_ORDER).limit(100)

        def tk_action():
            rows = tk.collect()
            plan = tk._jdf.queryExecution().executedPlan().toString()
            return {
                "rows_out": len(rows),
                # Order-SENSITIVE certificate: position folded in;
                # md5 over repr so it is stable across processes
                # (builtin hash() is salted for str).
                "topk_hash": hashlib.md5(
                    repr([(i, *r) for i, r in enumerate(rows)]).encode()
                ).hexdigest(),
                "take_ordered": "TakeOrderedAndProject" in plan,
                "range_exchange": "rangepartitioning" in plan.lower(),
            }

        _measured(spark, "topk_100x", n, tk_action)
        release_caches()

        # --- 3. window family (W1/W2 lag metrics) over n-x symbols ----
        stock = _replicate(_stock(spark, sf_dir), n, ["symbol"]).drop("rep")
        win = with_lag_metrics(
            stock.withColumn("close", F.col("cents") / F.lit(100.0)),
            "symbol",
            ("trade_date", "order_key", "line_number"),
            "close",
        )
        cert = win.agg(
            F.sum(
                F.xxhash64(
                    "symbol",
                    "trade_date",
                    "close_change",
                    "close_pct_change",
                )
            ).alias("checksum"),
            F.count(F.lit(1)).alias("rows"),
        )

        def win_action():
            row = cert.collect()[0]
            return {"window_checksum": row["checksum"], "rows_out": row["rows"]}

        _measured(spark, "window_lag_100x", n, win_action)
        release_caches()


if __name__ == "__main__":
    args = sys.argv[1:]
    family = "risk"
    if args and args[0] in ("risk", "hybrid", "cc", "cdc", "sort"):
        family = args.pop(0)
    ns = [int(a) for a in args]
    if family == "hybrid":
        hybrid_probe(ns or [1, 10, 30])
    elif family == "cc":
        cc_probe(ns or [1, 10, 100])
    elif family == "cdc":
        cdc_probe(ns or [1, 10, 100])
    elif family == "sort":
        sort_probe(ns or [100, 300, 1000])
    else:
        risk_probe(ns or [1, 10, 100])

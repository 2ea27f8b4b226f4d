#!/usr/bin/env python
"""State-store sizing probe for 24/7 streaming (SURVEY §2.11 /
BASELINE stretch): measure what the stateful operators actually keep
in the state store, derive bytes-per-key, and project the store size
a continuous deployment would hold at the watermark horizon.

Why this matters at scale: a Structured Streaming stateful operator's
memory footprint is ``live keys × bytes/key``, where live keys =
(windows inside the watermark horizon) × (group-key cardinality).
Wall-clock throughput is easy to scale with executors; the state store
is the resource that grows with key cardinality and watermark length,
so capacity planning needs the bytes/key constant — which this probe
measures from ``StreamingQueryProgress.stateOperators`` rather than
guessing.

Probes (events table at $SPARK_GRAFT_SF_DIR, availableNow over a
checkpoint, memory sink):

1. tumbling 1h windows × event_type, 2h watermark;
2. sliding 2h/1h windows (each event in 2 windows — state doubles);
3. session windows per user (state ∝ live users);
4. applyInPandasWithState running totals (unbounded keys — the shape
   that needs a TTL at 100 TB, called out in the JSON).

5. (round-4) TTL eviction before/after: running_user_totals vs the
   EventTimeTimeout twin driven past the TTL horizon — the measured
   case that the TTL caps state at active keys, not all-time keys;
6. (round-4) state-store provider comparison: the same high-card
   tumbling agg under the HDFS-backed heap map vs RocksDB —
   commit/update latencies and state rows from the progress metrics.

Prints ONE JSON line with measured rows/bytes and the 24/7 projection
for 1e6 and 1e8 group keys.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sp500_stock_etl_spark.plans.queries_streaming import (  # noqa: E402
    _stage_events_dir,
)
from sp500_stock_etl_spark.session import get_spark  # noqa: E402
from sp500_stock_etl_spark.streaming import events as EV  # noqa: E402


def _run_and_measure(stream_df, checkpoint: str, name: str, output_mode: str):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # availableNow may run several micro-batches; the last progress
    # with stateOperators carries the final store size.
    for prog in reversed(q.recentProgress):
        ops = prog.get("stateOperators") or []
        if ops:
            op = ops[0]
            rows = op.get("numRowsTotal", 0)
            # memoryUsedBytes retains prior loaded map VERSIONS
            # (maxBatchesToRetainInMemory), including the full
            # pre-eviction state — stateOnCurrentVersionSizeBytes is
            # the live store only.
            cur = (op.get("customMetrics") or {}).get(
                "stateOnCurrentVersionSizeBytes"
            )
            byts = cur if cur is not None else op.get("memoryUsedBytes", 0)
            # The store's hash maps are sized by the PEAK key count of
            # the run (eviction frees values, not the backing array),
            # so peak keys — removed + live — is the honest per-key
            # denominator, and also the planning-relevant one: a 24/7
            # store stays sized at its steady-state live count.
            peak = rows + op.get("numRowsRemoved", 0)
            return {
                "operator": op.get("operatorName", "?"),
                "state_rows": rows,
                "peak_keys": peak,
                "state_bytes": byts,
                "retained_versions_bytes": op.get("memoryUsedBytes", 0),
                "bytes_per_peak_key": round(byts / peak, 1) if peak else None,
            }
    return {
        "operator": None,
        "state_rows": 0,
        "peak_keys": 0,
        "state_bytes": 0,
        "bytes_per_peak_key": None,
    }


def _tumbling_by(events, key_col: str):
    from pyspark.sql import functions as F

    return (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), key_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), key_col, "n")
    )


def _op_latencies(q) -> dict:
    """Pull the state operator's latency metrics from the last progress
    that carries them (availableNow runs several micro-batches)."""
    for prog in reversed(q.recentProgress):
        ops = prog.get("stateOperators") or []
        if ops:
            op = ops[0]
            return {
                "state_rows": op.get("numRowsTotal"),
                "all_updates_ms": op.get("allUpdatesTimeMs"),
                "all_removals_ms": op.get("allRemovalsTimeMs"),
                "commit_ms": op.get("commitTimeMs"),
                "batch_duration_ms": prog.get("batchDuration"),
            }
    return {}


def _ttl_eviction_probe(spark, sf_dir: str, work: str) -> dict:
    """Run the TTL twin twice against one checkpoint: first the real
    events file, then a single far-future event that advances the
    watermark past every key's TTL — the second run must evict
    (numRowsRemoved ≈ run-1 key count), which is the measured
    bounded-state claim for the 24/7 deployment."""
    import glob
    import shutil

    from pyspark.sql import functions as F

    landing = os.path.join(work, "ttl_landing")
    os.makedirs(landing)
    os.symlink(f"{sf_dir}/events.parquet", f"{landing}/events.parquet")
    ckpt = os.path.join(work, "ttl_ckpt")
    out = os.path.join(work, "ttl_out")

    def run(tag: str) -> dict:
        stream = EV.read_event_stream(spark, landing)
        q = (
            EV.running_user_totals_ttl(stream, ttl_ms=3_600_000)
            .writeStream.foreachBatch(
                lambda df, _b: df.write.mode("append").parquet(out)
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        removed = 0
        m = {}
        for prog in q.recentProgress:
            for op in prog.get("stateOperators") or []:
                removed += op.get("numRowsRemoved", 0)
                m = {
                    "state_rows": op.get("numRowsTotal"),
                    "state_bytes": (op.get("customMetrics") or {}).get(
                        "stateOnCurrentVersionSizeBytes",
                        op.get("memoryUsedBytes"),
                    ),
                }
        return {"tag": tag, "rows_removed": removed, **m}

    before = run("full_events")

    # One future event at max ts + watermark delay (2h) + TTL (1h) +
    # 1h margin: replaying it advances the watermark far enough that
    # EVERY key from run 1 times out. Written with the landing dir's
    # OWN schema (the generator's ts type varies round to round; a
    # mixed-type landing dir fails the scan).
    import datetime

    raw = spark.read.parquet(landing)
    max_raw_ts = raw.agg(F.max("ts")).collect()[0][0]
    if isinstance(max_raw_ts, int):  # int64 nanos variant
        fut_ts = max_raw_ts + int(4 * 3600 * 1e9)
    else:
        fut_ts = max_raw_ts + datetime.timedelta(hours=4)
    fut = spark.createDataFrame(
        [(10**9, fut_ts, 10**9, "click", 1.0, "{}")], schema=raw.schema
    )
    stage = os.path.join(work, "ttl_stage")
    fut.coalesce(1).write.mode("overwrite").parquet(stage)
    src = glob.glob(os.path.join(stage, "*.parquet"))[0]
    shutil.copy(src, os.path.join(landing, "future.parquet"))

    after = run("future_event_past_ttl")
    return {
        "ttl_ms": 3_600_000,
        "before": before,
        "after": after,
        "claim": "rows_removed(after) ~= state_rows(before): the TTL "
        "caps state at keys active within horizon+TTL; the unbounded "
        "twin would have kept every all-time key",
    }


def _provider_compare(spark, sf_dir: str, work: str) -> dict:
    """Same high-cardinality tumbling agg under both state-store
    providers; separate checkpoints (a checkpoint pins its provider).
    RocksDB's value at this toy scale is NOT latency — it is keeping
    1e8-key state off-heap (no GC wall) with changelog checkpointing;
    the probe records the latencies so the overhead is known."""
    from pyspark.sql import functions as F  # noqa: F401

    providers = {
        "hdfs_heap_map": (
            "org.apache.spark.sql.execution.streaming.state."
            "HDFSBackedStateStoreProvider"
        ),
        "rocksdb": (
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider"
        ),
    }
    key = "spark.sql.streaming.stateStore.providerClass"
    try:
        prev = spark.conf.get(key)
    except Exception:
        prev = None
    out = {}
    try:
        for label, cls in providers.items():
            spark.conf.set(key, cls)
            stream = EV.read_event_stream(spark, _stage_events_dir(sf_dir))
            q = (
                _tumbling_by(stream, "user_id")
                .writeStream.format("memory")
                .queryName(f"sp_prov_{label}")
                .outputMode("append")
                .option("checkpointLocation", os.path.join(work, f"prov_{label}"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            out[label] = _op_latencies(q)
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("state-probe")
    work = tempfile.mkdtemp(prefix="state_probe_")
    try:
        stream = EV.read_event_stream(spark, _stage_events_dir(sf_dir))
        # The raw stateMemory at tiny key counts is dominated by FIXED
        # per-partition store overhead (empty HDFS-backed map + version
        # bookkeeping per shuffle partition), so bytes/key is derived
        # MARGINALLY from two cardinalities of the SAME operator shape:
        # marginal = (bytes_hi - bytes_lo) / (rows_hi - rows_lo).
        lo = _run_and_measure(
            _tumbling_by(stream, "event_type"),
            os.path.join(work, "lo"), "sp_lo", "append",
        )
        hi = _run_and_measure(
            _tumbling_by(stream, "user_id"),
            os.path.join(work, "hi"), "sp_hi", "append",
        )
        d_keys = hi["peak_keys"] - lo["peak_keys"]
        marginal = (
            (hi["state_bytes"] - lo["state_bytes"]) / d_keys if d_keys else None
        )
        results = {
            "tumbling_1h_low_card_by_type": lo,
            "tumbling_1h_high_card_by_user": hi,
            "marginal_bytes_per_window_key": round(marginal, 1) if marginal else None,
            "fixed_store_overhead_bytes": (
                max(0, int(lo["state_bytes"] - lo["peak_keys"] * marginal))
                if marginal
                else None
            ),
            "session_30m_per_user": _run_and_measure(
                EV.session_counts(stream, "30 minutes"),
                os.path.join(work, "w"), "sp_w", "append",
            ),
            "running_totals_per_user": _run_and_measure(
                EV.running_user_totals(stream),
                os.path.join(work, "r"), "sp_r", "update",
            ),
            "ttl_eviction": _ttl_eviction_probe(spark, sf_dir, work),
            "state_store_providers": _provider_compare(spark, sf_dir, work),
        }
        # 24/7 projection: a CONTINUOUS deployment holds only windows
        # inside the watermark horizon (closed windows are evicted), so
        # store size = live_windows x keys x marginal bytes/key + fixed
        # overhead per store partition. 2h watermark / 1h windows =>
        # <=3 window generations live per key.
        bpk = marginal or 0.0
        live_windows = 3
        results["projection_24x7_tumbling"] = {
            "assumptions": "1h windows, 2h watermark => <=3 live window "
            "generations per group key; MARGINAL bytes/key measured "
            "above (fixed per-partition store overhead excluded — it "
            "does not scale with keys)",
            "at_1e6_keys_gb": round(bpk * live_windows * 1e6 / 2**30, 3),
            "at_1e8_keys_gb": round(bpk * live_windows * 1e8 / 2**30, 3),
            "note": "running_totals (applyInPandasWithState, NoTimeout) "
            "is the unbounded one: state grows with ALL-TIME key "
            "cardinality; a 24/7 deployment needs a state TTL "
            "(GroupStateTimeout) or periodic key expiry.",
        }
        print(json.dumps({"probe": "state_store_sizing", "sf_dir": sf_dir, **{"results": results}}))
    finally:
        shutil.rmtree(work, ignore_errors=True)


def large_state_probe(n_keys: int = 10_000_000) -> None:
    """Round-7 probe (r6 verdict item 7): drive the RocksDB provider
    PAST heap-comfortable state — ``n_keys`` distinct group keys
    through a stateful tumbling agg with changelog checkpointing —
    then restart from the checkpoint with a small tail batch and
    measure the reload-to-completion time. This is the measured
    evidence behind the §4 1e8-key projection: bytes/key at real
    cardinality (not extrapolated from toy counts), SST footprint,
    and the restart cost a 24/7 deployment pays after a driver loss.

    Input is generated in-plan (one hour of per-key events, every key
    distinct) and staged as parquet so the probe has no dependency on
    the testdata volume. Run: python scripts/state_probe.py large [n].
    """
    import time

    from pyspark.sql import functions as F

    spark = get_spark("large-state-probe")
    work = tempfile.mkdtemp(prefix="large_state_")
    landing = os.path.join(work, "landing")
    ckpt = os.path.join(work, "ckpt")
    try:
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        spark.conf.set(
            "spark.sql.streaming.stateStore.rocksdb."
            "changelogCheckpointing.enabled",
            "true",
        )
        base = "TIMESTAMP'2024-01-01 00:00:00'"
        gen = spark.range(n_keys).select(
            F.col("id").alias("user_id"),
            F.expr(f"{base} + make_interval(0,0,0,0,0,0, id % 3600)").alias(
                "ts"
            ),
            (F.col("id") % 97).alias("value"),
        )
        gen.write.mode("overwrite").parquet(landing)

        def run(tag: str) -> dict:
            stream = (
                spark.readStream.schema(
                    "user_id BIGINT, ts TIMESTAMP, value BIGINT"
                )
                .parquet(landing)
                .withWatermark("ts", "2 hours")
                .groupBy(F.window("ts", "1 hour"), "user_id")
                .agg(F.count(F.lit(1)).alias("n"))
            )
            t0 = time.time()
            q = (
                stream.writeStream.foreachBatch(
                    lambda df, _b: df.write.format("noop")
                    .mode("overwrite")
                    .save()
                )
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            wall = round(time.time() - t0, 2)
            metrics = {}
            for prog in reversed(q.recentProgress):
                ops = prog.get("stateOperators") or []
                if ops:
                    op = ops[0]
                    cm = op.get("customMetrics") or {}
                    # At this scale state lives in memtables + the
                    # changelog (nothing compacts to SSTs), so the
                    # honest footprint is memoryUsedBytes; the commit
                    # cost is the changelog writer, and the restart
                    # cost shows up as rocksdbLoadLatencyMs.
                    metrics = {
                        "state_rows": op.get("numRowsTotal"),
                        "state_bytes": op.get("memoryUsedBytes"),
                        "updates_ms": op.get("allUpdatesTimeMs"),
                        "commit_ms": op.get("commitTimeMs"),
                        "changelog_commit_ms": cm.get(
                            "rocksdbChangeLogWriterCommitLatencyMs"
                        ),
                        "store_load_ms": cm.get("rocksdbLoadLatencyMs"),
                    }
                    break
            return {"tag": tag, "wall_sec": wall, **metrics}

        first = run("initial_load")

        # Tail batch: 1000 more rows for EXISTING keys — the restart
        # must reload/open n_keys of state before it can update them.
        tail = spark.range(1000).select(
            F.col("id").alias("user_id"),
            F.expr(f"{base} + make_interval(0,0,0,0,0,30, id % 60)").alias(
                "ts"
            ),
            F.lit(1).cast("bigint").alias("value"),
        )
        tail.coalesce(1).write.mode("append").parquet(landing)
        second = run("restart_tail_batch")

        byts = first.get("state_bytes") or 0
        rows = first.get("state_rows") or 1
        print(json.dumps({
            "probe": "rocksdb_large_state",
            "n_keys": n_keys,
            "initial_load": first,
            "restart": second,
            "bytes_per_key": round(byts / rows, 1) if rows else None,
            "projection_1e8_keys_gb": round(byts / rows * 1e8 / 2**30, 2)
            if rows
            else None,
            "notes": "changelog checkpointing ON: the restart replays "
            "the changelog onto the last snapshot instead of "
            "re-uploading full SSTs; restart wall includes state "
            "reload for every partition before the 1000-row tail "
            "commits.",
        }), flush=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def state_scale_probe(ns: list[int]) -> None:
    """Feed-density axis for the session store (round-8 verdict item
    6's state-store half, alongside scripts/hundredx_probe.py's
    shuffle-spill axis): replicate the events feed n-x with DISJOINT
    user spaces — live session keys scale n-fold while the watermark
    horizon stays fixed — and record state rows, live-store bytes and
    the marginal bytes/key at each n. The claim under test: session
    state grows linearly in live keys with a flat per-key cost (the
    watermark, not corpus size, bounds the store), so a 100x feed
    needs 100x state bytes and nothing else.

    Usage: python scripts/state_probe.py scale [n1 n2 ...]
    (default 1 10 30; one JSON line per n)
    """
    import time

    from pyspark.sql import functions as F

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("state-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="state_scale_")
    try:
        staged = _stage_events_dir(sf_dir)
        base = spark.read.parquet(staged)
        prev = None
        for n in ns:
            landing = os.path.join(work, f"n{n}")
            rep = base.crossJoin(
                F.broadcast(spark.range(n).select(F.col("id").alias("rep")))
            ).select(
                *[
                    (F.col("user_id") + F.col("rep") * F.lit(1_000_000_000)).alias(
                        "user_id"
                    )
                    if c == "user_id"
                    else F.col(c)
                    for c in base.columns
                ]
            )
            rep.write.mode("overwrite").parquet(landing)
            stream = EV.read_event_stream(spark, landing)
            t0 = time.time()
            m = _run_and_measure(
                EV.session_counts(stream, "30 minutes"),
                os.path.join(work, f"ck{n}"),
                f"sp_scale_{n}",
                "append",
            )
            rec = {
                "probe": "session_state_scale",
                "n": n,
                "wall_sec": round(time.time() - t0, 2),
                **m,
            }
            if prev and m["peak_keys"] != prev["peak_keys"]:
                rec["marginal_bytes_per_key_vs_prev"] = round(
                    (m["state_bytes"] - prev["state_bytes"])
                    / (m["peak_keys"] - prev["peak_keys"]),
                    1,
                )
            prev = m
            print(json.dumps(rec), flush=True)
            spark.catalog.dropTempView(f"sp_scale_{n}")
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "large":
        large_state_probe(int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000)
    elif len(sys.argv) > 1 and sys.argv[1] == "scale":
        state_scale_probe([int(a) for a in sys.argv[2:]] or [1, 10, 30])
    else:
        main()

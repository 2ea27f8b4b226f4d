"""Structured Streaming slice (SURVEY.md §2.11 mapping + §7.1 step 5).

The reference has no streams — its "incremental" semantics are a daily
Airflow rerun over a re-read window plus idempotent re-upload
(dags/sp500_dag.py.py:324, :21, :285). The exact Spark analogue is a
file-stream source with ``trigger(availableNow=True)`` + checkpoint:
each run processes only files not yet in the checkpoint — the
exactly-once version of the reference's PURGE=TRUE bookkeeping (:378).

On top of that (deliberate extension, SURVEY.md §7.3): event-time
windowed aggregation with watermarks (tumbling / sliding / session),
and a custom stateful operator via applyInPandasWithState.

Scale notes: state store size is bounded by the watermark horizon ×
key cardinality; the shuffle key is the window/user key, same
partitioning rules as batch groupBy. All sinks here are append/update
memory or parquet sinks for tests; production would write
date-partitioned parquet (io/writers.py) for DPP.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# File-stream sources need an explicit schema (no inference at stream
# planning time). Kept with ts as int64 nanos for tests that fabricate
# raw landing files; read_event_stream adapts to whatever the landing
# files actually contain.
EVENTS_RAW = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-stream source over the events parquet; one file today, a
    landing directory in production — same plan either way.

    The stream schema comes from a batch footer peek of the landing
    directory (streams can't infer), and ts is normalized to UTC
    TIMESTAMP whether the generator wrote int64 nanos, plain-micros
    timestamp_ntz, or canonical timestamp (io/readers.py has the
    same ladder for the batch path)."""
    from ..io.readers import _normalize_event_ts

    schema = spark.read.parquet(path).schema
    raw = spark.readStream.schema(schema).parquet(path)
    return raw.withColumn("ts", _normalize_event_ts(schema["ts"].dataType))


def tumbling_counts(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Tumbling event-time windows with late-data cutoff."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_avg(events: DataFrame, window: str = "2 hours", slide: str = "1 hour") -> DataFrame:
    """Sliding windows — each event lands in window/slide buckets."""
    return (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.avg("value").alias("avg_value"))
        .select(F.col("w.start").alias("window_start"), "n", "avg_value")
    )


def session_counts(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Session windows per user: a session closes after `gap` idle."""
    return (
        events.withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
        )
    )


_RUNNING_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def _running_totals(key, pdfs, state: GroupState):
    """Custom stateful op: running per-user totals across micro-batches."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """applyInPandasWithState: arbitrary per-key state the built-in
    windows can't express (monotone running totals, emitted every
    micro-batch).

    NoTimeout: state grows with ALL-TIME key cardinality — correct for
    bounded replays (availableNow over a finite landing dir), a
    scale-killer for 24/7 deployment. The bounded twin is
    running_user_totals_ttl below."""
    return events.groupBy("user_id").applyInPandasWithState(
        _running_totals,
        outputStructType=_RUNNING_SCHEMA,
        stateStructType="n BIGINT, total DOUBLE",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_RUNNING_CENTS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_cents", T.LongType()),
    ]
)


def running_user_totals_cents(events: DataFrame) -> DataFrame:
    """Integer-state twin of running_user_totals (r8): the per-key
    accumulator is BIGINT cents (floor(value*100)), so the running
    total is ASSOCIATIVE-EXACT — no float-sum order dependence across
    micro-batch boundaries — and the FINAL emission per key (max
    n_events; n is strictly increasing for a key) equals the batch
    groupBy regardless of how the stream was batched. That final-state
    projection is what streaming_running_totals_final hash-checks
    against DuckDB; the double twin remains the update-mode exhibit."""

    def fn(key, pdfs, state: GroupState):
        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            cents += int(np.floor(pdf["value"].to_numpy() * 100.0).sum())
        state.update((n, cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_cents": [cents]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=_RUNNING_CENTS_SCHEMA,
        stateStructType="n BIGINT, cents BIGINT",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_user_totals_ttl(
    events: DataFrame, ttl_ms: int = 3_600_000, watermark: str = "2 hours"
) -> DataFrame:
    """Bounded-state twin of running_user_totals (round-2 verdict item
    4): EventTimeTimeout evicts a user's state once the watermark
    passes their last event by ``ttl_ms``. Totals RESTART after an
    idle gap longer than the TTL — the deliberate semantics trade that
    caps state at (keys active within horizon+TTL) × bytes/key instead
    of all-time key cardinality. Event-time (not processing-time)
    timeout so replays of the same files are deterministic.

    Timeout mechanics: Spark invokes the function once per key with
    ``state.hasTimedOut`` when the watermark passes the registered
    timestamp and the key has no data in the batch — that invocation
    removes the state and emits nothing. ``scripts/state_probe.py``
    measures the before/after state rows; tests drive eviction across
    checkpointed availableNow runs."""

    def fn(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        n, total, last_ms = state.get if state.exists else (0, 0.0, 0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            # pandas datetime64[ns] → epoch ms
            last_ms = max(last_ms, int(pdf["ts"].max().value // 1_000_000))
        state.update((n, total, last_ms))
        # Must register strictly past the current watermark or Spark
        # rejects the timestamp (the key would be already expired).
        state.setTimeoutTimestamp(
            max(last_ms + ttl_ms, state.getCurrentWatermarkMs() + 1)
        )
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=_RUNNING_SCHEMA,
            stateStructType="n BIGINT, total DOUBLE, last_ms BIGINT",
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def run_available_now(
    stream_df: DataFrame, checkpoint: str, query_name: str, output_mode: str = "append"
) -> None:
    """The reference's daily-batch semantics: process everything new,
    then stop (trigger availableNow + checkpoint = exactly-once over
    files, replacing replace=True/PURGE=TRUE bookkeeping)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def running_user_totals_tws(events: DataFrame, ttl_ms: int | None = None) -> DataFrame:
    """Spark 4 ``transformWithStateInPandas`` version of the running
    totals: the successor API to applyInPandasWithState — typed state
    handles (ValueState here; List/MapState for bigger shapes), state
    TTL as a first-class argument instead of hand-rolled timeout
    bookkeeping, and RocksDB-only state storage (the session conf is
    set by the caller; queries_streaming wires it with save/restore).
    Same output contract as running_user_totals, so the two APIs are
    directly comparable in tests."""
    import pandas as pd

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _Totals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals", "n BIGINT, total DOUBLE", ttlDurationMs=ttl_ms
            )

        def handleInputRows(self, key, rows, timerValues):
            if self._state.exists():
                n, total = self._state.get()
            else:
                n, total = 0, 0.0
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_Totals(),
        outputStructType=_RUNNING_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def upsert_partition_sink(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    partition_col: str = "event_date",
) -> None:
    """Idempotent warehouse sink for streams without a transactional
    table format: each micro-batch overwrites exactly the partitions
    it touches (dynamic partitionOverwriteMode inside foreachBatch) —
    the streaming twin of the batch overwrite-by-partition reload
    (io/writers.py, the reference's replace=True/PURGE semantics).

    Effectively-once without sink transactions: a replayed batch
    (failure before checkpoint commit, or a checkpoint wiped and the
    whole history re-run) rewrites the same partitions to the same
    content instead of appending duplicates. The guarantee needs the
    batch->partition mapping to be deterministic, which file-stream
    sources + event-time partitions give. Conf is save/restored around
    each batch write."""

    def _write(df: DataFrame, _batch_id: int) -> None:
        spark = df.sparkSession
        key = "spark.sql.sources.partitionOverwriteMode"
        try:
            prev = spark.conf.get(key)
        except Exception:
            prev = None
        spark.conf.set(key, "dynamic")
        try:
            df.write.mode("overwrite").partitionBy(partition_col).parquet(path)
        finally:
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)

    q = (
        stream_df.writeStream.foreachBatch(_write)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

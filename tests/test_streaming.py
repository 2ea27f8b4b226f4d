"""Streaming slice tests: availableNow trigger semantics (the
reference's daily batch, SURVEY.md §2.11), watermarked windows,
session windows, custom stateful operator."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sp500_stock_etl_spark.streaming import events as SE


@pytest.fixture(scope="module")
def events_dir(sf_dir, tmp_path_factory):
    # File-stream sources require a directory ("landing zone"); stage
    # one with a symlink to the (read-only) testdata parquet.
    d = tmp_path_factory.mktemp("events_stream")
    (d / "events.parquet").symlink_to(f"{sf_dir}/events.parquet")
    return str(d)


@pytest.fixture()
def event_stream(spark, events_dir):
    return SE.read_event_stream(spark, events_dir)


def _batch_events(spark, sf_dir):
    from sp500_stock_etl_spark.io.readers import load_table

    return load_table(spark, sf_dir, "events")


def test_tumbling_counts_match_batch(spark, sf_dir, event_stream, tmp_path):
    SE.run_available_now(
        SE.tumbling_counts(event_stream), str(tmp_path / "ckpt"), "t_tumble"
    )
    got = {
        (r.window_start, r.event_type): (r.n, r.sum_value)
        for r in spark.sql("SELECT * FROM t_tumble").collect()
    }
    batch = _batch_events(spark, sf_dir)
    want = {
        (r.ws, r.event_type): (r.n, r.sum_value)
        for r in batch.groupBy(
            F.date_trunc("hour", "ts").alias("ws"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("sum_value"),
        )
        .collect()
    }
    # Append mode only emits windows the watermark has closed: windows
    # ending within <watermark> of the stream's max event time stay in
    # state when availableNow terminates. Everything older must match.
    import datetime

    max_ts = batch.agg(F.max("ts")).collect()[0][0]
    cutoff = max_ts - datetime.timedelta(hours=2)
    closed_want = {
        k: v
        for k, v in want.items()
        if k[0] + datetime.timedelta(hours=1) <= cutoff
    }
    assert closed_want.items() <= got.items()
    missing = set(want) - set(got)
    assert all(
        ws + datetime.timedelta(hours=1) > cutoff for ws, _ in missing
    ), f"non-final windows missing: {missing}"


def test_available_now_is_incremental(spark, events_dir, event_stream, tmp_path):
    # Memory sink can't recover a checkpoint; use the real file sink
    # (which is also the production layout).
    ckpt, out = str(tmp_path / "ckpt2"), str(tmp_path / "out")

    def run_once(stream):
        q = (
            SE.tumbling_counts(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(out).count()

    n1 = run_once(event_stream)
    assert n1 > 0
    # Second run, same checkpoint: no new files → no new rows appended.
    n2 = run_once(SE.read_event_stream(spark, events_dir))
    assert n2 == n1, "availableNow must be exactly-once over already-seen files"


def test_session_windows(spark, sf_dir, event_stream, tmp_path):
    SE.run_available_now(
        SE.session_counts(event_stream), str(tmp_path / "ckpt3"), "t_sess"
    )
    rows = spark.sql("SELECT * FROM t_sess").collect()
    assert rows, "expected at least one session"
    assert all(r.session_end > r.session_start for r in rows)
    # Sessions of the same user must not overlap.
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append((r.session_start, r.session_end))
    for spans in by_user.values():
        spans.sort()
        assert all(a[1] <= b[0] for a, b in zip(spans, spans[1:]))


def test_running_user_totals_stateful(spark, sf_dir, event_stream, tmp_path):
    SE.run_available_now(
        SE.running_user_totals(event_stream),
        str(tmp_path / "ckpt4"),
        "t_state",
        output_mode="update",
    )
    got = {
        r.user_id: r.n_events
        for r in spark.sql(
            "SELECT user_id, max(n_events) n_events FROM t_state GROUP BY user_id"
        ).collect()
    }
    want = {
        r.user_id: r.n
        for r in _batch_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want

"""Commit-protocol tests for the custom Python DataSource writer
(sources/jsonl_sink.py): exact round-trip through the task-file +
rename + manifest-last protocol, manifest/rowcount agreement,
overwrite atomicity (no stale parts), and abort hygiene (a failed
job leaves NO visible output — tmp only, cleaned)."""

from __future__ import annotations

import json
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from sp500_stock_etl_spark.io.readers import load_table
from sp500_stock_etl_spark.sources.jsonl_sink import register_jsonl_sink

SF_DIR = "/root/testdata/sf0.001"
SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
    "event_type STRING, value DOUBLE"
)


def _events(spark):
    register_jsonl_sink(spark)
    return load_table(spark, SF_DIR, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


def test_roundtrip_exact_and_manifest(spark):
    ev = _events(spark)
    d = tempfile.mkdtemp(prefix="sg_sink_t_")
    ev.repartition(4).write.format("jsonl_sink").option("path", d).mode(
        "overwrite"
    ).save()
    parts = sorted(f for f in os.listdir(d) if f.startswith("part-"))
    man = json.load(open(os.path.join(d, "_SUCCESS")))
    assert [f["name"] for f in man["files"]] == parts
    assert man["total_rows"] == ev.count()
    assert not os.path.exists(os.path.join(d, "_tmp"))
    back = spark.read.schema(SCHEMA).json(os.path.join(d, "part-*.jsonl"))
    assert {tuple(r) for r in back.collect()} == {
        tuple(r) for r in ev.collect()
    }


def test_overwrite_replaces_all_parts(spark):
    ev = _events(spark)
    d = tempfile.mkdtemp(prefix="sg_sink_o_")
    ev.repartition(6).write.format("jsonl_sink").option("path", d).mode(
        "overwrite"
    ).save()
    ev.limit(7).repartition(1).write.format("jsonl_sink").option(
        "path", d
    ).mode("overwrite").save()
    parts = [f for f in os.listdir(d) if f.startswith("part-")]
    man = json.load(open(os.path.join(d, "_SUCCESS")))
    assert len(parts) == 1 and man["total_rows"] == 7


def test_abort_leaves_no_visible_output(spark):
    ev = _events(spark)
    d = tempfile.mkdtemp(prefix="sg_sink_a_")

    @F.udf("double")
    def boom(v):
        raise RuntimeError("planted task failure")

    with pytest.raises(Exception):
        ev.withColumn("value", boom("value")).write.format(
            "jsonl_sink"
        ).option("path", d).mode("overwrite").save()
    visible = [f for f in os.listdir(d) if not f.startswith("_tmp")]
    assert visible == [], f"failed job left visible output: {visible}"
    assert not os.path.exists(os.path.join(d, "_SUCCESS"))


def test_stream_writer_availablenow_and_replay(spark):
    """writeStream through the Python streaming sink: availableNow
    drains the staged source into epoch-tagged parts + manifest; a
    replayed epoch (same batchId re-committed, the restart contract)
    must NOT duplicate output."""
    import shutil
    import tempfile as _tf

    from sp500_stock_etl_spark.sources.jsonl_sink import (
        JsonlSinkStreamWriter,
        _FileCommit,
    )

    ev = _events(spark)
    src_dir = _tf.mkdtemp(prefix="sg_ssrc_")
    ev.write.mode("overwrite").parquet(src_dir + "/in")
    out_dir = _tf.mkdtemp(prefix="sg_ssink_")
    ckpt = _tf.mkdtemp(prefix="sg_sckpt_")

    stream = spark.readStream.schema(ev.schema).parquet(src_dir + "/in")
    q = (
        stream.writeStream.format("jsonl_sink")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    man = json.load(open(os.path.join(out_dir, "_SUCCESS")))
    assert man["total_rows"] == ev.count()
    assert man["epochs"], "manifest must record committed epochs"
    back = spark.read.schema(SCHEMA).json(os.path.join(out_dir, "part-*.jsonl"))
    assert {tuple(r) for r in back.collect()} == {
        tuple(r) for r in ev.collect()
    }

    # Replay: re-commit an already-committed epoch with fresh tmp
    # files — the guard must drop them, leaving the output unchanged.
    w = JsonlSinkStreamWriter({"path": out_dir}, ev.schema)
    tmp_dir = os.path.join(out_dir, "_tmp")
    os.makedirs(tmp_dir, exist_ok=True)
    with open(os.path.join(tmp_dir, "replay.jsonl"), "w") as f:
        f.write('{"event_id": 1}\n')
    w.commit([_FileCommit(tmp_name="replay.jsonl", n_rows=1)], man["epochs"][0])
    man2 = json.load(open(os.path.join(out_dir, "_SUCCESS")))
    assert man2["total_rows"] == man["total_rows"], "replayed epoch duplicated rows"
    assert not os.path.exists(os.path.join(tmp_dir, "replay.jsonl"))
    shutil.rmtree(src_dir, ignore_errors=True)


def test_stream_commit_onto_batch_manifest(spark):
    """Mixing a BATCH write and a STREAMING commit on one directory:
    the batch manifest has no 'epochs' key, and the stream commit must
    tolerate that (setdefault) instead of raising KeyError (r6 advice
    item 1)."""
    from sp500_stock_etl_spark.sources.jsonl_sink import (
        JsonlSinkStreamWriter,
        _FileCommit,
    )

    ev = _events(spark)
    d = tempfile.mkdtemp(prefix="sg_sink_mix_")
    ev.limit(5).repartition(1).write.format("jsonl_sink").option(
        "path", d
    ).mode("overwrite").save()
    man = json.load(open(os.path.join(d, "_SUCCESS")))
    assert "epochs" not in man, "precondition: batch manifest has no epochs"

    w = JsonlSinkStreamWriter({"path": d}, ev.schema)
    tmp_dir = os.path.join(d, "_tmp")
    os.makedirs(tmp_dir, exist_ok=True)
    with open(os.path.join(tmp_dir, "s0.jsonl"), "w") as f:
        f.write('{"event_id": 99}\n')
    w.commit([_FileCommit(tmp_name="s0.jsonl", n_rows=1)], 0)
    man2 = json.load(open(os.path.join(d, "_SUCCESS")))
    assert man2["epochs"] == [0]
    assert man2["total_rows"] == man["total_rows"] + 1
    assert any(f["name"].startswith("part-e00000-") for f in man2["files"])

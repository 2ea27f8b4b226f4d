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

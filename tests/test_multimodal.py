"""Multimodal plumbing tests: schema, Arrow batch shape, determinism,
payload pruning (decode is a documented deterministic fake — the
Spark-side plumbing is what's under test)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sp500_stock_etl_spark.operators import multimodal as MM


def test_decode_schema_and_determinism(spark):
    media = MM.synthetic_media(spark, 60)
    decoded = MM.decode_media(media)
    assert decoded.schema == MM.DECODED_SCHEMA
    a = sorted(decoded.collect(), key=lambda r: r.media_id)
    b = sorted(MM.decode_media(MM.synthetic_media(spark, 60)).collect(),
               key=lambda r: r.media_id)
    assert a == b, "decode must be deterministic"
    assert all(len(r.feature) == 8 for r in a)
    assert all(abs(sum(r.feature) - 1.0) < 1e-6 for r in a), "features normalized"


def test_image_rows_single_frame(spark):
    decoded = MM.decode_media(MM.synthetic_media(spark, 90))
    kinds = {r.kind: r for r in decoded.collect()}
    assert kinds["image"].n_frames == 1
    assert kinds["video"].n_frames >= 1


def test_frame_sample_counts(spark):
    decoded = MM.decode_media(MM.synthetic_media(spark, 90))
    frames = MM.frame_sample(decoded, every_k=8)
    per_media = {
        r.media_id: r.cnt
        for r in frames.groupBy("media_id").agg(F.count("*").alias("cnt")).collect()
    }
    for r in decoded.collect():
        want = (r.n_frames + 7) // 8
        assert per_media.get(r.media_id, 0) == want


def test_metadata_query_prunes_payload(spark, tmp_path):
    """Payload column must not be read for metadata-only queries."""
    path = str(tmp_path / "media_parquet")
    MM.synthetic_media(spark, 50).write.parquet(path)
    plan = (
        spark.read.parquet(path)
        .groupBy("kind")
        .count()
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "payload" not in plan, f"payload not pruned:\n{plan}"

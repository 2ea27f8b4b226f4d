"""Multimodal plumbing tests: schema, Arrow batch shape, determinism,
payload pruning, and the real PNG/JPEG header parsers (image dims are
a genuine container-format parse; audio/video decode stays a
documented deterministic fake)."""

from __future__ import annotations

import struct
import zlib

from pyspark.sql import functions as F

from sp500_stock_etl_spark.operators import multimodal as MM


def _make_png(width: int, height: int) -> bytes:
    ihdr = struct.pack(">II5B", width, height, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
    )


def _make_jpeg(width: int, height: int) -> bytes:
    # SOI, APP0 (JFIF stub), DQT stub, SOF0 with one component.
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    dqt = b"\xff\xdb" + struct.pack(">H", 4) + b"\x00\x00"
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 11)
        + b"\x08"
        + struct.pack(">HH", height, width)
        + b"\x01\x01\x11\x00"
    )
    return b"\xff\xd8" + app0 + dqt + sof0


def test_png_header_parse():
    assert MM.png_dimensions(_make_png(640, 480)) == (640, 480)
    assert MM.png_dimensions(_make_png(1, 100000)) == (1, 100000)
    assert MM.png_dimensions(b"not a png at all, just bytes") is None
    assert MM.png_dimensions(b"") is None


def test_jpeg_header_parse():
    assert MM.jpeg_dimensions(_make_jpeg(800, 600)) == (800, 600)
    assert MM.jpeg_dimensions(_make_png(10, 10)) is None
    assert MM.jpeg_dimensions(b"\xff\xd8\xff") is None


def test_synthetic_images_carry_real_png_headers(spark):
    rows = (
        MM.synthetic_media(spark, 30)
        .where(F.col("kind") == "image")
        .collect()
    )
    assert rows
    for r in rows:
        dims = MM.png_dimensions(bytes(r.payload))
        assert dims == (16 + r.media_id % 240, 16 + (r.media_id * 7) % 240)


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

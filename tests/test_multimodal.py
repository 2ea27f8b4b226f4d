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


def test_png_header_dims_catalyst_matches_python(spark):
    """The JVM-side IHDR parse (png_header_dims, the planning-pass
    path with no Arrow hop) must agree with the Python parser on every
    corpus image, and must FILTER non-PNG payloads rather than emit
    garbage dims."""
    media = MM.synthetic_media(spark, 30)
    got = {
        r.media_id: (r.width, r.height)
        for r in MM.png_header_dims(media).collect()
    }
    want = {
        r.media_id: MM.png_dimensions(bytes(r.payload))
        for r in media.where(F.col("kind") == "image").collect()
    }
    assert got == want
    # audio/video payloads (WAV/MP4 headers) must not survive the
    # signature filter even though they are >= 24 bytes long.
    assert set(got) == {r.media_id for r in media.collect() if r.kind == "image"}
    # and the plan must stay Python-free (the whole point).
    plan = MM.png_header_dims(media)._jdf.queryExecution().executedPlan().toString()
    for op in ("ArrowEvalPython", "MapInPandas", "BatchEvalPython"):
        assert op not in plan


def _make_wav(rate: int, channels: int, data_size: int, body: bytes = b"") -> bytes:
    block = channels * 2
    return (
        b"RIFF"
        + struct.pack("<I", 36 + data_size)
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, channels, rate, rate * block, block, 16)
        + b"data"
        + struct.pack("<I", data_size)
        + body
    )


def test_wav_header_parse():
    info = MM.wav_info(_make_wav(16000, 2, 16000 * 4 * 5))  # 5 s stereo
    assert info["sample_rate"] == 16000
    assert info["channels"] == 2
    assert info["duration_ms"] == 5000
    assert info["n_samples"] == 16000 * 5
    # duration must come from the DECLARED size even when the body is
    # truncated (planning reads a byte-range prefix)
    trunc = MM.wav_info(_make_wav(8000, 1, 8000 * 2 * 60, body=b"\x00" * 8))
    assert trunc["duration_ms"] == 60000
    assert MM.wav_info(b"RIFFxxxxNOPE") is None
    assert MM.wav_info(b"") is None


def _box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + typ + payload


def test_mp4_header_parse():
    mvhd = _box(
        b"mvhd",
        b"\x00\x00\x00\x00"  # v0
        + struct.pack(">II", 0, 0)
        + struct.pack(">II", 90000, 90000 * 42)  # 42 s at timescale 90k
        + b"\x00" * 80,
    )
    tkhd = _box(
        b"tkhd",
        b"\x00\x00\x00\x07"
        + struct.pack(">II", 0, 0)
        + struct.pack(">II", 1, 0)
        + struct.pack(">I", 0)
        + b"\x00" * 8
        + b"\x00" * 8
        + b"\x00" * 36
        + struct.pack(">II", 1920 << 16, 1080 << 16),
    )
    payload = _box(b"ftyp", b"isom\x00\x00\x00\x00") + _box(
        b"moov", mvhd + _box(b"trak", tkhd)
    )
    info = MM.mp4_info(payload)
    assert info["duration_ms"] == 42000
    assert (info["width"], info["height"]) == (1920, 1080)
    assert MM.mp4_info(b"not an mp4") is None


def test_synthetic_audio_video_carry_real_headers(spark):
    rows = MM.synthetic_media(spark, 60).collect()
    for r in rows:
        payload = bytes(r.payload)
        if r.kind == "audio":
            info = MM.wav_info(payload)
            assert info["sample_rate"] == [8000, 16000, 44100][(r.media_id // 3) % 3]
            assert info["channels"] == 1 + r.media_id % 2
            assert info["duration_ms"] == (r.media_id % 117 + 3) * 1000
        elif r.kind == "video":
            info = MM.mp4_info(payload)
            assert info["duration_ms"] == (r.media_id * 37) % 57000 + 3000
            assert info["width"] == 256 + (r.media_id % 16) * 16
            assert info["height"] == 144 + ((r.media_id * 3) % 16) * 16


def test_audio_chunk_plan(spark):
    plan = MM.audio_chunk_plan(MM.synthetic_media(spark, 30), chunk_ms=10000)
    rows = plan.collect()
    assert rows, "audio rows must produce chunks"
    by_media = {}
    for r in rows:
        by_media.setdefault(r.media_id, []).append(r)
    for media_id, chunks in by_media.items():
        dur = (media_id % 117 + 3) * 1000
        assert len(chunks) == (dur + 9999) // 10000
        chunks.sort(key=lambda r: r.chunk_idx)
        assert chunks[-1].end_ms == dur, "last chunk clipped to duration"
        assert all(c.end_ms - c.start_ms <= 10000 for c in chunks)


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

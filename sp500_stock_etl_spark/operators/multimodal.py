"""Multimodal column plumbing (north star): image/audio/video as
opaque ``binary`` columns with typed metadata, processed with
Arrow-batched ``mapInPandas`` UDFs.

The IMAGE decode path is real: a pure-Python container-header parser
reads width/height from PNG (IHDR) and JPEG (SOFn) bytes — no imaging
library needed, so it runs in this container and is oracle-checked
end-to-end (the synthetic corpus embeds genuine PNG headers whose
dimensions the DuckDB oracle recomputes arithmetically). Full pixel
decode / audio / video remain a deterministic, clearly-marked FAKE
derived from the payload bytes (the container has no codec libraries);
the Spark plumbing around them — schema, batch shapes, partition
sizing, UDF signatures, null handling — is real and tested.

Scale notes:
- binary payloads dominate row size → ``maxPartitionBytes`` (not row
  count) governs task sizing; metadata-only queries must NEVER read
  the payload column (parquet column pruning does this for free —
  keep payloads in their own column, never inside a struct with hot
  metadata);
- mapInPandas streams Arrow batches, so per-batch memory is bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` — pinned
  session-wide in session.harden() (operators do not mutate shared
  session conf);
- decode is CPU-bound per row: it parallelizes perfectly, no shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("source_uri", T.StringType()),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# Signature + IHDR length (13) + "IHDR": the 16 bytes preceding the
# width/height words in every valid PNG.
_PNG_PREFIX = _PNG_SIG + b"\x00\x00\x00\x0dIHDR"
# bitdepth=8, colortype=2 (truecolor), compression/filter/interlace=0,
# then an (unchecked) zero CRC.
_PNG_IHDR_TAIL = b"\x08\x02\x00\x00\x00" + b"\x00\x00\x00\x00"


def synthetic_media(spark, n: int = 100) -> DataFrame:
    """Deterministic fake corpus standing in for a parquet blob table.

    Image rows (media_id % 3 == 0) carry a GENUINE PNG header —
    signature + IHDR with width = 16 + id % 240 and
    height = 16 + (id*7) % 240 in big-endian — followed by md5 filler
    bytes, so the decode path exercises a real container-format parse.
    Audio/video rows are pure md5 filler (their decode is the
    documented fake).
    """
    img_width = (F.col("media_id") % 240 + 16).cast("bigint")
    img_height = ((F.col("media_id") * 7) % 240 + 16).cast("bigint")
    be32 = lambda c: F.unhex(F.lpad(F.hex(c), 8, "0"))  # noqa: E731
    filler = F.unhex(F.repeat(F.md5(F.col("media_id").cast("string")), 4))
    png = F.concat(
        F.lit(_PNG_PREFIX), be32(img_width), be32(img_height),
        F.lit(_PNG_IHDR_TAIL), filler,
    )
    return (
        spark.range(n)
        .select(
            F.col("id").alias("media_id"),
            F.element_at(
                F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                (F.col("id") % 3 + 1).cast("int"),
            ).alias("kind"),
            F.concat(F.lit("synthetic://media/"), F.col("id")).alias("source_uri"),
        )
        .withColumn(
            "payload",
            F.when(F.col("kind") == "image", png).otherwise(filler),
        )
        .select("media_id", "kind", "payload", "source_uri")
    )


def png_dimensions(payload: bytes) -> tuple[int, int] | None:
    """(width, height) from a PNG IHDR, or None if not a PNG."""
    if len(payload) < 24 or not payload.startswith(_PNG_SIG):
        return None
    if payload[12:16] != b"IHDR":
        return None
    return (
        int.from_bytes(payload[16:20], "big"),
        int.from_bytes(payload[20:24], "big"),
    )


def jpeg_dimensions(payload: bytes) -> tuple[int, int] | None:
    """(width, height) from the first JPEG SOFn segment, or None.

    Walks the marker stream: every segment between SOI and SOS is
    ``FF <marker> <len_hi> <len_lo> payload``; SOF0-SOF15 (except the
    DHT/DAC/RST family C4/C8/CC) carry ``precision(1) height(2)
    width(2)`` right after the length.
    """
    if len(payload) < 4 or payload[0:2] != b"\xff\xd8":
        return None
    i = 2
    n = len(payload)
    while i + 4 <= n:
        if payload[i] != 0xFF:
            return None
        marker = payload[i + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
            i += 2  # standalone markers carry no length
            continue
        seg_len = int.from_bytes(payload[i + 2 : i + 4], "big")
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if i + 9 > n:
                return None
            height = int.from_bytes(payload[i + 5 : i + 7], "big")
            width = int.from_bytes(payload[i + 7 : i + 9], "big")
            return (width, height)
        i += 2 + seg_len
    return None


def _decode_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Decode one Arrow batch.

    Images: REAL header parse (PNG then JPEG); rows whose payload is
    neither fall through to the deterministic fake, same as
    audio/video (NOT a real codec decode — see module doc).
    """
    out = []
    for media_id, kind, payload in zip(
        batch["media_id"], batch["kind"], batch["payload"]
    ):
        payload = bytes(payload) if payload is not None else b""
        dims = None
        if kind == "image":
            dims = png_dimensions(payload) or jpeg_dimensions(payload)
        if dims is not None:
            w, h = dims
            frames = 1
        else:
            # Deterministic fake for non-parseable payloads.
            w = 16 + payload[0] if len(payload) else 0
            h = 16 + payload[1] if len(payload) > 1 else 0
            frames = (
                1
                if kind == "image"
                else (1 + (payload[2] % 32) if len(payload) > 2 else 0)
            )
        # 8-dim feature = normalized byte-histogram buckets.
        buckets = [0] * 8
        for b in payload:
            buckets[b >> 5] += 1
        total = float(sum(buckets)) or 1.0
        out.append(
            (media_id, kind, w, h, frames, [b / total for b in buckets])
        )
    return pd.DataFrame(
        out, columns=["media_id", "kind", "width", "height", "n_frames", "feature"]
    )


def decode_media(media: DataFrame) -> DataFrame:
    """mapInPandas decode: Arrow-batched; batch sizing is governed by
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` pinned in
    session.harden() (no per-operator session-conf mutation)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield _decode_batch(batch)

    return media.mapInPandas(gen, DECODED_SCHEMA)


def frame_sample(decoded: DataFrame, every_k: int = 8) -> DataFrame:
    """Frame sampling as relational plumbing: one row per kept frame
    index — explode over a sequence, no UDF needed."""
    return decoded.where(F.col("n_frames") > 0).select(
        "media_id",
        "kind",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_k))
        ).alias("frame_index"),
    )

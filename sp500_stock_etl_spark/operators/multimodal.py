"""Multimodal column plumbing (north star): image/audio/video as
opaque ``binary`` columns with typed metadata, processed with
Arrow-batched ``mapInPandas`` UDFs.

The container has no image/audio libraries, so the DECODE step is
stubbed (clearly marked): ``decode_media`` tries the real libraries
behind an import-guard and otherwise produces a deterministic fake
derived from the payload bytes. Everything around the stub — schema,
batch shapes, partition sizing, UDF signatures, null handling — is
real Spark plumbing and is tested.

Scale notes:
- binary payloads dominate row size → ``maxPartitionBytes`` (not row
  count) governs task sizing; metadata-only queries must NEVER read
  the payload column (parquet column pruning does this for free —
  keep payloads in their own column, never inside a struct with hot
  metadata);
- mapInPandas streams Arrow batches, so per-batch memory is bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` — set it low for
  fat rows;
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


def synthetic_media(spark, n: int = 100) -> DataFrame:
    """Deterministic fake corpus: payload = repeated md5 bytes of the
    id. Stands in for a parquet table of real blobs."""
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.unhex(F.repeat(F.md5(F.col("id").cast("string")), 4)).alias("payload"),
        F.concat(F.lit("synthetic://media/"), F.col("id")).alias("source_uri"),
    )


def _decode_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Decode one Arrow batch. Real decoders behind import-guards;
    deterministic fake otherwise (NOT a real decode — see module doc)."""
    try:  # pragma: no cover - not installed in this container
        import PIL.Image  # noqa: F401

        raise NotImplementedError(
            "real image decode path not wired yet; container lacks test fixtures"
        )
    except ImportError:
        pass

    out = []
    for _, row in batch.iterrows():
        payload = row["payload"] or b""
        # Fake-decode: dimensions/frames derived from payload bytes,
        # 8-dim feature = normalized byte histogram buckets.
        w = 16 + payload[0] if len(payload) else 0
        h = 16 + payload[1] if len(payload) > 1 else 0
        frames = 1 if row["kind"] == "image" else (1 + (payload[2] % 32) if len(payload) > 2 else 0)
        buckets = [0] * 8
        for b in payload:
            buckets[b >> 5] += 1
        total = float(sum(buckets)) or 1.0
        out.append(
            (row["media_id"], row["kind"], w, h, frames, [b / total for b in buckets])
        )
    return pd.DataFrame(
        out, columns=["media_id", "kind", "width", "height", "n_frames", "feature"]
    )


def decode_media(media: DataFrame, batch_size: int = 64) -> DataFrame:
    """mapInPandas decode: Arrow-batched, payload column pruned away
    after use, batch size capped for fat binary rows."""
    spark = media.sparkSession
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size))

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

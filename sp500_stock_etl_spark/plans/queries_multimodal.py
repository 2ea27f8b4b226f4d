"""Multimodal-column queries (north star): binary payload plumbing
through Arrow-batched ``mapInPandas``.

The IMAGE decode is a real pure-Python container-header parse (PNG
IHDR / JPEG SOFn — operators/multimodal.py), and the synthetic corpus
embeds genuine PNG headers, so ``multimodal_decode_dims`` is fully
oracle-checked: DuckDB recomputes the same dimensions arithmetically.
Audio/video decode stays a deterministic stub (no codec libs in the
container) → those queries keep rows-only checks, flagged by design.
The metadata-only query stays fully native and proves payload-column
pruning does not change results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import multimodal as MM
from .registry import register

_N_MEDIA = 300


@register(
    "multimodal_decode_features",
    None,  # feature histogram is a Python-UDF artifact; dims checked below
    doc="binary payload → decoded dims + 8-bucket byte-histogram feature "
    "via Arrow-batched mapInPandas (north star; image dims are a real "
    "header parse, audio/video stubbed)",
)
def q_mm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = MM.synthetic_media(spark, _N_MEDIA)
    return MM.decode_media(media)


# The oracle-checked decode path: images carry genuine PNG headers
# whose IHDR the mapInPandas decoder parses; DuckDB reproduces the
# width/height arithmetic of the synthetic generator. A value mismatch
# means the byte-level header construction or the parser is wrong.
_DECODE_DIMS_ORACLE = f"""
SELECT range AS media_id,
       'image' AS kind,
       CAST(16 + range % 240 AS INT) AS width,
       CAST(16 + (range * 7) % 240 AS INT) AS height,
       CAST(1 AS INT) AS n_frames
FROM range({_N_MEDIA})
WHERE range % 3 = 0
"""


@register(
    "multimodal_decode_dims",
    _DECODE_DIMS_ORACLE,
    doc="real PNG header parse through Arrow-batched mapInPandas, "
    "oracle-checked: DuckDB recomputes the embedded IHDR dimensions "
    "arithmetically (north star)",
)
def q_mm_decode_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = MM.synthetic_media(spark, _N_MEDIA)
    return (
        MM.decode_media(media)
        .where(F.col("kind") == "image")
        .select("media_id", "kind", "width", "height", "n_frames")
    )


@register(
    "multimodal_frame_sample",
    None,  # depends on the stub decode's n_frames
    doc="frame sampling as explode(sequence(0, n_frames-1, k)) over decoded "
    "media — relational plumbing, no UDF (north star)",
)
def q_mm_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = MM.synthetic_media(spark, _N_MEDIA)
    return MM.frame_sample(MM.decode_media(media), every_k=8)


# Metadata-only path: never touches the payload column — Catalyst
# prunes it at the source. The oracle reproduces the synthetic corpus
# arithmetically, proving the pruned plan computes the same answer.
_META_ORACLE = f"""
WITH media AS (
    SELECT range AS media_id,
           ['image', 'audio', 'video'][CAST(range % 3 AS INT) + 1] AS kind,
           -- images additionally carry the 33-byte PNG signature+IHDR
           -- prefix ahead of the 64 md5 filler bytes
           octet_length(from_hex(repeat(md5(CAST(range AS VARCHAR)), 4)))
             + CASE WHEN range % 3 = 0 THEN 33 ELSE 0 END AS payload_bytes
    FROM range({_N_MEDIA})
)
SELECT kind,
       count(*) AS n,
       CAST(sum(CAST(payload_bytes AS BIGINT)) AS BIGINT) AS total_bytes
FROM media
GROUP BY kind
"""


@register(
    "multimodal_metadata_agg",
    _META_ORACLE,
    doc="metadata-only agg over the media table; payload column pruned at scan "
    "(north star; verify with explain → ReadSchema)",
)
def q_mm_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = MM.synthetic_media(spark, _N_MEDIA)
    return media.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("payload").cast("bigint")).alias("total_bytes"),
    )

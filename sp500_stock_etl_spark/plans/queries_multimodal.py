"""Multimodal-column queries (north star): binary payload plumbing
through Arrow-batched ``mapInPandas``.

The decode step is a deterministic STUB (container has no image/audio
libs — operators/multimodal.py module doc); the Spark-side plumbing
(schema, batching, pruning, explode) is real. Decode output is a
Python-UDF artifact, not SQL-expressible → rows-only driver checks,
flagged by design. The metadata-only query stays fully native and
gets a real oracle to prove payload-column pruning does not change
results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators import multimodal as MM
from .registry import register

_N_MEDIA = 300


@register(
    "multimodal_decode_features",
    None,  # mapInPandas stub decode: not SQL-expressible
    doc="binary payload → fake-decoded dims + 8-bucket byte-histogram feature "
    "via Arrow-batched mapInPandas (north star; decode stubbed)",
)
def q_mm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = MM.synthetic_media(spark, _N_MEDIA)
    return MM.decode_media(media)


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
           octet_length(from_hex(repeat(md5(CAST(range AS VARCHAR)), 4))) AS payload_bytes
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

"""Partition-count advisor for the spill-merge cliff (r10 verdict
item 7 → r11).

The measured facts this encodes (BASELINE.md §12, the r10 1000x
series on the risk capstone, 8 GiB heap, 32 tasks):

- sort-based aggregation spills GRACEFULLY up to ~2.6 GB of spill per
  task (600x = 360M rows: 84 GB total spill, flat ~6.4 GB heap, done
  in 542 s);
- by ~4.4 GB per task (1000x = 600M rows at 32 partitions) the job
  OOMs — NOT in the aggregation but in the sort-agg MERGING ITS OWN
  SPILL FILES: every spill file costs a 1 MB read-ahead buffer per
  task at merge time, so per-task spill volume (≈ spill-file count)
  is the resource that runs out, and more heap only moves the cliff;
- raising ``spark.sql.adaptive.coalescePartitions.initialPartitionNum``
  to 256 bounds per-task volume and completes 1000x in 684 s,
  bit-exact;
- the knob is NOT free in the smooth regime: the same 256 on the lag
  window family measured 252 → 498 s (more, smaller sort runs with
  no spill to amortize them), so it must be applied only when the
  estimated volume actually approaches the cliff.

Hence the rule implemented here: leave partitioning alone while the
estimated per-task IN-FLIGHT bytes stay under
``SPILL_SAFE_PER_TASK_BYTES`` (3 GB — between the measured-smooth
2.5 and the measured-cliff 4.2, so the 600x point stays un-advised
exactly as the r10 capacity statement records, and 1000x advises);
past that, size the initial partition count to put each task at
``TARGET_PER_TASK_BYTES``. AQE's coalescing makes the high initial
count cluster-correct: stages that turn out small are coalesced back,
only the genuinely big exchanges keep the fine partitioning.

Calibration of the estimate (the r10 measured series is the ground
truth the constants must reproduce): est = rows x UnsafeRow width x
``SORT_INFLIGHT_FACTOR``. The stock frame is 5 fixed-width fields =
56 B/row; x4 in-flight factor (sorter pointer arrays + the widened
window intermediates the agg actually sorts) gives 600M rows ->
134 GB -> 4.2 GB/task at 32 partitions (measured: 4.4, OOM) and
360M -> 80 GB -> 2.5 GB/task (measured: 2.6, smooth) — and the
advised count at 1000x is ceil(134 GB / 512 MB) = 262 ≈ the 256 that
was hand-proven to complete.

Estimates are the caller's job (they know their replication factor /
feed volume); ``sort_inflight_bytes`` covers the common case and
``parquet_input_bytes`` the file-backed scan volume. Everything here
is advisory conf, never a plan rewrite — the queries themselves stay
declarative.
"""

from __future__ import annotations

import math
import os
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# Between the two measured points (see module docstring).
SPILL_SAFE_PER_TASK_BYTES = 3_000_000_000
# Where to land each task once past the cliff guard: big enough to
# amortize sort runs, small enough that a task's spill never reaches
# the multi-GB merge regime even at ~3x estimate error.
TARGET_PER_TASK_BYTES = 512 * 1024 * 1024
# Sorter pointer arrays + widened intermediates (calibrated above).
SORT_INFLIGHT_FACTOR = 4.0

_INIT_PARTS_KEY = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"

# Parquet -> in-memory expansion: snappy parquet of the synthetic
# tables decodes to roughly 3-5x its file size as UnsafeRows.
PARQUET_EXPANSION = 4.0


def estimated_row_bytes(schema: T.StructType) -> int:
    """UnsafeRow-shaped width estimate: 16 B header/null bits + 8 B
    per field slot, + variable-length payload guesses for the
    non-fixed types (strings 24 B, arrays/maps/structs 64 B)."""
    b = 16
    for f in schema.fields:
        b += 8
        if isinstance(f.dataType, (T.StringType, T.BinaryType)):
            b += 24
        elif isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
            b += 64
    return b


def sort_inflight_bytes(rows: int, schema: T.StructType) -> int:
    """Estimated bytes a sort-heavy plan holds in flight for ``rows``
    input rows of ``schema`` — the number the advisor compares against
    the spill-cliff guard."""
    return int(rows * estimated_row_bytes(schema) * SORT_INFLIGHT_FACTOR)


def parquet_input_bytes(df: DataFrame, expansion: float = PARQUET_EXPANSION) -> int:
    """Estimated in-memory bytes of a file-backed frame: sum of its
    input file sizes x decode expansion. Local-path realization; on a
    cluster the same number comes from the catalog/relation statistics
    (``sizeInBytes``) that feed AQE anyway."""
    total = 0
    for uri in df.inputFiles():
        path = uri[len("file:") :] if uri.startswith("file:") else uri
        try:
            total += os.path.getsize(path)
        except OSError:
            continue
    return int(total * expansion)


def advise_initial_partitions(
    spark: SparkSession, est_input_bytes: int
) -> int | None:
    """The rule: None (leave partitioning alone) while estimated
    per-task bytes at the CURRENT shuffle partitioning stay inside the
    measured-smooth regime; else the initial partition count that puts
    each task at TARGET_PER_TASK_BYTES."""
    parts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    if est_input_bytes / max(parts, 1) <= SPILL_SAFE_PER_TASK_BYTES:
        return None
    return max(parts, math.ceil(est_input_bytes / TARGET_PER_TASK_BYTES))


@contextmanager
def spill_safe_partitions(spark: SparkSession, est_input_bytes: int):
    """Apply the advisor for the duration of one heavy action, then
    restore the previous conf. Yields the advised count (None = no-op,
    the smooth-regime guarantee the r10 window measurement demands).

    ORDERING CONTRACT: construct the plan INSIDE this context if it
    (or anything it calls) uses ``persist()`` — Spark compiles a
    cached relation's physical plan when persist() is CALLED, so a
    frame persisted before entry keeps its old exchange partitioning
    under the cache regardless of what runs inside the block."""
    advised = advise_initial_partitions(spark, est_input_bytes)
    if advised is None:
        yield None
        return
    try:
        prev = spark.conf.get(_INIT_PARTS_KEY)
    except Exception:
        prev = None
    spark.conf.set(_INIT_PARTS_KEY, str(advised))
    try:
        yield advised
    finally:
        if prev is None:
            spark.conf.unset(_INIT_PARTS_KEY)
        else:
            spark.conf.set(_INIT_PARTS_KEY, prev)


# --- Manifest shard-count advisor (r12). Calibrated from
# scripts/manifest_scale_probe.py on the r12 host: flat manifests are
# fine through ~10k entries (0.17 s/commit) but cost ~1.7 s/commit at
# 200k; sharded commits cost ~proportional to entries-per-shard, with
# ~4k entries ~= 0.3 MB JSON ~= single-digit ms to parse. The advisor
# keeps shards invisible for small stores and aims at ~4k entries per
# shard past the flat comfort zone, capped so the root's descriptor
# list stays O(1k).
# Validated END-TO-END in r13 (scripts/advisor_e2e_probe.py): twin
# stores grown to 102,400 real parquet files via real merges; sparse
# 1%-bucket CDC merges measured flat 1.438 s / advisor-picked (K=26)
# 0.501 s of commit metadata — real flat manifests run HEAVIER than
# the synthetic series (dead-list bookkeeping), so these constants
# are conservative in the right direction. The small-scale smoke
# (12,288 files: flat 0.132 s) confirms the 10k flat comfort zone.
MANIFEST_FLAT_MAX_FILES = 10_000
MANIFEST_TARGET_FILES_PER_SHARD = 4_000
MANIFEST_MAX_SHARDS = 1_024


def advise_manifest_shards(expected_live_files: int) -> int | None:
    """None (stay flat) while the expected live-file count is inside
    the measured flat comfort zone; else a shard count that puts each
    shard near the target entry count. Feed it the steady-state file
    count (buckets x files_per_bucket, plus merge growth between
    compactions), not the creation count."""
    if expected_live_files <= MANIFEST_FLAT_MAX_FILES:
        return None
    import math as _math

    return min(
        _math.ceil(expected_live_files / MANIFEST_TARGET_FILES_PER_SHARD),
        MANIFEST_MAX_SHARDS,
    )

"""Manifest generations for the file-level CDC store (r11; closes the
concurrent-reader gap documented on ``merge_touched_files``).

``merge_touched_files`` publishes by appending new files and deleting
the replaced ones — a reader listing the directory between those two
steps sees duplicate keys, and one holding handles to replaced files
can lose them. The standard fix (every production table format —
Iceberg/Delta-style, realized here with stdlib JSON + POSIX rename)
is a MANIFEST generation:

- ``_manifest.json`` at the store root lists the LIVE files of the
  current generation, each with its key min/max (so merges stop
  reading parquet footers: file selection is a pure manifest lookup);
- every merge writes new files, then swaps the manifest with one
  atomic rename — readers resolve the live set from the manifest and
  see generation g or g+1, never a mix;
- replaced files are retained on disk for ONE generation (listed in
  the manifest's ``dead``) and physically deleted by the NEXT merge,
  so a reader that loaded generation g can finish scanning g's files
  while g+1 publishes. Production tunes this retention by time; the
  single-generation lag is the test-scale realization and the
  concurrency probe hammers it.

Single WRITER still assumed (CDC apply is one foreachBatch loop);
readers are unrestricted and that is the point.
"""

from __future__ import annotations

import glob
import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from .writers import _parquet_key_range

_MANIFEST = "_manifest.json"


def read_manifest(store_dir: str) -> dict | None:
    try:
        with open(os.path.join(store_dir, _MANIFEST)) as fh:
            return json.load(fh)
    except FileNotFoundError:
        return None


def _write_manifest_atomic(store_dir: str, manifest: dict) -> None:
    tmp = os.path.join(store_dir, f".{_MANIFEST}.tmp.{uuid.uuid4().hex}")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.rename(tmp, os.path.join(store_dir, _MANIFEST))


def read_store(spark: SparkSession, store_dir: str) -> DataFrame:
    """Manifest-pinned read: exactly the current generation's live
    files (a directory listing would also see retained dead files —
    duplicate keys — and racing appends)."""
    m = read_manifest(store_dir)
    if m is None:
        raise FileNotFoundError(f"no manifest at {store_dir!r}")
    paths = [os.path.join(store_dir, f["path"]) for f in m["files"]]
    if not paths:
        raise ValueError(f"empty manifest generation at {store_dir!r}")
    return spark.read.option("basePath", store_dir).parquet(*paths)


def _glob_files(store_dir: str, partition_col: str) -> set:
    return set(
        os.path.relpath(p, store_dir)
        for p in glob.glob(
            os.path.join(store_dir, f"{partition_col}=*", "*.parquet")
        )
    )


def _file_entries(store_dir: str, rels, key_col: str) -> list[dict]:
    entries = []
    for rel in sorted(rels):
        rng = _parquet_key_range(os.path.join(store_dir, rel), key_col)
        entries.append(
            {
                "path": rel,
                "lo": None if rng is None else rng[0],
                "hi": None if rng is None else rng[1],
            }
        )
    return entries


def _retire_dead(
    m: dict, retention_seconds: float, now: float
) -> tuple[list[str], list[str]]:
    """Split the previous generation's dead list into files whose
    retention lapsed (physically deleted after the next swap) and
    files carried forward as still-dead. Manifests written before
    time-based retention carry no ``dead_since``; their dead files
    default to ts=0 — i.e. expired on the next swap, the original
    one-generation lag."""
    since = m.get("dead_since", {})
    expired: list[str] = []
    carried: list[str] = []
    for rel in m.get("dead", []):
        if now - since.get(rel, 0.0) >= retention_seconds:
            expired.append(rel)
        else:
            carried.append(rel)
    return expired, carried


def merge_manifest_store(
    store_dir: str,
    batch_latest: DataFrame,
    key_col: str,
    partition_col: str,
    resolve,
    files_per_bucket: int = 4,
    max_collected_keys: int = 1_000_000,
    batch_keys_hint: int | None = None,
    retention_seconds: float = 0.0,
) -> dict:
    """``merge_touched_files`` semantics behind a manifest generation:

    1. select replaced files from the MANIFEST's stored key ranges
       (zero parquet I/O; footers are read once per file, at the
       generation that created it);
    2. read exactly those files (+ batch), resolve last-write-wins,
       APPEND the result as new key-range-clustered files;
    3. swap ``_manifest.json`` atomically: live = (old live −
       replaced) + new files; dead = replaced (retained on disk);
    4. GC: physically delete dead files that have been dead for one
       full generation AND for at least ``retention_seconds`` —
       production table formats retain by time so lagging readers can
       finish arbitrarily old scans; the default (0) keeps the
       single-generation lag the concurrency probe hammers.

    Driver-memory bound: the batch's distinct (bucket, key) pairs are
    collected through a ``limit(max_collected_keys + 1)`` probe — ONE
    bounded job, never an unbounded collect. If the probe overflows
    (or the caller passes ``batch_keys_hint > max_collected_keys``,
    skipping the probe entirely — CDC appliers usually know their
    batch size upstream), the merge prunes by per-bucket [min, max]
    intervals instead (2 values per bucket — bounded by the bucket
    count at ANY batch size). Interval pruning is a superset of key
    pruning, so correctness is unchanged; at 100 TB this is what keeps
    the driver out of the data path.

    Returns the same observability dict as merge_touched_files plus
    ``generation`` and ``pruning`` ("keys" | "intervals").
    """
    import bisect

    spark = batch_latest.sparkSession
    n_out = max(int(files_per_bucket), 1)

    def write_clustered(df: DataFrame, mode: str) -> None:
        df.repartitionByRange(n_out, F.col(key_col)).write.partitionBy(
            partition_col
        ).mode(mode).parquet(store_dir)

    m = read_manifest(store_dir)
    if m is None:
        write_clustered(batch_latest, "overwrite")
        rels = _glob_files(store_dir, partition_col)
        _write_manifest_atomic(
            store_dir,
            {
                "generation": 0,
                "key_col": key_col,
                "files": _file_entries(store_dir, rels, key_col),
                "dead": [],
            },
        )
        return {
            "generation": 0,
            "touched_buckets": sorted(
                r[0]
                for r in batch_latest.select(partition_col)
                .distinct()
                .collect()
            ),
            "files_read": 0,
            "files_total": len(rels),
            "bytes_read": 0,
            "bytes_total": sum(
                os.path.getsize(os.path.join(store_dir, r)) for r in rels
            ),
            "pruning": "none",
        }

    # Driver-side batch keys are O(|batch|) — safe for CDC batches but
    # not unbounded. The probe collects distinct (bucket, key) pairs
    # through limit(max+1): one job whose driver footprint is bounded
    # by construction. On overflow (or an upstream hint that the batch
    # is huge), fall back to per-bucket [min, max] INTERVALS (2 values
    # per bucket, bounded by the bucket count): pruning weakens from
    # exact key-membership to interval overlap, correctness is
    # unchanged (an interval superset can only select MORE files,
    # never miss a key's file).
    batch_keys: dict[str, list] = {}
    batch_ranges: dict[str, tuple] = {}
    pairs = None
    if batch_keys_hint is None or batch_keys_hint <= max_collected_keys:
        pairs = (
            batch_latest.select(partition_col, key_col)
            .distinct()
            .limit(max_collected_keys + 1)
            .collect()
        )
        if len(pairs) > max_collected_keys:
            pairs = None  # overflow -> interval fallback
    if pairs is not None:
        for part, key in pairs:
            batch_keys.setdefault(str(part), []).append(key)
        for ks in batch_keys.values():
            ks.sort()
        touched_parts = set(batch_keys)
        pruning = "keys"
    else:
        for part, lo, hi in (
            batch_latest.groupBy(partition_col)
            .agg(F.min(key_col).alias("lo"), F.max(key_col).alias("hi"))
            .collect()
        ):
            batch_ranges[str(part)] = (lo, hi)
        touched_parts = set(batch_ranges)
        pruning = "intervals"
    if not touched_parts:
        return {
            "generation": m["generation"],
            "touched_buckets": [],
            "files_read": 0,
            "files_total": len(m["files"]),
            "bytes_read": 0,
            "bytes_total": 0,
            "pruning": pruning,
        }

    def bucket_raw(rel: str) -> str:
        return rel.split(os.sep, 1)[0].split("=", 1)[1]

    def entry_touched(e: dict) -> bool:
        b = bucket_raw(e["path"])
        if b not in touched_parts:
            return False
        if e["lo"] is None:
            return True  # no stats recorded -> cannot prune
        if batch_ranges:
            lo, hi = batch_ranges[b]
            return not (e["hi"] < lo or hi < e["lo"])
        keys = batch_keys[b]
        i = bisect.bisect_left(keys, e["lo"])
        return i < len(keys) and keys[i] <= e["hi"]

    replaced = [e for e in m["files"] if entry_touched(e)]
    kept = [e for e in m["files"] if not entry_touched(e)]
    replaced_paths = [os.path.join(store_dir, e["path"]) for e in replaced]
    bytes_read = sum(os.path.getsize(p) for p in replaced_paths)
    bytes_total = sum(
        os.path.getsize(os.path.join(store_dir, e["path"]))
        for e in m["files"]
    )

    if replaced_paths:
        old = spark.read.option("basePath", store_dir).parquet(
            *replaced_paths
        )
        merged_in = old.unionByName(batch_latest)
    else:
        merged_in = batch_latest

    from ..caching import track_local_checkpoint

    merged = track_local_checkpoint(resolve(merged_in).localCheckpoint())
    before = _glob_files(store_dir, partition_col)
    write_clustered(merged, "append")
    new_rels = _glob_files(store_dir, partition_col) - before

    now = time.time()
    expired, carried = _retire_dead(m, retention_seconds, now)
    newly_dead = [e["path"] for e in replaced]
    since = m.get("dead_since", {})
    _write_manifest_atomic(
        store_dir,
        {
            "generation": m["generation"] + 1,
            "key_col": key_col,
            "files": kept + _file_entries(store_dir, new_rels, key_col),
            "dead": carried + newly_dead,
            "dead_since": {
                **{rel: since.get(rel, 0.0) for rel in carried},
                **{rel: now for rel in newly_dead},
            },
        },
    )
    # GC only files dead for one full swap AND past retention — after
    # the new manifest is durable, so no reader resolves a removed path.
    for rel in expired:
        try:
            os.remove(os.path.join(store_dir, rel))
        except OSError:
            pass
    return {
        "generation": m["generation"] + 1,
        "touched_buckets": sorted(touched_parts),
        "files_read": len(replaced),
        "files_total": len(m["files"]),
        "bytes_read": bytes_read,
        "bytes_total": bytes_total,
        "pruning": pruning,
    }


def compact_manifest_store(
    spark: SparkSession,
    store_dir: str,
    key_col: str,
    partition_col: str,
    files_per_bucket: int = 4,
    retention_seconds: float = 0.0,
) -> dict:
    """Periodic repair under the manifest: rewrite ONE freshly
    key-range-clustered generation (merges grow the file count by up
    to files_per_bucket x touched buckets each, and their outputs'
    ranges overlap older files', weakening future pruning — the
    n=1000 sparse probe measured 256 → 640 files over 3 merges).

    The rewrite APPENDS the new generation (existing files are never
    touched, so concurrent readers of the old generation are
    undisturbed), swaps the manifest atomically, marks the ENTIRE old
    live set dead (retained one generation, like any merge), and GCs
    the previous generation's dead list. Content identity is pinned in
    tests/test_manifest_store.py.

    Returns {"generation", "files_before", "files_after"}.
    """
    m = read_manifest(store_dir)
    if m is None:
        raise FileNotFoundError(f"no manifest at {store_dir!r}")
    df = read_store(spark, store_dir)
    n_out = max(int(files_per_bucket), 1)
    before = _glob_files(store_dir, partition_col)
    df.repartitionByRange(n_out, F.col(key_col)).write.partitionBy(
        partition_col
    ).mode("append").parquet(store_dir)
    new_rels = _glob_files(store_dir, partition_col) - before
    now = time.time()
    expired, carried = _retire_dead(m, retention_seconds, now)
    newly_dead = [e["path"] for e in m["files"]]
    since = m.get("dead_since", {})
    _write_manifest_atomic(
        store_dir,
        {
            "generation": m["generation"] + 1,
            "key_col": key_col,
            "files": _file_entries(store_dir, new_rels, key_col),
            "dead": carried + newly_dead,
            "dead_since": {
                **{rel: since.get(rel, 0.0) for rel in carried},
                **{rel: now for rel in newly_dead},
            },
        },
    )
    for rel in expired:
        try:
            os.remove(os.path.join(store_dir, rel))
        except OSError:
            pass
    return {
        "generation": m["generation"] + 1,
        "files_before": len(m["files"]),
        "files_after": len(new_rels),
    }

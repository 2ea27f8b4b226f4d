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

Readers are unrestricted. Writers use OPTIMISTIC concurrency (the
Iceberg/Delta commit shape; the commit lock's storage primitives are
pluggable — ``commit_lock.py`` realizes them over POSIX O_EXCL or a
simulated object-store put-if-absent, so an object-store deployment
is an adapter, not a protocol change): each
merge stages its output files in a hidden dir (so every writer knows
exactly which files are its own — nothing reader-visible before the
swap), then takes a short exclusive-create commit lock for the
read-validate-swap of the manifest only; the expensive Spark work
never holds the lock. Validation fails — and the whole merge redoes
against the fresh manifest — iff a concurrent commit replaced one of
this merge's input files or added live files overlapping its batch
keys; writers touching disjoint FILES therefore commit without redo,
and overlapping writers serialize through redo (each redo resolves
over the winner's output, so last-write-wins stays consistent
regardless of commit order). The CDC apply remains one foreachBatch
loop in practice, but concurrent appliers are now safe by
construction (pinned in tests/test_manifest_store.py).

Metadata scale boundary (measured, scripts/manifest_scale_probe.py):
the flat single-JSON manifest costs ~1.4 s of metadata work per
commit at 200k live files (~100 TB at 512 MB/file), ~0.9 s of it
under the commit lock — commit throughput caps near 1/s there, which
fits minute-cadence CDC appliers. Sub-second commit rates or
multi-million-file stores need Iceberg-style manifest sharding
(split ``files`` by bucket range into side JSONs, root becomes the
manifest list); linear everywhere, no parse cliff (BASELINE.md §14).
"""

from __future__ import annotations

import contextlib
import glob
import json
import os
import shutil
import time
import uuid
import warnings

from pyspark.sql import DataFrame, SparkSession, functions as F

from .commit_lock import CommitLock
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


def read_store(
    spark: SparkSession,
    store_dir: str,
    key_range: tuple | None = None,
) -> DataFrame:
    """Manifest-pinned read: exactly the current generation's live
    files (a directory listing would also see retained dead files —
    duplicate keys — and racing appends).

    ``key_range=(lo, hi)`` (inclusive) pushes the predicate into the
    MANIFEST: only live files whose stored key range overlaps [lo, hi]
    are given to Spark at all — non-overlapping files cost zero I/O,
    not even a footer read. The returned frame is additionally
    filtered to the exact range, so callers get precise results even
    from files that merely overlap. At a multi-tenant store keyed on
    the composite (tenant, key) this is how a one-tenant scan reads
    one tenant's files (scripts/tenant_probe.py measures the write
    side of the same property)."""
    m = read_manifest(store_dir)
    if m is None:
        raise FileNotFoundError(f"no manifest at {store_dir!r}")
    entries = m["files"]
    if not entries:
        raise ValueError(f"empty manifest generation at {store_dir!r}")
    if key_range is None:
        paths = [os.path.join(store_dir, f["path"]) for f in entries]
        return spark.read.option("basePath", store_dir).parquet(*paths)
    lo, hi = key_range
    picked = [
        e
        for e in entries
        if e["lo"] is None or not (e["hi"] < lo or hi < e["lo"])
    ]
    key_col = m["key_col"]
    if not picked:
        # Preserve the store schema on an empty selection: scan one
        # live file with a never-true predicate (schema-only cost).
        one = os.path.join(store_dir, entries[0]["path"])
        return (
            spark.read.option("basePath", store_dir)
            .parquet(one)
            .where(F.lit(False))
        )
    paths = [os.path.join(store_dir, e["path"]) for e in picked]
    return (
        spark.read.option("basePath", store_dir)
        .parquet(*paths)
        .where(F.col(key_col).between(lo, hi))
    )


# Commit lock: token-holding, TOCTOU-free stale takeover, pluggable
# backend (POSIX O_EXCL | simulated object-store put-if-absent) — the
# object-store deployment boundary lives behind the three-method
# conditional-write interface in commit_lock.py, not in this protocol.
_CommitLock = CommitLock


def _safe_size(path: str) -> int:
    """Observability-only file size: with concurrent writers a file in
    *this* merge's snapshot can be GC'd by two quick interleaved
    commits before accounting runs — stats must never crash a merge."""
    try:
        return os.path.getsize(path)
    except OSError:
        return 0


def _stage_clustered(
    df: DataFrame,
    key_col: str,
    partition_col: str,
    n_out: int,
    store_dir: str,
    phases: dict | None = None,
) -> tuple[str, list[dict]]:
    """Write the clustered output into a hidden staging dir inside the
    store and return (stage_dir, manifest entries with store-relative
    paths + footer key ranges). Staging — not a direct append — is
    what makes the commit protocol safe under concurrent writers:
    every writer knows EXACTLY which files are its own (a
    directory-diff would claim a concurrent writer's files) and
    nothing becomes reader-visible before the manifest swap. Part
    filenames carry task UUIDs, so publishing is collision-free."""
    t0 = time.perf_counter()
    stage = os.path.join(store_dir, f".stage-{uuid.uuid4().hex}")
    df.repartitionByRange(n_out, F.col(key_col)).write.partitionBy(
        partition_col
    ).mode("overwrite").parquet(stage)
    t1 = time.perf_counter()
    rels = sorted(
        os.path.relpath(p, stage)
        for p in glob.glob(
            os.path.join(stage, f"{partition_col}=*", "*.parquet")
        )
    )
    entries = []
    for rel in rels:
        rng = _parquet_key_range(os.path.join(stage, rel), key_col)
        entries.append(
            {
                "path": rel,
                "lo": None if rng is None else rng[0],
                "hi": None if rng is None else rng[1],
            }
        )
    if phases is not None:
        t2 = time.perf_counter()
        phases["stage_write_s"] = round(
            phases.get("stage_write_s", 0.0) + (t1 - t0), 3
        )
        phases["stage_footers_s"] = round(
            phases.get("stage_footers_s", 0.0) + (t2 - t1), 3
        )
    return stage, entries


def _publish_staged(stage: str, store_dir: str, entries: list[dict]) -> None:
    """Move this writer's staged files into the store tree (same-fs
    renames: metadata-only). Runs under the commit lock, after
    validation, before the manifest swap — readers resolve files
    through the manifest, so the not-yet-live files are invisible."""
    for e in entries:
        dst = os.path.join(store_dir, e["path"])
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        os.rename(os.path.join(stage, e["path"]), dst)
    shutil.rmtree(stage, ignore_errors=True)


@contextlib.contextmanager
def _staged_cleanup_on_error(stage: str):
    """Reap the staging dir if the commit attempt raises (e.g. lock
    timeout) — staged files are invisible to readers, but an
    abandoned stage would otherwise sit on disk forever."""
    try:
        yield
    except BaseException:
        shutil.rmtree(stage, ignore_errors=True)
        raise


def _warn_zero_retention(store_dir: str) -> None:
    """A commit conflict proves concurrent writers exist; with
    ``retention_seconds=0`` a redo loser's input files can be
    physically GC'd by two quick interleaved commits while its Spark
    job is still reading them. The operating rule (retention >= the
    slowest merge) was docstring-only before r12 — now it speaks up
    the moment the risky configuration is *observed*."""
    warnings.warn(
        f"merge_manifest_store({store_dir!r}): commit conflict observed "
        "with retention_seconds=0 — concurrent writers need a retention "
        "window at least as long as the slowest merge, or a redo "
        "loser's input files may be GC'd mid-read "
        "(scripts/occ_probe.py runs with retention_seconds=3600)",
        RuntimeWarning,
        stacklevel=3,
    )


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
    max_commit_retries: int = 20,
    lock_timeout: float = 120.0,
    lock_stale_seconds: float = 600.0,
) -> dict:
    """``merge_touched_files`` semantics behind a manifest generation:

    1. select replaced files from the MANIFEST's stored key ranges
       (zero parquet I/O; footers are read once per file, at the
       generation that created it);
    2. read exactly those files (+ batch), resolve last-write-wins,
       STAGE the result as new key-range-clustered files and publish
       them by rename at commit;
    3. swap ``_manifest.json`` atomically: live = (current live −
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

    Concurrency: writers commit OPTIMISTICALLY (module docstring).
    The clustered output is staged in a hidden dir (exact file
    ownership; nothing reader-visible early), then a short
    exclusive-create lock covers the manifest's read-validate-swap
    only. Validation fails iff a concurrent commit replaced one of
    this merge's input files or added live files overlapping its
    batch keys; the merge then redoes against the fresh manifest (up
    to ``max_commit_retries``). Writers touching disjoint files
    never redo.
    Note: with concurrent writers, set ``retention_seconds`` at least
    as long as the slowest merge so a redo loser's input files are
    never GC'd mid-read — the same rule table formats apply to
    long-running readers.
    Crash recovery: a writer that dies holding the commit lock leaves
    it behind; waiters raise TimeoutError (after ``lock_timeout``)
    until the lock is ``lock_stale_seconds`` old, at which point
    exactly one waiter takes it over (conditional delete on the
    observed token — commit_lock.py). Tune ``lock_stale_seconds`` to
    a small multiple of the commit section's wall (milliseconds of
    metadata work), not of the merge's; the default 600 s is
    deliberately conservative for shared dev boxes.

    Returns the same observability dict as merge_touched_files plus
    ``generation``, ``pruning`` ("keys" | "intervals"),
    ``commit_retries`` and ``wall_s`` (this merge's wall-clock — the
    r11 bench artifact caught a 3x run-to-run swing on the filestats
    query and the per-batch wall is what localizes such swings).
    """
    import bisect

    t_merge0 = time.perf_counter()
    phases: dict[str, float] = {}

    def _mark(key: str, t0: float) -> float:
        now = time.perf_counter()
        phases[key] = round(phases.get(key, 0.0) + (now - t0), 3)
        return now

    spark = batch_latest.sparkSession
    n_out = max(int(files_per_bucket), 1)

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
    t_ph = time.perf_counter()
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
    t_ph = _mark("probe_s", t_ph)

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

    os.makedirs(store_dir, exist_ok=True)
    attempts = 0
    while True:
        m = read_manifest(store_dir)

        if m is None:
            # Creation: stage gen 0, claim it under the lock; a lost
            # race (another writer created gen 0 first) redoes this
            # batch as a normal merge against their manifest.
            stage, entries = _stage_clustered(
                batch_latest, key_col, partition_col, n_out, store_dir
            )
            with _staged_cleanup_on_error(stage), _CommitLock(
                store_dir, timeout=lock_timeout, stale_seconds=lock_stale_seconds
            ):
                if read_manifest(store_dir) is None:
                    _publish_staged(stage, store_dir, entries)
                    _write_manifest_atomic(
                        store_dir,
                        {
                            "generation": 0,
                            "key_col": key_col,
                            "files": entries,
                            "dead": [],
                            "dead_since": {},
                        },
                    )
                    return {
                        "generation": 0,
                        "touched_buckets": sorted(touched_parts),
                        "files_read": 0,
                        "files_total": len(entries),
                        "bytes_read": 0,
                        "bytes_total": sum(
                            _safe_size(os.path.join(store_dir, e["path"]))
                            for e in entries
                        ),
                        "pruning": "none",
                        "commit_retries": attempts,
                        "wall_s": round(time.perf_counter() - t_merge0, 3),
                    }
            shutil.rmtree(stage, ignore_errors=True)
            attempts += 1
            if retention_seconds <= 0 and attempts == 1:
                _warn_zero_retention(store_dir)
            if attempts > max_commit_retries:
                raise RuntimeError(
                    f"merge_manifest_store: {attempts} commit conflicts "
                    f"at {store_dir!r}"
                )
            continue

        if not touched_parts:
            return {
                "generation": m["generation"],
                "touched_buckets": [],
                "files_read": 0,
                "files_total": len(m["files"]),
                "bytes_read": 0,
                "bytes_total": 0,
                "pruning": pruning,
                "commit_retries": attempts,
                "wall_s": round(time.perf_counter() - t_merge0, 3),
            }

        replaced = [e for e in m["files"] if entry_touched(e)]
        replaced_set = {e["path"] for e in replaced}
        replaced_paths = [
            os.path.join(store_dir, e["path"]) for e in replaced
        ]
        bytes_read = sum(_safe_size(p) for p in replaced_paths)

        t_ph = time.perf_counter()
        if replaced_paths:
            old = spark.read.option("basePath", store_dir).parquet(
                *replaced_paths
            )
            merged_in = old.unionByName(batch_latest)
        else:
            merged_in = batch_latest

        from ..caching import track_local_checkpoint

        merged = track_local_checkpoint(
            resolve(merged_in).localCheckpoint()
        )
        t_ph = _mark("resolve_s", t_ph)
        stage, new_entries = _stage_clustered(
            merged, key_col, partition_col, n_out, store_dir, phases
        )
        t_ph = _mark("stage_s", t_ph)

        with _staged_cleanup_on_error(stage), _CommitLock(
            store_dir, timeout=lock_timeout, stale_seconds=lock_stale_seconds
        ):
            m2 = read_manifest(store_dir)
            live2 = {e["path"] for e in m2["files"]}
            base_paths = {e["path"] for e in m["files"]}
            # Conflict iff a concurrent commit (a) replaced a file this
            # merge resolved from, or (b) added live files overlapping
            # this batch's keys — rows this merge should have read.
            # Disjoint-key writers pass both checks and commit without
            # redo; this is the Iceberg/Delta validation shape.
            conflict = not (replaced_set <= live2) or any(
                entry_touched(e)
                for e in m2["files"]
                if e["path"] not in base_paths
            )
            if not conflict:
                _publish_staged(stage, store_dir, new_entries)
                now = time.time()
                expired, carried = _retire_dead(m2, retention_seconds, now)
                newly_dead = sorted(replaced_set)
                since = m2.get("dead_since", {})
                kept2 = [
                    e for e in m2["files"] if e["path"] not in replaced_set
                ]
                _write_manifest_atomic(
                    store_dir,
                    {
                        "generation": m2["generation"] + 1,
                        "key_col": key_col,
                        "files": kept2 + new_entries,
                        "dead": carried + newly_dead,
                        "dead_since": {
                            **{rel: since.get(rel, 0.0) for rel in carried},
                            **{rel: now for rel in newly_dead},
                        },
                    },
                )
                # GC only files dead for one full swap AND past
                # retention — after the new manifest is durable, so no
                # reader resolves a removed path.
                for rel in expired:
                    try:
                        os.remove(os.path.join(store_dir, rel))
                    except OSError:
                        pass
                # Totals against m2 — the generation this commit
                # actually validated and published over (a concurrent
                # commit touching only non-conflicting files can land
                # between the loop-top read and the lock); files_read/
                # bytes_read stay what the merge truly read (from m).
                return {
                    "generation": m2["generation"] + 1,
                    "touched_buckets": sorted(touched_parts),
                    "files_read": len(replaced),
                    "files_total": len(m2["files"]),
                    "bytes_read": bytes_read,
                    "bytes_total": sum(
                        _safe_size(os.path.join(store_dir, e["path"]))
                        for e in m2["files"]
                    ),
                    "pruning": pruning,
                    "commit_retries": attempts,
                    "wall_s": round(time.perf_counter() - t_merge0, 3),
                    "phases": {
                        **phases,
                        "commit_s": round(time.perf_counter() - t_ph, 3),
                    },
                }
        shutil.rmtree(stage, ignore_errors=True)
        attempts += 1
        if retention_seconds <= 0 and attempts == 1:
            _warn_zero_retention(store_dir)
        if attempts > max_commit_retries:
            raise RuntimeError(
                f"merge_manifest_store: {attempts} commit conflicts "
                f"at {store_dir!r}"
            )


def compact_manifest_store(
    spark: SparkSession,
    store_dir: str,
    key_col: str,
    partition_col: str,
    files_per_bucket: int = 4,
    retention_seconds: float = 0.0,
    max_commit_retries: int = 20,
    lock_timeout: float = 120.0,
    lock_stale_seconds: float = 600.0,
) -> dict:
    """Periodic repair under the manifest: rewrite ONE freshly
    key-range-clustered generation (merges grow the file count by up
    to files_per_bucket x touched buckets each, and their outputs'
    ranges overlap older files', weakening future pruning — the
    n=1000 sparse probe measured 256 → 640 files over 3 merges).

    The rewrite STAGES the new generation (existing files are never
    touched, so concurrent readers of the old generation are
    undisturbed), commits it under the same optimistic protocol as the
    merges — compaction rewrote the ENTIRE live set, so its validation
    is simply "the live set is unchanged"; any interleaved merge wins
    and the compaction redoes from the new generation — marks the old
    live set dead (retained per ``retention_seconds``, like any
    merge), and GCs lapsed dead files. Content identity is pinned in
    tests/test_manifest_store.py.

    Returns {"generation", "files_before", "files_after",
    "commit_retries"}.
    """
    n_out = max(int(files_per_bucket), 1)
    attempts = 0
    while True:
        m = read_manifest(store_dir)
        if m is None:
            raise FileNotFoundError(f"no manifest at {store_dir!r}")
        live = {e["path"] for e in m["files"]}
        df = read_store(spark, store_dir)
        stage, new_entries = _stage_clustered(
            df, key_col, partition_col, n_out, store_dir
        )
        with _staged_cleanup_on_error(stage), _CommitLock(
            store_dir, timeout=lock_timeout, stale_seconds=lock_stale_seconds
        ):
            m2 = read_manifest(store_dir)
            if {e["path"] for e in m2["files"]} == live:
                _publish_staged(stage, store_dir, new_entries)
                now = time.time()
                expired, carried = _retire_dead(m2, retention_seconds, now)
                newly_dead = sorted(live)
                since = m2.get("dead_since", {})
                _write_manifest_atomic(
                    store_dir,
                    {
                        "generation": m2["generation"] + 1,
                        "key_col": key_col,
                        "files": new_entries,
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
                    "generation": m2["generation"] + 1,
                    "files_before": len(m["files"]),
                    "files_after": len(new_entries),
                    "commit_retries": attempts,
                }
        shutil.rmtree(stage, ignore_errors=True)
        attempts += 1
        if attempts > max_commit_retries:
            raise RuntimeError(
                f"compact_manifest_store: {attempts} commit conflicts "
                f"at {store_dir!r}"
            )

"""How far does the single-JSON manifest carry? (r12 depth note)

The manifest store keeps ONE ``_manifest.json`` listing every live
file with its key range. At 100 TB and the production 512 MB file
target that is ~200k entries; Iceberg shards its metadata into
manifest FILES + a manifest list at this point. Before declaring a
boundary, measure what the flat design actually costs per commit at
store sizes bracketing 100 TB:

- read+parse (every merge reads the manifest twice: loop top +
  under the lock);
- selection (entry_touched over all live entries — pure python);
- atomic swap (serialize + write + rename, under the lock).

No Spark needed — this is driver-side metadata arithmetic. Usage:
python scripts/manifest_scale_probe.py [n_files ...]
(default 10_000 100_000 200_000 500_000)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from sp500_stock_etl_spark.hostinfo import host_stamp
    from sp500_stock_etl_spark.io.manifest_store import (
        _write_manifest_atomic,
        read_manifest,
    )

    ns = [int(a) for a in sys.argv[1:]] or [10_000, 100_000, 200_000, 500_000]
    stamp = host_stamp()
    n_buckets = 1024

    for n in ns:
        d = tempfile.mkdtemp(prefix="sg_manifest_scale_")
        keys_per_file = 10_000
        entries = [
            {
                "path": f"bucket={i % n_buckets}/part-{i:08d}.parquet",
                "lo": i * keys_per_file,
                "hi": (i + 1) * keys_per_file - 1,
            }
            for i in range(n)
        ]
        m = {
            "generation": 7,
            "key_col": "k",
            "files": entries,
            "dead": [e["path"] for e in entries[: n // 50]],
            "dead_since": {
                e["path"]: 1700000000.0 for e in entries[: n // 50]
            },
        }

        t0 = time.perf_counter()
        _write_manifest_atomic(d, m)
        write_s = time.perf_counter() - t0
        size_mb = os.path.getsize(os.path.join(d, "_manifest.json")) / 1e6

        t0 = time.perf_counter()
        m2 = read_manifest(d)
        read_s = time.perf_counter() - t0

        # Selection cost: a sparse batch touching 1% of the key space,
        # the entry_touched shape from merge_manifest_store (bucket
        # membership + range overlap per entry).
        touched = {str(b) for b in range(0, n_buckets, 100)}
        lo_b, hi_b = 0, n * keys_per_file // 100
        t0 = time.perf_counter()
        picked = [
            e
            for e in m2["files"]
            if e["path"].split("/", 1)[0].split("=", 1)[1] in touched
            and not (e["hi"] < lo_b or hi_b < e["lo"])
        ]
        select_s = time.perf_counter() - t0

        print(
            json.dumps(
                {
                    "probe": "manifest_scale",
                    "format": "flat",
                    **stamp,
                    "n_files": n,
                    "manifest_mb": round(size_mb, 2),
                    "write_swap_s": round(write_s, 3),
                    "read_parse_s": round(read_s, 3),
                    "select_s": round(select_s, 3),
                    "picked": len(picked),
                    "per_commit_overhead_s": round(
                        2 * read_s + select_s + write_s, 3
                    ),
                }
            ),
            flush=True,
        )

        # Sharded twin: same entries behind a 64-way sharded root;
        # the commit shape is root-read + touched-shard load + touched-
        # shard rewrite + root swap. The touched set is the same 1% of
        # buckets as the flat leg's selection.
        from sp500_stock_etl_spark.io.manifest_store import (
            _live_entries,
            _load_shards,
            _shard_id,
            _write_all_shards,
            _write_shard,
        )

        n_sh = 64
        t0 = time.perf_counter()
        shards = _write_all_shards(d, entries, n_sh)
        ms = {
            "generation": 7,
            "key_col": "k",
            "n_shards": n_sh,
            "shards": shards,
            "dead": [],
            "dead_since": {},
            "dead_meta": [],
            "dead_meta_since": {},
        }
        _write_manifest_atomic(d, ms)
        full_write_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        root2 = read_manifest(d)
        root_read_s = time.perf_counter() - t0

        t0 = time.perf_counter()
        loaded = _load_shards(d, root2, touched)
        t_load = time.perf_counter() - t0
        t0 = time.perf_counter()
        picked2 = [
            e
            for es in loaded.values()
            for e in es
            if e["path"].split("/", 1)[0].split("=", 1)[1] in touched
            and not (e["hi"] < lo_b or hi_b < e["lo"])
        ]
        t_sel = time.perf_counter() - t0
        t0 = time.perf_counter()
        new_shards = list(root2["shards"])
        for sid, es in loaded.items():
            new_shards[sid] = _write_shard(d, es)
        root3 = {**root2, "shards": new_shards}
        _write_manifest_atomic(d, root3)
        t_commit = time.perf_counter() - t0
        assert len(picked2) == len(picked)
        assert len(_live_entries(d, read_manifest(d))) == n

        print(
            json.dumps(
                {
                    "probe": "manifest_scale",
                    "format": f"sharded:{n_sh}",
                    **stamp,
                    "n_files": n,
                    "touched_shards": len(loaded),
                    "full_rewrite_s": round(full_write_s, 3),
                    "root_read_s": round(root_read_s, 3),
                    "touched_load_s": round(t_load, 3),
                    "select_s": round(t_sel, 3),
                    "touched_rewrite_swap_s": round(t_commit, 3),
                    "picked": len(picked2),
                    "per_commit_overhead_s": round(
                        2 * root_read_s + 2 * t_load + t_sel + t_commit, 3
                    ),
                }
            ),
            flush=True,
        )
        import shutil

        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()

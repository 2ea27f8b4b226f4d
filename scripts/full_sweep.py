#!/usr/bin/env python
"""Full-registry DuckDB parity sweep at an arbitrary sf, sliceable by
index range so long sweeps can run in bounded chunks:

    python scripts/full_sweep.py <sf_dir> [start] [end]

Sweeps sorted(queries())[start:end] (default: all). Prints one PROG
line per query and a final SWEEP summary; FAIL lines list any
mismatches. Used for the round-7 tri-scale parity results
(BASELINE.md §9): the rotating sf0.1 sample is the per-round
maintenance tool, this is the occasional full certification pass.
"""

from __future__ import annotations

import importlib.util
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# Oracles that are PATHOLOGICAL for DuckDB above sf0.01 — not the
# engine's plans, the ground-truth constructs: all-pairs quadratics
# and single-threaded recursive-CTE replays. They stay verified at
# sf0.01 (every vloop run) and by their engine-side invariant tests;
# the sf0.1 certification pass skips them and says so.
HEAVY_ORACLE_SKIP = {
    "dedup_ngram_jaccard",  # all-pairs exact baseline (documented exhibit)
    "corpus_sequence_packing",  # recursive-CTE greedy-pack replay
    "corpus_training_build",  # composed recursive-CTE capstone oracle
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    start = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    end = int(sys.argv[3]) if len(sys.argv) > 3 else 10**9

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "__spark_entry__.py",
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    from pyspark.sql import SparkSession

    from tests.parity import compare, duckdb_connect

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.ansi.enabled", "true")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.sql.shuffle.partitions", "16")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_connect(sf_dir)
    qs, oracles = mod.queries(), mod.oracle_sql()
    names = sorted(qs)[start:end]
    t0 = time.time()
    fails = []
    for i, name in enumerate(names):
        try:
            sf_val = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
        except ValueError:
            sf_val = 0.0
        if name in HEAVY_ORACLE_SKIP and sf_val >= 0.1:
            print(f"PROG {start + i + 1} {name} SKIP(heavy-oracle)", flush=True)
            continue
        try:
            d = qs[name](spark, sf_dir)
            if name in oracles:
                ok, msg = compare(d, con, oracles[name])
                if not ok:
                    fails.append((name, msg[:150]))
            else:
                d.count()
            print(
                f"PROG {start + i + 1} {name} {round(time.time() - t0, 1)}s",
                flush=True,
            )
        except Exception as ex:  # noqa: BLE001
            fails.append((name, "EXC " + str(ex)[:150]))
            print(f"PROG {start + i + 1} {name} EXC", flush=True)
    print(
        f"SWEEP {sf_dir} [{start}:{end}]: {len(names)} queries, "
        f"{len(fails)} FAIL, {round(time.time() - t0, 1)}s",
        flush=True,
    )
    for n, m in fails:
        print("FAIL", n, m.replace("\n", " "), flush=True)


if __name__ == "__main__":
    main()

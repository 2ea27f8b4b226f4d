"""bench.py helper logic (no Spark needed).

ADVICE r13 (low): the best-of-2 fold must keep the streaming split
consistent with the kept wall — a faster second run whose listener
drain produced nothing previously left the FIRST run's split paired
with the SECOND run's wall, so sched_wall_s decomposed against a
wall that was no longer the reported one and the suite-level
stream_sched_wall_s/stream_exec_s no longer summed against
full_suite.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _fold_best_of  # noqa: E402


def _split(exec_s, sched):
    return {"exec_s": exec_s, "sched_wall_s": sched, "batches": 3,
            "queries": 1}


def test_slower_second_run_keeps_first_wall_and_split():
    timings = {"q": 5.0}
    split = {"q": _split(4.0, 1.0)}
    _fold_best_of(timings, split, "q", 7.0, None)
    assert timings["q"] == 5.0
    assert split["q"]["sched_wall_s"] == 1.0  # untouched: wall unchanged


def test_faster_second_run_with_split_replaces_both():
    timings = {"q": 5.0}
    split = {"q": _split(4.0, 1.0)}
    _fold_best_of(timings, split, "q", 3.0, _split(2.5, 0.5))
    assert timings["q"] == 3.0
    assert split["q"] == _split(2.5, 0.5)


def test_faster_second_run_without_split_drops_stale_entry():
    """The ADVICE case: kept wall comes from a run with no drained
    split -> the first run's split must NOT survive against it."""
    timings = {"q": 5.0}
    split = {"q": _split(4.0, 1.0)}
    _fold_best_of(timings, split, "q", 3.0, None)
    assert timings["q"] == 3.0
    assert "q" not in split  # stale split dropped, not mismatched


def test_pure_batch_plan_untouched():
    timings = {"q": 5.0}
    split = {}
    _fold_best_of(timings, split, "q", 4.0, None)
    assert timings["q"] == 4.0
    assert split == {}

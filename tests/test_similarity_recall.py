"""ANN recall floors (round-4 verdict item 5).

The approximate top-k operators trade recall for a bucketed /
partition-pruned plan shape. Their VALUES are already exact-oracle
checked (each has a DuckDB oracle reproducing the same buckets); this
test pins their QUALITY so a future layout change — the r3→r4 LSH
rework is the motivating example — cannot silently trade recall for
speed. Recall@10 is computed against ``similarity_bruteforce_topk``
(the exact baseline) at sf0.01 over the same deterministic query set
(vec_id % 100 == 0 → 5 query vectors).

Measured on the driver-generated corpus (seed 42): LSH 0.06, IVF 0.12,
IVF nprobe=2 0.32. Floors sit just below those points; the synthetic
embeddings are near-uniform (no planted neighborhood structure beyond
the label cells), which is why the absolute numbers are low — the
invariant that matters operationally is the nprobe dial: probing 2
cells MUST beat probing 1.
"""

from __future__ import annotations

import pytest

from sp500_stock_etl_spark.plans.registry import all_queries

RECALL_FLOORS = {
    "similarity_lsh_topk": 0.04,
    "similarity_ivf_topk": 0.08,
    "similarity_ivf_topk_nprobe2": 0.25,
}


@pytest.fixture(scope="module")
def neighbor_sets(spark, sf_correct):
    qs = all_queries()
    out = {}
    for name in ["similarity_bruteforce_topk", *RECALL_FLOORS]:
        rows = (
            qs[name]
            .spark_fn(spark, sf_correct)
            .select("query_id", "neighbor_id")
            .collect()
        )
        d: dict[int, set[int]] = {}
        for r in rows:
            d.setdefault(r.query_id, set()).add(r.neighbor_id)
        out[name] = d
    return out


def _recall_at_10(approx: dict, exact: dict) -> float:
    recalls = [
        len(approx.get(q, set()) & nbrs) / len(nbrs)
        for q, nbrs in exact.items()
    ]
    return sum(recalls) / len(recalls)


@pytest.mark.parametrize("name", sorted(RECALL_FLOORS))
def test_recall_floor(name, neighbor_sets):
    exact = neighbor_sets["similarity_bruteforce_topk"]
    assert exact, "brute-force baseline returned no queries"
    recall = _recall_at_10(neighbor_sets[name], exact)
    assert recall >= RECALL_FLOORS[name], (
        f"{name}: recall@10 {recall:.3f} fell below the pinned floor "
        f"{RECALL_FLOORS[name]} — a layout/param change traded recall away"
    )


def test_nprobe_dial_buys_recall(neighbor_sets):
    """The whole point of the nprobe knob: more probed cells → more
    recall. If this stops holding, the affinity ranking is broken."""
    exact = neighbor_sets["similarity_bruteforce_topk"]
    r1 = _recall_at_10(neighbor_sets["similarity_ivf_topk"], exact)
    r2 = _recall_at_10(
        neighbor_sets["similarity_ivf_topk_nprobe2"], exact
    )
    assert r2 > r1, f"nprobe=2 recall {r2:.3f} <= nprobe=1 recall {r1:.3f}"

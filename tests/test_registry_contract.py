"""Driver-contract invariants for the registry itself: the things the
external verify driver depends on but no query test checks."""

from __future__ import annotations

from sp500_stock_etl_spark.plans.registry import _PRIORITY, all_queries


def test_priority_window_is_valid():
    qs = all_queries()
    assert len(_PRIORITY) == 50, "driver checks exactly the first 50"
    assert len(set(_PRIORITY)) == len(_PRIORITY), "no duplicate slots"
    missing = [n for n in _PRIORITY if n not in qs]
    assert not missing, f"priority names not in registry: {missing}"
    assert list(qs)[:50] == list(_PRIORITY), "ordering must honor _PRIORITY"


def test_registry_names_and_oracles_well_formed():
    qs = all_queries()
    assert len(qs) == len(set(qs)), "duplicate registration"
    for name, q in qs.items():
        assert name == q.name
        assert callable(q.spark_fn)
        if q.oracle is not None:
            assert "SELECT" in q.oracle.upper(), name


def test_rows_only_queries_are_documented_exceptions():
    """Every oracle-less query must be one of the known non-SQL-
    expressible classes — adding a new one here is a deliberate act."""
    qs = all_queries()
    rows_only = {n for n, q in qs.items() if q.oracle is None}
    assert rows_only == {
        # (approx_monitoring_profile left this set in r8: the sketch
        # estimates are now surfaced through the deterministic exact-
        # counts + error-bound certificate, same pattern as the
        # heavy-hitters upgrade.)
        "kmeans_embedding_clusters",
        "streaming_running_user_totals",
        "streaming_running_user_totals_ttl",
        # (multimodal_decode_features and token_heavy_hitters_sketch
        # left this set in r8 — verdict item 3: the histogram gained a
        # hex-digit arithmetic oracle; the sketch now emits its
        # deterministic exact-slice certificate with in-query bound
        # flags.)
        # r5: iterative global-argmax + rewrite (BPE training) — exact
        # vs a sequential reference in tests/test_bpe_merges.py.
        # (corpus_bpe_encode left this set in r7: with a pretrained
        # literal merge table its fold replays are composed-CTE SQL.)
        "corpus_bpe_merges",
        # r6: product quantization (kmeans family: iterative Lloyd's
        # with collected codebooks) — invariants in
        # tests/test_clustering.py::test_pq_codebooks_invariants;
        # the deterministic iters=0 encode twin
        # (embedding_pq_encode_init, r7) is fully oracle-checked.
        "embedding_pq_codebooks",
    }, rows_only

"""Cache accounting: persisted intermediates (LSH shingle/bucket
tables) must not outlive their query in a long-lived session
(ADVICE round 1: unbounded executor storage growth across repeated
registry invocations)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sp500_stock_etl_spark.caching import release_caches
from sp500_stock_etl_spark.io.readers import load_table
from sp500_stock_etl_spark.operators.dedup import (
    minhash_lsh_dedup,
    minhash_similarity_join,
)

SF_DIR = "/root/testdata/sf0.001"


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_lsh_caches_released_after_action(spark):
    # Baseline-relative (r11): other test FILES may leave untracked
    # persistent RDDs (their own .cache() fixtures); this suite pins
    # only that THIS query's caches come and go.
    release_caches()  # clean slate for our thread's tracked caches
    base = _n_persistent(spark)
    docs = load_table(spark, SF_DIR, "documents")
    out = minhash_lsh_dedup(docs, "doc_id", "text")
    out.count()  # terminal action — caches are live here
    assert _n_persistent(spark) > base, "expected live caches after action"
    release_caches()
    assert _n_persistent(spark) == base, "caches must not linger after release"


def test_similarity_join_caches_released(spark):
    release_caches()
    base = _n_persistent(spark)
    docs = load_table(spark, SF_DIR, "documents")
    q = docs.where(F.col("doc_id") % 2 == 0)
    c = docs.where(F.col("doc_id") % 2 == 1)
    minhash_similarity_join(q, c, "doc_id", "text").count()
    release_caches()
    assert _n_persistent(spark) == base


def test_release_is_thread_local(spark):
    """A concurrent server thread building its next query must not
    free caches another thread's in-flight query still reads."""
    import threading

    from sp500_stock_etl_spark.caching import track_persist

    release_caches()
    base = _n_persistent(spark)
    df = track_persist(spark.range(10))
    df.count()
    released_elsewhere = []
    t = threading.Thread(
        target=lambda: released_elsewhere.append(release_caches())
    )
    t.start()
    t.join()
    assert released_elsewhere == [0], "other thread released our cache"
    assert _n_persistent(spark) == base + 1, "cache must survive foreign release"
    assert release_caches() == 1


def test_registry_wrapper_releases_previous_query_caches(spark):
    """Building the NEXT registry query frees the previous one's
    caches — a driver that never calls release_caches() holds at most
    one query's worth."""
    from sp500_stock_etl_spark.plans.registry import all_queries

    release_caches()
    base = _n_persistent(spark)
    qs = all_queries()
    qs["dedup_minhash_lsh"].spark_fn(spark, SF_DIR).count()
    assert _n_persistent(spark) > base
    # Any subsequent registry build releases the lingering caches.
    qs["qa_aggregate"].spark_fn(spark, SF_DIR)
    assert _n_persistent(spark) == base
    release_caches()


def test_connected_components_checkpoints_released(spark):
    """Iterative CC localCheckpoints a frame per round; every round's
    blocks except the final frame's must be released inline, and the
    final frame's on release_caches() (round-5 advice: these RDDs live
    outside the SQL cache manager, so DataFrame.unpersist never frees
    them — repeated calls accumulated executor storage)."""
    from sp500_stock_etl_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    release_caches()
    base = _n_persistent(spark)
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(12)] + [(100, 101), (101, 102)],
        "src long, dst long",
    )
    for fn in (connected_components, connected_components_star):
        for _ in range(2):  # repeated calls must not accumulate
            fn(edges, max_iter=30).count()
            release_caches()
        assert _n_persistent(spark) <= base, (
            f"{fn.__name__} leaked checkpoint RDDs: "
            f"{_n_persistent(spark)} persistent vs baseline {base}"
        )

"""Regression guards for the Catalyst expression-blowup class fixed in
round 5 (operators/dedup.with_shingles docstring tells the story).

Two optimizer behaviors substitute a computed column's FULL defining
expression while moving predicates around:

1. InferFiltersFromGenerate: explode(shingles) grows an inferred
   `size(e)>0 AND isnotnull(e)` filter whose `e` is the whole
   word_shingles(tokens(text)) tree — the tokenizer regex re-runs
   inside every element_at, O(tokens^2) per doc (measured 64 s vs
   1.5 s at sf0.1). The rule is excluded session-wide.
2. PushDownPredicates on an explicit `size(shingles) > 0`: same
   substitution, same blowup. with_shingles now filters on the cheap
   token count instead, and no operator filters the computed array.

The guard is plan-shaped, not timed: the tokenizer's regexp_replace
must appear only a bounded number of times in the optimized plan.
A regression multiplies it by the shingle width (>= 3 per ngram
position), so a small ceiling separates the two regimes cleanly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sp500_stock_etl_spark.operators import dedup as D


def _optimized_plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def _docs(spark):
    rows = [(i, " ".join(f"tok{j}" for j in range(i % 7 + 3))) for i in range(40)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_shingle_explode_plan_has_no_tokenizer_blowup(spark):
    exploded = D.with_shingles(_docs(spark), "doc_id", "text", 3).select(
        "doc_id", F.explode("shingles").alias("gram")
    )
    plan = _optimized_plan(exploded)
    n = plan.count("regexp_replace")
    # Fixed regime: 1 in the shingle projection + 1 in the pushed cheap
    # token-count filter. Blowup regime: one per element_at per ngram
    # position (dozens).
    assert n <= 4, f"tokenizer duplicated {n}x in plan — expression blowup"


def test_infer_filters_from_generate_is_excluded(spark):
    excluded = spark.conf.get("spark.sql.optimizer.excludedRules", "")
    assert "InferFiltersFromGenerate" in excluded


def test_minhash_plan_bounded_tokenizer(spark):
    signed = D.minhash_signature(
        D.with_shingles(_docs(spark), "doc_id", "text", 3), num_hashes=8
    )
    pairs = D.lsh_candidate_pairs(signed, num_hashes=8, bands=4)
    n = _optimized_plan(pairs).count("regexp_replace")
    # Bucket frame is persisted and read twice -> up to 2 tokenizer
    # sites per read path (projection + cheap filter).
    assert n <= 8, f"tokenizer duplicated {n}x in LSH plan"


def test_r6_bigram_paths_bounded_tokenizer(spark):
    """The r6 bigram family (bigram LM, LM quality score, curation v2)
    explodes structs built by element access into the computed token
    array — the exact shape the round-5 blowup class attacked. The
    regexp count must stay bounded in every optimized plan.

    Ceilings are STRUCTURAL bounds, not exact counts: a persisted
    frame's lineage is PRINTED once per InMemoryRelation reference
    even though it materializes once, and the global-rank pattern
    persists a frame whose lineage contains the (already-persisted)
    doc-bigram frame — textual sites multiply across nested cached
    refs (observed up to ~36 for lm_quality in a warm session), and
    curation v2's URL canonicalization adds 8 regexps per survivor
    reference. The blowup REGRESSION this guards against multiplies
    sites by token width instead (~50 tokens/doc at sf0.001 → 150+
    sites), an order of magnitude above these ceilings."""
    from sp500_stock_etl_spark.plans.registry import all_queries

    qs = all_queries()
    for name, ceiling in (
        ("corpus_bigram_lm", 12),
        ("corpus_lm_quality_score", 60),
        ("corpus_curation_v2", 100),
    ):
        df = qs[name].spark_fn(spark, "/root/testdata/sf0.001")
        plan = _optimized_plan(df)
        n = plan.count("regexp_replace")
        cached = plan.count("InMemoryRelation")
        assert n <= ceiling, (
            f"{name}: regexp duplicated {n}x in optimized plan "
            f"(ceiling {ceiling}, {cached} cached refs) — "
            "expression blowup returned"
        )

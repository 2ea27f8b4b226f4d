"""Property-based exactness check for the AllPairs/PPJoin prefix
filters (operators/dedup.py::prefix_jaccard_pairs): on random small
corpora, the filtered join must return EXACTLY the pairs a brute-force
all-pairs Jaccard finds — the candidate filters (length, min-overlap,
position, integer-ceil prefix) may only drop pairs that provably
cannot reach the threshold. This is the property the ADVICE float-ceil
finding was about; here it is pinned generatively rather than by
hand-picked cases.

Docs are word sequences over a small alphabet so shingle collisions
(and near-threshold Jaccards) are common; thresholds exercise both
exact-millis values and awkward prefixes.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sp500_stock_etl_spark.operators.dedup import prefix_jaccard_pairs

NGRAM = 2
WORDS = ["aa", "bb", "cc", "dd", "ee"]


def _shingles(text: str) -> frozenset[str]:
    toks = text.split()
    return frozenset(
        " ".join(toks[i : i + NGRAM]) for i in range(len(toks) - NGRAM + 1)
    )


def _brute_pairs(docs: list[str], threshold: float) -> set[tuple[int, int]]:
    sh = {i: _shingles(t) for i, t in enumerate(docs)}
    out = set()
    for a in sh:
        for b in sh:
            if a < b and sh[a] and sh[b]:
                j = len(sh[a] & sh[b]) / len(sh[a] | sh[b])
                if j >= threshold:
                    out.add((a, b))
    return out


doc_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=2, max_size=8).map(" ".join),
    min_size=4,
    max_size=10,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=doc_strategy, threshold=st.sampled_from([0.3, 0.5, 0.6, 0.75, 0.9]))
def test_prefix_filter_join_is_exact(spark, docs, threshold):
    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id bigint, text string"
    )
    got = {
        (r.doc_a, r.doc_b)
        for r in prefix_jaccard_pairs(
            df, "doc_id", "text", ngram=NGRAM, threshold=threshold
        ).collect()
    }
    assert got == _brute_pairs(docs, threshold)


# ---------------------------------------------------------------------------
# Generative twin of test_robustness's adversarial rounding cases: the
# half-up-on-scaled-double kernel must stay bit-identical between
# Spark and DuckDB on arbitrary finite doubles, not just hand-picked
# .5 boundaries.
# ---------------------------------------------------------------------------


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    xs=st.lists(
        st.floats(
            allow_nan=False,
            allow_infinity=False,
            min_value=-1e12,
            max_value=1e12,
        ),
        min_size=1,
        max_size=50,
    ),
    scale=st.sampled_from([0, 2, 4, 6]),
)
def test_round_half_up_property_matches_duckdb(spark, xs, scale):
    import duckdb
    from pyspark.sql import functions as F

    from sp500_stock_etl_spark.functions.rounding import round_half_up, sql_round

    df = spark.createDataFrame([(i, x) for i, x in enumerate(xs)], "i bigint, x double")
    got = {
        r.i: r.r
        for r in df.select("i", round_half_up(F.col("x"), scale).alias("r")).collect()
    }
    con = duckdb.connect()
    want = {}
    for i, x in enumerate(xs):
        want[i] = con.execute(
            f"SELECT {sql_round('x', scale)} FROM (SELECT CAST(? AS DOUBLE) AS x)",
            [x],
        ).fetchone()[0]
    assert all(repr(got[i]) == repr(want[i]) for i in want), (got, want)

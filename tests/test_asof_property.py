"""Property tests for the as-of join family: the union-tag-window
operator (operators/joins.asof_join) must match pandas
``merge_asof(by=key, direction=...)`` row for row on random inputs,
for all three directions — backward (inclusive), forward (inclusive),
and nearest (tie → backward, which is also pandas' rule, verified
empirically). The registry oracles pin the operator against DuckDB's
ASOF JOIN on the real tables; this pins it against the THIRD
independent implementation on adversarial shapes (empty sides, equal
times across keys, single-row keys).

Right-side (key, time) pairs are deduplicated during generation: with
duplicate times the matched PAYLOAD is undefined in every engine
(pandas takes input order, a window takes sort order), so equality on
it would test tie-breaking nobody specifies.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings, strategies as st

from sp500_stock_etl_spark.operators.joins import asof_join

_KEYS = st.integers(min_value=0, max_value=2)
_TIMES = st.integers(min_value=0, max_value=50)


@st.composite
def _frames(draw):
    left = draw(
        st.lists(st.tuples(_KEYS, _TIMES), min_size=1, max_size=12)
    )
    right_pairs = draw(
        st.lists(st.tuples(_KEYS, _TIMES), min_size=0, max_size=12, unique=True)
    )
    left_rows = [(i, k, t) for i, (k, t) in enumerate(left)]
    right_rows = [(k, t, k * 1000 + t) for (k, t) in right_pairs]
    return left_rows, right_rows


def _pandas_asof(left_rows, right_rows, direction):
    lp = pd.DataFrame(left_rows, columns=["lid", "k", "t"]).sort_values(
        ["t", "lid"]
    )
    rp = (
        pd.DataFrame(right_rows, columns=["k", "t", "val"])
        .astype({"k": "int64", "t": "int64", "val": "int64"})
        .sort_values("t")
    )
    out = pd.merge_asof(
        lp, rp, on="t", by="k", direction=direction, suffixes=("", "_r")
    )
    return {
        int(r.lid): (None if pd.isna(r.val) else int(r.val))
        for r in out.itertuples()
    }


def _spark_asof(spark, left_rows, right_rows, direction):
    left = spark.createDataFrame(left_rows, "lid long, k long, t long")
    right = spark.createDataFrame(
        right_rows or [(0, 0, 0)], "k long, t long, val long"
    )
    if not right_rows:
        right = right.where("false")
    out = asof_join(
        left, right, ["k"], "t", "t", right_payload=["val"],
        direction=direction,
    )
    return {
        int(r["lid"]): (
            None if r["matched_val"] is None else int(r["matched_val"])
        )
        for r in out.collect()
    }


@settings(max_examples=25, deadline=None)
@given(_frames(), st.sampled_from(["backward", "forward", "nearest"]))
def test_asof_matches_pandas(spark, frames, direction):
    left_rows, right_rows = frames
    got = _spark_asof(spark, left_rows, right_rows, direction)
    want = _pandas_asof(left_rows, right_rows, direction)
    assert got == want, (direction, left_rows, right_rows)

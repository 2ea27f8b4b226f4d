"""Registry-wide output-schema audit (round-5 verdict item 1).

The driver's canonicalizer hashes query results through pandas
``sort_values``, which dies on unhashable cells — every driver ERROR
across rounds 4-5 (``array_functions_suite``, ``multimodal_decode_features``,
``embedding_quantize_int8``) was a registered query emitting a
top-level ``array<>`` column. This test closes the class: NO
registered query may expose a top-level ArrayType/MapType column.
Arrays that matter to the result must be final-projected to scalars
(sorted-prefix doubles, ``array_join`` strings, ``to_json``).

Batch queries are audited plan-only (schema analysis, no execution).
Streaming queries execute a micro-batch at sf0.001 to materialize
their sink schema — small and bounded; grep-audited too, but this
keeps the gate mechanical rather than textual.
"""

from __future__ import annotations

import pytest

from pyspark.sql.types import ArrayType, MapType

from sp500_stock_etl_spark.plans.registry import all_queries

QUERIES = all_queries()

SF_SMALL = "/root/testdata/sf0.001"


def _offending(df):
    return [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType))
    ]


@pytest.mark.parametrize(
    "name", sorted(n for n in QUERIES if not n.startswith("streaming_"))
)
def test_no_toplevel_array_batch(name, spark):
    df = QUERIES[name].spark_fn(spark, SF_SMALL)
    bad = _offending(df)
    assert not bad, (
        f"{name} exposes top-level array/map columns {bad} — the driver "
        "canonicalizer crashes on these; final-project to scalars "
        "(array_join / to_json / sorted prefix)."
    )


def test_no_toplevel_array_streaming(spark):
    # One pass, not parametrized: each streaming query runs a real
    # micro-batch; batching them into one test keeps suite time flat.
    offenders = {}
    for name in sorted(n for n in QUERIES if n.startswith("streaming_")):
        df = QUERIES[name].spark_fn(spark, SF_SMALL)
        bad = _offending(df)
        if bad:
            offenders[name] = bad
    assert not offenders, (
        f"streaming queries expose top-level array/map columns: {offenders}"
    )

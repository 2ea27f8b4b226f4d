

def test_stream_stream_outer_joins_parity_at_sparse_scale(spark):
    """Regression for the emission-frontier bug the r7 cross-scale
    sweep caught: the determinism cutoff must track least(max purchase
    ts, max click ts) — the global watermark is the MIN over the
    per-stream watermark nodes — not the global max(ts). At sf0.001
    the last click lags the last purchase by hours, which is exactly
    the regime where the old global-max cutoff leaked two
    never-emitted purchase-outer rows into the oracle's result."""
    from tests.parity import compare, duckdb_connect

    from sp500_stock_etl_spark.plans.registry import all_queries

    sf = "/root/testdata/sf0.001"
    con = duckdb_connect(sf)
    for name in (
        "streaming_stream_stream_left_join",
        "streaming_stream_stream_full_join",
    ):
        q = all_queries()[name]
        ok, msg = compare(q.spark_fn(spark, sf), con, q.oracle)
        assert ok, f"{name}: {msg}"

"""Round-9 births.

One deliberate birth this round (round-8 verdict item 8: depth over
breadth): the Arrow-optimized Python UDTF cell that completes the
SURVEY §2.12 Python-boundary matrix. The matrix already covered
scalar pandas_udf / grouped applyInPandas / mapInPandas and the three
Arrow-NATIVE cells (mapInArrow / applyInArrow / scalar arrow_udf);
the table-function cell was a documented boundary waiting on the API
(SURVEY §14.1 "Arrow UDTF ... if the API lands") — pyspark 4.1.2
ships ``udtf(..., useArrow=True)`` with LATERAL correlation, so it is
now closable with a real oracled query rather than a stub.

The reference DAG has no UDTFs (dags/sp500_dag.py.py is a linear
pandas pipeline); this is extension surface, same contract as every
§2.12 cell: exact integer arithmetic so the DuckDB oracle replays the
expansion bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import udtf

from ..io.readers import register_views
from .registry import register

# ---------------------------------------------------------------------------
# Installment schedule as a table function: each order's total is
# split into k = 1 + o_orderkey % 6 installments by the
# largest-remainder method (the first ``total mod k`` installments
# carry one extra cent), so the per-order sum reconstructs the total
# EXACTLY — the same integer-exactness discipline as
# corpus_domain_mixture's allocation. A UDTF is the honest shape for
# this: one input row fans out to a data-dependent number of output
# rows with per-row arithmetic, the lateral-join idiom SQL engines
# expose as table functions.
#
# Scale design: ArrowEvalPythonUDTF is a map-side operator — no
# shuffle, Arrow-batched both directions, parallelism = task count;
# the scan stays column-pruned (o_orderkey, o_totalprice only,
# plan-pinned in tests/test_udtf.py). Fan-out is bounded by k <= 6,
# so output volume is a constant factor of the input, never
# data-squared.
# ---------------------------------------------------------------------------


@udtf(returnType="installment int, amount_cents bigint", useArrow=True)
class _InstallmentsUDTF:
    def eval(self, total_cents: int, k: int):  # noqa: ANN001
        base = total_cents // k
        rem = total_cents - base * k
        for i in range(k):
            yield i, base + (1 if i < rem else 0)


_INSTALLMENTS_SQL = """
SELECT o.o_orderkey AS orderkey,
       i.installment AS installment,
       i.amount_cents AS amount_cents
FROM (SELECT /*+ REPARTITION({parts}) */ o_orderkey,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS total_cents,
             CAST(1 + o_orderkey % 6 AS INT) AS k
      FROM orders) o,
LATERAL sg_installments(o.total_cents, o.k) i
"""
# The REPARTITION is load-bearing: the UDTF evaluates per ROW (Arrow
# batches the transfer, not the eval), and a single-file scan would
# otherwise run the whole fan-out in ONE task — measured 15-19 s at
# sf0.1 vs ~1 s with the skinny 2-column input spread over the cores.
# The count must be EXPLICIT (defaultParallelism, injected at call
# time): a bare /*+ REPARTITION */ hint is AQE-coalescible, and AQE
# happily squeezed the ~3 MB input to 2 partitions — byte-based
# coalescing is blind to the Python cost per row above it. Standard
# shape for any Python fan-out: spread the cheap side BEFORE the
# expensive per-row stage so parallelism equals task count, not file
# count or input bytes.

_INSTALLMENTS_ORACLE = """
WITH o AS (
    SELECT o_orderkey,
           CAST(floor(o_totalprice * 100) AS BIGINT) AS total_cents,
           CAST(1 + o_orderkey % 6 AS BIGINT) AS k
    FROM orders
)
SELECT o.o_orderkey AS orderkey,
       CAST(i.installment AS INT) AS installment,
       CAST(o.total_cents // o.k
            + CASE WHEN i.installment < o.total_cents % o.k THEN 1 ELSE 0 END
            AS BIGINT) AS amount_cents
FROM o, LATERAL (SELECT unnest(range(o.k)) AS installment) i
"""


@register(
    "arrow_udtf_installments",
    _INSTALLMENTS_ORACLE,
    doc="largest-remainder installment schedule as an Arrow-optimized "
    "Python UDTF under LATERAL correlation — completes the SURVEY "
    "§2.12 boundary matrix's table-function cell; exact integer "
    "amounts, map-side fan-out bounded by k<=6 (r9)",
)
def q_arrow_udtf_installments(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Session-scoped registration; re-registering replaces, so repeat
    # invocations (serving mix, parity loops) are safe.
    spark.udtf.register("sg_installments", _InstallmentsUDTF)
    register_views(spark, sf_dir)
    return spark.sql(
        _INSTALLMENTS_SQL.format(parts=spark.sparkContext.defaultParallelism)
    )

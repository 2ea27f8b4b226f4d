"""SparkSession factory + runtime hardening.

The reference runs eagerly in a single Airflow worker process
(dags/sp500_dag.py.py:95 sequential symbol loop). Here the unit of
parallelism is the Spark task; this module centralizes the configs
that make the same plans work on local[32] for tests and on a
1000-executor cluster at 100 TB:

- AQE on (runtime coalescing + skew-join splitting),
- shuffle partitions sized to cores locally (cluster: ~2-3x total
  cores, or let AQE coalesce from a high initial number),
- UTC session timezone so timestamp semantics are environment-free,
- ANSI off so lossy casts / div-by-zero yield NULL like the
  reference's ``pd.to_numeric(errors='coerce')``
  (dags/sp500_dag.py.py:175); hot paths still use try_* functions so
  they are correct under either setting.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

# Conf that must be set before the JVM starts.
_BUILD_TIME_CONF = {
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    "spark.sql.shuffle.partitions": None,  # filled from cpus below
}

# Conf that is runtime-settable; applied to any session we're handed
# (the verify driver owns its own SparkSession).
_RUNTIME_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.ansi.enabled": "false",
    # Arrow for the (few) Pandas-UDF paths: vectorized transfer.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Arrow batch size for every mapInPandas/pandas_udf path, pinned
    # HERE (session-wide, documented) rather than mutated inside
    # operators: 512 bounds per-batch memory when rows carry fat
    # binary payloads (multimodal decode) while keeping Arrow transfer
    # efficient for slim rows.
    "spark.sql.execution.arrow.maxRecordsPerBatch": "512",
    # Parquet scans: keep pushdown on (explicitly, for .explain review).
    "spark.sql.parquet.filterPushdown": "true",
    # Python Data Source API: let custom sources (sources/quote_feed)
    # receive pushed filters for source-level pruning.
    "spark.sql.python.filterPushdown.enabled": "true",
    # Spark 4 rejects TIMESTAMP(NANOS) parquet (events.ts); read the
    # raw int64 and convert in the loader (io/readers.py) — integer
    # division, since double math loses precision at 1e18.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # InferFiltersFromGenerate infers `size(e)>0 AND isnotnull(e)`
    # under every explode(e); filter-pushdown then substitutes e's
    # FULL expression tree through the projections, so an exploded
    # computed array (word shingles: tokens() inlined into every
    # element_at) gets re-evaluated as O(tokens^2) regex work in a
    # Filter below the Generate. Measured on the shingle-explode
    # path: 64 s -> 1.5 s at sf0.1 (corpus_decontamination_bloom).
    # The rule only ever skips empty generator inputs — a no-op for
    # our corpora — and excluding it is optimization-neutral for
    # correctness (verified: full oracle-parity suite green).
    "spark.sql.optimizer.excludedRules": (
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
    ),
}


def default_cpus() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _ship_package(spark: SparkSession) -> None:
    """Make this package importable on Python WORKERS.

    cloudpickle serializes module-level functions by reference
    (module + qualname), so any mapInPandas/applyInPandas* closure
    needs the worker to ``import sp500_stock_etl_spark`` — which only
    works by accident when the driver's cwd is the repo root. Ship a
    zip via ``addPyFile`` once per SparkContext so UDF-bearing plans
    run no matter where the driver session was created from.
    """
    sc = spark.sparkContext
    if getattr(sc, "_sg_pkg_shipped", False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zpath = os.path.join(
        tempfile.mkdtemp(prefix="sg_pkg_"), "sp500_stock_etl_spark.zip"
    )
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(pkg_dir):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(root, fn)
                    z.write(full, os.path.relpath(full, os.path.dirname(pkg_dir)))
    sc.addPyFile(zpath)
    sc._sg_pkg_shipped = True


def get_spark(app_name: str = "sp500-stock-etl-spark", cpus: int | None = None) -> SparkSession:
    """Build (or fetch) a local session sized for this machine."""
    cpus = cpus or default_cpus()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.driver.memory", _BUILD_TIME_CONF["spark.driver.memory"])
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.ui.enabled", "false")
    )
    for k, v in _RUNTIME_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    _ship_package(spark)
    return spark


def harden(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable conf to an externally-created session.

    Called at the top of every registry query so results do not depend
    on the caller's session defaults (timezone, ANSI, AQE).
    """
    for k, v in _RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # immutable in some deployments; try_* paths still hold
            pass
    _ship_package(spark)
    return spark

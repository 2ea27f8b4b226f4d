"""Query registry — the single source of truth wired into
``__spark_entry__.py`` (driver contract) and the parity tests.

Each entry: name → (spark_fn, oracle_sql | None). ``spark_fn`` takes
(spark, sf_dir) and returns a DataFrame; ``oracle_sql`` is ANSI SQL
DuckDB runs over the same parquet files. Column names/aliases MUST
match between the two (driver hashes values after sorting columns by
name). Entries with ``oracle_sql=None`` get a weaker rows-only check
(reserved for genuinely non-SQL-expressible ops).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from ..session import harden


@dataclass(frozen=True)
class Query:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            harden(spark)
            return fn(spark, sf_dir)

        _REGISTRY[name] = Query(name, wrapped, oracle, doc)
        return wrapped

    return deco


def all_queries() -> dict[str, Query]:
    # Import modules for their registration side effects.
    from . import queries_reference  # noqa: F401
    from . import queries_extensions  # noqa: F401
    from . import queries_analytics  # noqa: F401
    from . import queries_sources  # noqa: F401
    from . import queries_relational2  # noqa: F401
    from . import queries_northstar  # noqa: F401
    from . import queries_streaming  # noqa: F401
    from . import queries_multimodal  # noqa: F401

    return dict(_REGISTRY)

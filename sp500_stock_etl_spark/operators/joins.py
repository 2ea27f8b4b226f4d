"""Join operators (SURVEY.md §2.9).

The reference has no joins — its symbols→quotes relationship is a
driver-side loop with a literal-column stamp (dags/sp500_dag.py.py:95,
138), i.e. a degenerate nested loop. The engine realizes it (and the
star-schema capability bar) with real join strategies:

- broadcast hash for small dims (`F.broadcast` — at 100 TB the dims
  here are MBs while the fact is TBs; never shuffle the fact for a
  dim join);
- sort-merge for fact-fact (orders ⨝ lineitem), where AQE converts to
  shuffled-hash or splits skewed partitions at runtime;
- semi/anti via ``left_semi``/``left_anti`` (no payload duplication,
  Catalyst rewrites IN/EXISTS to these anyway);
- as-of join (Spark lacks it natively): union-tag-window composition,
  one shuffle on (key), no range explosion — the scalable pattern for
  point-in-time lookups.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F

_SIDE = "__asof_side__"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    left_time: str,
    right_time: str,
    right_payload: Sequence[str],
    payload_prefix: str = "matched_",
) -> DataFrame:
    """Point-in-time join: for each left row, attach the payload of the
    latest right row with ``right_time <= left_time`` on the same key.

    Implementation: tag both sides, union by key, and carry the last
    non-null payload forward with ``last(..., ignorenulls=True)`` over
    ``(PARTITION BY key ORDER BY time, side)``. Right rows sort before
    left rows at equal times, so the match is inclusive.

    Scale: ONE hash exchange on the key columns and a per-partition
    sort — no range cross-join, no per-key collect. Equivalent DuckDB
    oracle: ``ASOF LEFT JOIN ... ON l.key = r.key AND l.t >= r.t``.
    """
    key_cols = list(key_cols)
    time_col = "__asof_time__"

    l_tag = left.select(
        *key_cols,
        F.col(left_time).alias(time_col),
        F.lit(1).alias(_SIDE),
        *[c for c in left.columns if c not in key_cols and c != left_time],
        F.col(left_time),
        *[F.lit(None).cast(right.schema[p].dataType).alias(f"{payload_prefix}{p}") for p in right_payload],
    )
    r_tag = right.select(
        *key_cols,
        F.col(right_time).alias(time_col),
        F.lit(0).alias(_SIDE),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in key_cols and c != left_time],
        F.lit(None).cast(left.schema[left_time].dataType).alias(left_time),
        *[F.col(p).alias(f"{payload_prefix}{p}") for p in right_payload],
    )

    w = (
        Window.partitionBy(*key_cols)
        .orderBy(time_col, _SIDE)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_tag.unionByName(r_tag).withColumns(
        {
            f"{payload_prefix}{p}": F.last(f"{payload_prefix}{p}", ignorenulls=True).over(w)
            for p in right_payload
        }
    )
    return filled.where(F.col(_SIDE) == 1).drop(_SIDE, time_col)

"""Skew mitigation (SURVEY.md §7.4): explicit key salting.

AQE's skew-join splitting (``spark.sql.adaptive.skewJoin.enabled``,
on via session.harden) handles most sort-merge skew at runtime by
splitting oversized partitions. Explicit salting remains the tool
when AQE can't see or can't split the skew:

- shuffle-hash joins and streaming stateful joins (no AQE re-plan),
- a hot key so large that even a split partition's build side blows
  memory,
- pre-partitioned/bucketed layouts where the salt must be baked into
  the on-disk layout.

``salted_join`` replicates the small/dimension side ``n_salts`` times
(explode over a literal range — map-side, no shuffle) and computes the
big side's salt deterministically from a tie-break column, so the
composite key ``(key, salt)`` spreads one hot key over ``n_salts``
reducers. Result is row-identical to the plain join (oracle-checked in
the registry as ``skew_salted_join``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def with_salt(df: DataFrame, source: Column, n_salts: int, col: str = "__salt__") -> DataFrame:
    """Deterministic salt in [0, n_salts): hash of a stable column.
    Never use rand() — retries/speculative tasks would disagree."""
    return df.withColumn(col, F.pmod(F.xxhash64(source), F.lit(n_salts)).cast("int"))


def replicate_for_salt(df: DataFrame, n_salts: int, col: str = "__salt__") -> DataFrame:
    """Cross the (small) side with salt values 0..n_salts-1. Map-side
    explode; output is n_salts× the input, still broadcast-sized for
    true dimensions."""
    # sequence(int, int) already yields ints; casting the explode()
    # output directly is an unsupported nested generator.
    return df.withColumn(col, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_source: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join with the hot-key pressure spread over ``n_salts`` buckets.

    ``salt_source`` is a column of ``big`` that varies within a key
    (line number, event id …) so rows of one hot key land in different
    buckets. Row-identical to ``big.join(small, on, how)``.
    """
    b = with_salt(big, F.col(salt_source), n_salts)
    s = replicate_for_salt(small, n_salts)
    return b.join(s, [on, "__salt__"], how).drop("__salt__")

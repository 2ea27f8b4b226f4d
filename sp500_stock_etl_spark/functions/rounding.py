"""Cross-engine-deterministic rounding (SURVEY.md §7.5.1).

The reference rounds with pandas (banker's on the decimal string),
Spark's ``round`` converts the double to BigDecimal and rounds
HALF_UP on its exact binary expansion, and DuckDB's ``round`` rounds
the scaled double — three subtly different answers on values whose
shortest decimal ends in 5 (observed: Spark 91204.33 vs DuckDB
91204.34 for low = extendedprice*(1-discount)).

The engine therefore defines ONE rounding policy — half-up on the
scaled IEEE double:

    round_d(x) = sign(x) * floor(abs(x) * 10^d + 0.5) / 10^d

and uses the identical operation sequence in the Spark plan and in
every DuckDB oracle (``sql_round``), making results bitwise equal in
both engines. The policy matches the reference's intent (prices to
cents, derived metrics to 4 places); the last-ulp choice on exact-.5
doubles is ours to make, and we make it identically everywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def round_half_up(col: Column, scale: int) -> Column:
    """Half-up rounding on the scaled double; bitwise-matches
    ``sql_round`` in DuckDB. floor() returns BIGINT in Spark — the
    division promotes back to double, same value as DuckDB's
    double-typed floor for anything within 2^53. The trailing ``+ 0.0``
    normalizes IEEE negative zero: Spark's signum(-0.0) keeps the sign
    bit while DuckDB's sign(-0.0) drops it, and repr-level comparators
    (the driver's value hash) distinguish -0.0 from 0.0."""
    p = float(10**scale)
    return (
        F.signum(col) * F.floor(F.abs(col) * F.lit(p) + F.lit(0.5)) / F.lit(p)
        + F.lit(0.0)
    )


def sql_round(expr: str, scale: int) -> str:
    """The same kernel as ANSI SQL text for DuckDB oracles."""
    p = float(10**scale)
    return f"(sign({expr}) * floor(abs({expr}) * {p} + 0.5) / {p} + 0.0)"

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
    direction: str = "backward",
) -> DataFrame:
    """Point-in-time join: for each left row, attach the payload of
    the latest right row with ``right_time <= left_time`` on the same
    key (``direction="backward"``, the default), of the EARLIEST
    right row with ``right_time >= left_time``
    (``direction="forward"`` — merge_asof's forward direction), or of
    whichever of those two is CLOSER in time
    (``direction="nearest"`` — merge_asof's nearest; equal distances
    resolve to the backward match, and an exact-time match is a
    zero-distance backward match so it always wins).

    Implementation: tag both sides, union by key, and carry the
    nearest non-null payload across with ``last(...)`` over a
    preceding frame (backward) / ``first(...)`` over a following
    frame (forward), ordered by ``(time, side)`` with the RIGHT side
    sorting toward the left side at equal times, so matches are
    inclusive in both directions. ``nearest`` computes BOTH fills
    over the SAME sorted partition — still one exchange + one sort —
    and picks per row by time distance.

    Scale: ONE hash exchange on the key columns and a per-partition
    sort — no range cross-join, no per-key collect. Equivalent DuckDB
    oracle: ``ASOF LEFT JOIN ... ON l.key = r.key AND l.t >= r.t``
    (backward) / ``AND l.t <= r.t`` (forward); nearest = both ASOF
    joins + a CASE on the distances.
    """
    if direction == "nearest":
        return _asof_join_nearest(
            left, right, key_cols, left_time, right_time,
            right_payload, payload_prefix,
        )
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown asof direction {direction!r}")
    key_cols = list(key_cols)
    time_col = "__asof_time__"
    l_side, r_side = (1, 0) if direction == "backward" else (0, 1)

    l_tag = left.select(
        *key_cols,
        F.col(left_time).alias(time_col),
        F.lit(l_side).alias(_SIDE),
        *[c for c in left.columns if c not in key_cols and c != left_time],
        F.col(left_time),
        *[F.lit(None).cast(right.schema[p].dataType).alias(f"{payload_prefix}{p}") for p in right_payload],
    )
    r_tag = right.select(
        *key_cols,
        F.col(right_time).alias(time_col),
        F.lit(r_side).alias(_SIDE),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in key_cols and c != left_time],
        F.lit(None).cast(left.schema[left_time].dataType).alias(left_time),
        *[F.col(p).alias(f"{payload_prefix}{p}") for p in right_payload],
    )

    base = Window.partitionBy(*key_cols).orderBy(time_col, _SIDE)
    if direction == "backward":
        w = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        fill = lambda c: F.last(c, ignorenulls=True).over(w)  # noqa: E731
    else:
        w = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        fill = lambda c: F.first(c, ignorenulls=True).over(w)  # noqa: E731
    filled = l_tag.unionByName(r_tag).withColumns(
        {
            f"{payload_prefix}{p}": fill(f"{payload_prefix}{p}")
            for p in right_payload
        }
    )
    return filled.where(F.col(_SIDE) == l_side).drop(_SIDE, time_col)


def _asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    left_time: str,
    right_time: str,
    right_payload: Sequence[str],
    payload_prefix: str,
) -> DataFrame:
    """``asof_join(direction="nearest")``: both directional fills over
    one sorted partition, then a per-row pick by |Δt| (tie → the
    backward match). Sides sort (right=0, left=1) at equal times, so
    the preceding-frame fill sees equal-time right rows (inclusive
    backward) and the following frame sees strictly-later ones —
    correct, because an equal-time match has distance zero and the
    backward pick always takes it."""
    key_cols = list(key_cols)
    time_col = "__asof_time__"
    l_side, r_side = 1, 0
    rt = right.schema[right_time].dataType

    l_tag = left.select(
        *key_cols,
        F.col(left_time).alias(time_col),
        F.lit(l_side).alias(_SIDE),
        *[c for c in left.columns if c not in key_cols and c != left_time],
        F.col(left_time),
        F.lit(None).cast(rt).alias("__rt__"),
        *[
            F.lit(None).cast(right.schema[p].dataType).alias(f"__p_{p}__")
            for p in right_payload
        ],
    )
    r_tag = right.select(
        *key_cols,
        F.col(right_time).alias(time_col),
        F.lit(r_side).alias(_SIDE),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in key_cols and c != left_time
        ],
        F.lit(None).cast(left.schema[left_time].dataType).alias(left_time),
        F.col(right_time).alias("__rt__"),
        *[F.col(p).alias(f"__p_{p}__") for p in right_payload],
    )

    base = Window.partitionBy(*key_cols).orderBy(time_col, _SIDE)
    wb = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wf = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    fills = {"__bwd_rt__": F.last("__rt__", ignorenulls=True).over(wb),
             "__fwd_rt__": F.first("__rt__", ignorenulls=True).over(wf)}
    for p in right_payload:
        fills[f"__bwd_{p}__"] = F.last(f"__p_{p}__", ignorenulls=True).over(wb)
        fills[f"__fwd_{p}__"] = F.first(f"__p_{p}__", ignorenulls=True).over(wf)
    filled = l_tag.unionByName(r_tag).withColumns(fills)

    t = F.col(time_col)
    # Exact distances: integer microseconds for timestamps (double
    # epoch-seconds would round near the 2^53 boundary and the
    # nearest-pick must agree bit-for-bit with the oracle's CASE),
    # plain numeric difference otherwise.
    from pyspark.sql.types import TimestampType

    if isinstance(rt, TimestampType):
        num = F.unix_micros
    else:
        num = lambda c: c.cast("double")  # noqa: E731
    dist_b = num(t) - num(F.col("__bwd_rt__"))
    dist_f = num(F.col("__fwd_rt__")) - num(t)
    use_fwd = F.col("__fwd_rt__").isNotNull() & (
        F.col("__bwd_rt__").isNull() | (dist_f < dist_b)
    )
    out_cols = {
        f"{payload_prefix}{p}": F.when(use_fwd, F.col(f"__fwd_{p}__")).otherwise(
            F.col(f"__bwd_{p}__")
        )
        for p in right_payload
    }
    drop = (
        [_SIDE, time_col, "__rt__", "__bwd_rt__", "__fwd_rt__"]
        + [f"__p_{p}__" for p in right_payload]
        + [f"__bwd_{p}__" for p in right_payload]
        + [f"__fwd_{p}__" for p in right_payload]
    )
    return (
        filled.where(F.col(_SIDE) == l_side)
        .withColumns(out_cols)
        .drop(*drop)
    )


def bloom_semi_prefilter(
    probe: DataFrame,
    probe_col: str,
    build: DataFrame,
    build_col: str,
    n_hashes: int = 5,
    n_bits: int = 1 << 20,
) -> DataFrame:
    """Catalyst-only Bloom semi-join prefilter — the membership test
    for when the build side is too large to broadcast EXACTLY but its
    bit signature is not.

    Build side: each value explodes into ``n_hashes`` bit positions
    (``pmod(xxhash64(v, seed_i), n_bits)``), positions fold into
    64-bit words via ``bit_or`` (one tiny shuffle on word index — at
    most ``n_bits/64`` groups regardless of build cardinality), and
    the words densify into ONE ``array<bigint>`` row of exactly
    ``n_bits/64`` words (missing words 0) that broadcasts at
    ``n_bits/8`` bytes, independent of build row count. The dense
    array matters: Spark's ``element_at`` on a MapType is a LINEAR
    scan of the map, which made the map-shaped first cut O(n_words)
    per probe hash — 30+ s at sf0.1; array indexing is O(1) and the
    same query is ~1 s. The one-time densify pays n_words map lookups
    at build, not per probe row.
    Probe side: a row survives iff all of its value's k bits are set
    (a missing word reads 0, so every bit test fails — not-contained,
    which is correct).

    Guarantees: NO false negatives (every true member's bits were all
    set by the build pass), so ``bloom_semi_prefilter(...)`` followed
    by an exact confirm join returns exactly the semi-join result;
    false positives only cost confirm-join work. Everything is
    deterministic JVM-side expression code — no Python, no UDF.

    At 100 TB: replaces broadcasting an eval-set of billions of
    n-grams (impossible) or shuffling the full training corpus on
    gram (the expensive default) with a fixed-size bitmap broadcast +
    map-side filter; only the surviving sliver reaches the confirm
    join. This is the same play Spark's own runtime row-level
    filtering makes, expressed as an explicit operator.
    """
    from functools import reduce as _reduce

    n_words = n_bits // 64

    # 1<<j for bit j as a literal lookup (shiftleft() takes only a
    # Python int for the shift amount); j=63 is the sign bit, whose
    # long value is negative in two's complement — bit_or/bitwiseAND
    # are bit-pattern ops, so that is fine.
    _pow2 = F.array(
        *[
            F.lit((1 << j) if j < 63 else -(1 << 63)).cast("bigint")
            for j in range(64)
        ]
    )

    def _pos(col, i: int):
        return F.pmod(F.xxhash64(col, F.lit(i)), F.lit(n_bits))

    def _word(p):
        return (p / F.lit(64)).cast("bigint")

    def _bit(p):
        return F.element_at(_pow2, (p % 64).cast("int") + 1)

    positions = build.select(
        F.explode(
            F.array(*[_pos(F.col(build_col), i) for i in range(n_hashes)])
        ).alias("p")
    )
    words = (
        positions.select(_word(F.col("p")).alias("w"), _bit(F.col("p")).alias("b"))
        .groupBy("w")
        .agg(F.bit_or("b").alias("bits"))
    )
    # Densify via a word-index left join, NOT a map-probe fill: a
    # sequence/transform fill over a map literal is n_words linear map
    # scans (~270M comparisons at 2^20 bits — measured ~12 s, single
    # thread); the join + sorted collect is O(n_words log n_words)
    # with trivial constants.
    idx = build.sparkSession.range(n_words).select(
        F.col("id").cast("bigint").alias("w")
    )
    bitmap = (
        idx.join(words, "w", "left")
        .select("w", F.coalesce("bits", F.lit(0).cast("bigint")).alias("bits"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("w", "bits"))),
                lambda x: x["bits"],
            ).alias("__bloom")
        )
    )
    assert n_words * 64 == n_bits, "n_bits must be a multiple of 64"

    checks = []
    for i in range(n_hashes):
        p = _pos(F.col(probe_col), i)
        checks.append(
            F.element_at(F.col("__bloom"), _word(p).cast("int") + 1).bitwiseAND(
                _bit(p)
            )
            != F.lit(0)
        )
    return (
        probe.join(F.broadcast(bitmap))
        .where(_reduce(lambda a, b: a & b, checks))
        .drop("__bloom")
    )

"""Text primitives for the LLM-data-pipeline operators (north star):
tokenization, char/word shingles, deterministic 32-bit string hashing.

Everything here is a native Catalyst expression (no UDFs): split /
transform / element_at / md5 / conv — whole-stage-codegen'd JVM work,
and each has an exact DuckDB twin (the ``sql_*`` generators) so dedup
and similarity queries are oracle-checkable bit-for-bit.

Hashing: engines' native hash functions differ (Spark murmur3/xxhash64
vs DuckDB's), so the shared 32-bit hash is the first 8 hex chars of
md5 — available and identical everywhere. Plenty for min-hash /
sim-hash signatures.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Small multilingual stopword lists for the lang-id heuristic.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "ein", "nicht", "mit", "für", "auf"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "por", "con"],
    "fr": ["le", "la", "de", "et", "un", "est", "que", "pour", "dans", "avec"],
}

# BPE-ish pre-tokenizer: letter runs | digit runs | single non-space symbol.
BPE_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def norm_text(col: Column) -> Column:
    """Canonical form shared by fingerprinting and dedup: lowercase,
    whitespace collapsed to single spaces, trimmed."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def sql_norm_text(expr: str) -> str:
    return rf"trim(regexp_replace(lower({expr}), '\s+', ' ', 'g'))"


def tokens(col: Column) -> Column:
    """Whitespace tokens of the normalized text."""
    return F.split(norm_text(col), " ")


def sql_tokens(expr: str) -> str:
    return f"string_split({sql_norm_text(expr)}, ' ')"


def word_shingles(toks: Column, n: int = 3) -> Column:
    """Distinct word n-grams. Guarded: fewer than n tokens → empty
    array (Spark's sequence(1,0) would go DESCENDING, not empty)."""
    def make(i):
        return F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)])

    return F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(F.sequence(F.lit(1), F.size(toks) - (n - 1)), make)
        ),
    ).otherwise(F.array().cast("array<string>"))


def sql_word_shingles(toks_expr: str, n: int = 3) -> str:
    parts = ", ".join(f"{toks_expr}[i + {j}]" for j in range(n))
    return (
        f"CASE WHEN len({toks_expr}) >= {n} THEN "
        f"list_distinct(list_transform(generate_series(1, len({toks_expr}) - {n - 1}), "
        f"i -> concat_ws(' ', {parts}))) "
        f"ELSE CAST([] AS VARCHAR[]) END"
    )


def hash32(col: Column, seed: str = "") -> Column:
    """Deterministic 32-bit hash shared with DuckDB: first 8 hex chars
    of md5(value || '|' || seed) as a bigint."""
    src = F.concat(col, F.lit(f"|{seed}")) if seed else col
    return F.conv(F.substring(F.md5(src), 1, 8), 16, 10).cast("bigint")


def sql_hash32(expr: str, seed: str = "") -> str:
    src = f"concat({expr}, '|{seed}')" if seed else expr
    return f"CAST(concat('0x', substr(md5({src}), 1, 8)) AS BIGINT)"

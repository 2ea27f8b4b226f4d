"""North-star LLM-data-pipeline queries (BASELINE.json): dedup (exact,
MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine), similarity
search (brute-force + SRP-LSH), text analysis (quality stats, lang-ID,
fingerprinting).

Each query plants known duplicates/near-duplicates inside the plan
(documents ∪ deterministic corrupted variants) so the dedup operators
have real positives to find, and the DuckDB oracle reconstructs the
identical input — no fixtures, no RNG.

All oracle SQL is generated from the same parameters as the Spark
plans; hashing is the shared md5-derived 32-bit hash so signatures
are exact-integer-equal across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.text import (
    BPE_PATTERN,
    STOPWORDS,
    hash32,
    norm_text,
    sql_hash32,
    sql_norm_text,
    sql_tokens,
    sql_word_shingles,
    tokens,
)
from ..io.readers import ensure_parallelism, load_table
from ..operators import dedup as D
from ..operators import similarity as S
from ..operators import text_analysis as TA
from .registry import register

# ---------------------------------------------------------------------------
# Shared input builders: documents with planted duplicates.
# ---------------------------------------------------------------------------

_NEARDUP_OFFSET = 10_000_000
_EXACT_OFFSET = 20_000_000


def _docs_with_neardups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ corrupted variants (first 80% of tokens, doc_id%5==0,
    id offset +10M) — deterministic near-duplicates."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tk = tokens(F.col("text"))
    keep_n = F.greatest(F.lit(3), F.floor(F.size(tk) * 0.8).cast("int"))
    corrupted = docs.where(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + _NEARDUP_OFFSET).alias("doc_id"),
        F.array_join(F.slice(tk, F.lit(1), keep_n), " ").alias("text"),
    )
    return docs.unionByName(corrupted)


_SQL_NEARDUP_BASE = f"""
tokd AS (
    SELECT doc_id, {sql_tokens('text')} AS toks FROM documents
),
base AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + {_NEARDUP_OFFSET} AS doc_id,
           array_to_string(
               list_slice(toks, 1,
                   greatest(3, CAST(floor(len(toks) * CAST(0.8 AS DOUBLE)) AS INT))),
               ' ') AS text
    FROM tokd WHERE doc_id % 5 = 0
)
"""


def _docs_with_exact_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ verbatim copies (doc_id%3==0, id offset +20M)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    copies = docs.where(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + _EXACT_OFFSET).alias("doc_id"), "text"
    )
    return docs.unionByName(copies)


_SQL_EXACT_BASE = f"""
base AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + {_EXACT_OFFSET} AS doc_id, text
    FROM documents WHERE doc_id % 3 = 0
)
"""


# ---------------------------------------------------------------------------
# Exact dedup: hash-groupBy on normalized text.
# ---------------------------------------------------------------------------

_EXACT_DEDUP_ORACLE = f"""
WITH {_SQL_EXACT_BASE}
SELECT md5({sql_norm_text('text')}) AS text_hash,
       min(doc_id) AS kept_id,
       count(*) AS n_copies
FROM base
GROUP BY 1
"""


@register(
    "dedup_exact",
    _EXACT_DEDUP_ORACLE,
    doc="exact dedup via md5-hash groupBy; planted verbatim copies (north star)",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _docs_with_exact_dups(spark, sf_dir)
    return D.exact_dedup(base, "doc_id", "text")


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup (the hero dedup pipeline).
# ---------------------------------------------------------------------------

_NUM_HASHES, _BANDS, _NGRAM, _JT = 12, 4, 3, 0.6
_ROWS = _NUM_HASHES // _BANDS


def _sql_minhash_oracle() -> str:
    from ..operators.dedup import MINHASH_A, MINHASH_B, MINHASH_P

    mins = ",\n           ".join(
        f"list_aggregate(list_transform(hh, h -> (h * {MINHASH_A[i]} + {MINHASH_B[i]}) % {MINHASH_P}), 'min') AS m{i}"
        for i in range(_NUM_HASHES)
    )
    band_rows = "\n    UNION ALL\n".join(
        f"    SELECT doc_id, {b} AS band, "
        + " + ".join(f"m{b * _ROWS + r}" for r in range(_ROWS))
        + " AS band_sig FROM signed"
        for b in range(_BANDS)
    )
    return f"""
WITH {_SQL_NEARDUP_BASE},
shingled AS (
    SELECT doc_id, {sql_word_shingles('toks', _NGRAM)} AS sh
    FROM (SELECT doc_id, {sql_tokens('text')} AS toks FROM base) t
),
hashed AS (
    SELECT doc_id, sh, list_transform(sh, s -> {sql_hash32('s')}) AS hh
    FROM shingled WHERE len(sh) > 0
),
signed AS (
    SELECT doc_id, sh,
           {mins}
    FROM hashed
),
bands AS (
{band_rows}
),
cand AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b,
       CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
           / CAST(len(list_distinct(list_concat(sa.sh, sb.sh))) AS DOUBLE) AS jaccard
FROM cand c
JOIN shingled sa ON sa.doc_id = c.doc_a
JOIN shingled sb ON sb.doc_id = c.doc_b
WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
          / CAST(len(list_distinct(list_concat(sa.sh, sb.sh))) AS DOUBLE) >= {_JT}
"""


@register(
    "dedup_minhash_lsh",
    _sql_minhash_oracle(),
    doc="MinHash+LSH near-dup: map-side signatures, banded buckets, Jaccard verify (north star)",
)
def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _docs_with_neardups(spark, sf_dir)
    return D.minhash_lsh_dedup(
        base, "doc_id", "text",
        ngram=_NGRAM, num_hashes=_NUM_HASHES, bands=_BANDS, threshold=_JT,
    )


# ---------------------------------------------------------------------------
# SimHash near-dup: 32-bit signature, 8-bit chunk candidates,
# Hamming ≤ 3 verify.
# ---------------------------------------------------------------------------

_SIM_BITS, _SIM_CHUNKS, _MAX_HAMMING = 32, 4, 3


def _sql_simhash_oracle() -> str:
    votes = ",\n           ".join(
        f"sum(CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS v{j}"
        for j in range(_SIM_BITS)
    )
    simhash = " + ".join(
        f"(CASE WHEN v{j} > 0 THEN CAST({1 << j} AS BIGINT) ELSE 0 END)"
        for j in range(_SIM_BITS)
    )
    width = _SIM_BITS // _SIM_CHUNKS
    mask = (1 << width) - 1
    chunk_rows = "\n    UNION ALL\n".join(
        f"    SELECT doc_id, simhash, {c} AS chunk, (simhash >> {c * width}) & {mask} AS val FROM sig"
        for c in range(_SIM_CHUNKS)
    )
    return f"""
WITH {_SQL_NEARDUP_BASE},
tok_exploded AS (
    SELECT doc_id, unnest({sql_tokens('text')}) AS tok FROM base
),
hashes AS (
    SELECT doc_id, {sql_hash32('tok')} AS h FROM tok_exploded
),
votes AS (
    SELECT doc_id,
           {votes}
    FROM hashes GROUP BY doc_id
),
sig AS (
    SELECT doc_id, {simhash} AS simhash FROM votes
),
chunks AS (
{chunk_rows}
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM chunks a JOIN chunks b
  ON a.chunk = b.chunk AND a.val = b.val AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {_MAX_HAMMING}
"""


@register(
    "dedup_simhash",
    _sql_simhash_oracle(),
    doc="SimHash near-dup: 32-bit signature + chunk-banded Hamming pairs (north star)",
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _docs_with_neardups(spark, sf_dir)
    signed = D.simhash_signature(base, "doc_id", "text", bits=_SIM_BITS)
    return D.simhash_neardup_pairs(
        signed, max_hamming=_MAX_HAMMING, chunks=_SIM_CHUNKS, bits=_SIM_BITS
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard: exact inverted-index baseline with max-df cap.
# ---------------------------------------------------------------------------

_NJ_THRESHOLD, _NJ_MAXDF = 0.5, 50

_NGRAM_JACCARD_ORACLE = f"""
WITH {_SQL_NEARDUP_BASE},
shingled AS (
    SELECT doc_id, {sql_word_shingles('toks', _NGRAM)} AS sh
    FROM (SELECT doc_id, {sql_tokens('text')} AS toks FROM base) t
),
sizes AS (SELECT doc_id, len(sh) AS n_sh FROM shingled),
exploded AS (SELECT doc_id, unnest(sh) AS shingle FROM shingled),
rare AS (
    SELECT shingle FROM exploded GROUP BY shingle HAVING count(*) <= {_NJ_MAXDF}
),
filtered AS (SELECT e.doc_id, e.shingle FROM exploded e JOIN rare r USING (shingle)),
shared AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
    FROM filtered a JOIN filtered b
      ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT s.doc_a, s.doc_b,
       CAST(s.shared AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - s.shared AS DOUBLE) AS jaccard
FROM shared s
JOIN sizes sa ON sa.doc_id = s.doc_a
JOIN sizes sb ON sb.doc_id = s.doc_b
WHERE CAST(s.shared AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - s.shared AS DOUBLE) >= {_NJ_THRESHOLD}
"""


@register(
    "dedup_ngram_jaccard",
    _NGRAM_JACCARD_ORACLE,
    doc="exact n-gram Jaccard near-dup via capped inverted index (north star)",
)
def q_dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _docs_with_neardups(spark, sf_dir)
    return D.ngram_jaccard_pairs(
        base, "doc_id", "text",
        ngram=_NGRAM, threshold=_NJ_THRESHOLD, max_df=_NJ_MAXDF,
    )


# ---------------------------------------------------------------------------
# Similarity search: brute-force cosine top-k (baseline).
# ---------------------------------------------------------------------------

_SQL_DOT = (
    "list_sum(list_transform(generate_series(1, len({a})), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)


def _sql_cosine(a: str, b: str) -> str:
    return (
        f"({_SQL_DOT.format(a=a, b=b)} / "
        f"(sqrt({_SQL_DOT.format(a=a, b=a)}) * sqrt({_SQL_DOT.format(a=b, b=b)})))"
    )


_BRUTE_TOPK_ORACLE = f"""
WITH q AS (
    SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id % 100 = 0
),
c AS (SELECT vec_id, embedding AS ce FROM embeddings),
scored AS (
    SELECT q.query_id, c.vec_id AS neighbor_id,
           {_sql_cosine('qe', 'ce')} AS cosine
    FROM q CROSS JOIN c
    WHERE q.query_id <> c.vec_id
),
ranked AS (
    SELECT query_id, neighbor_id, cosine,
           row_number() OVER (
               PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
    FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, cosine
FROM ranked WHERE rank <= 10
"""


@register(
    "similarity_bruteforce_topk",
    _BRUTE_TOPK_ORACLE,
    doc="exact cosine top-10 per query vector, broadcast x corpus (north star)",
)
def q_sim_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return S.brute_force_topk(queries, emb, k=10)


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup with SRP-LSH bucketing — the scale path.
# Planted exact vector copies guarantee positives.
# ---------------------------------------------------------------------------

# Banded SRP layout (round-2 verdict item 2): _BANDS independent hash
# tables of _PLANES sign bits each; band b uses global planes
# [b*_PLANES, (b+1)*_PLANES). The oracle reproduces every band
# signature from the same md5-derived hyperplane literals, and a pair
# is a candidate when ANY band matches — OR-join in SQL (fine for
# DuckDB at oracle scale), exploded (band, sig) equi-join in Spark
# (the scale shape). At 100 TB _PLANES comes from
# operators/similarity.srp_params_for(corpus size); here it is pinned
# so the oracle text is static.
_PLANES = 8
_BANDS = 4
_VEC_OFFSET = 1_000_000


def _sql_proj(p: int, vec: str) -> str:
    from ..operators.similarity import hyperplane_weights

    lit = "[" + ", ".join(repr(w) for w in hyperplane_weights(p, 64)) + "]"
    return (
        f"list_sum(list_transform(generate_series(1, len({vec})), "
        f"i -> CAST({vec}[i] AS DOUBLE) * ({lit})[i]))"
    )


def _sql_srp_sig(vec: str, band: int = 0) -> str:
    return " + ".join(
        f"(CASE WHEN {_sql_proj(band * _PLANES + i, vec)} > 0 "
        f"THEN CAST({1 << i} AS BIGINT) ELSE 0 END)"
        for i in range(_PLANES)
    )


def _sql_band_cols(vec: str) -> str:
    return ", ".join(
        f"{_sql_srp_sig(vec, b)} AS s{b}" for b in range(_BANDS)
    )


def _sql_any_band(a: str, b: str) -> str:
    return " OR ".join(f"{a}.s{i} = {b}.s{i}" for i in range(_BANDS))


_COSINE_NEARDUP_ORACLE = f"""
WITH base AS (
    SELECT vec_id, embedding FROM embeddings
    UNION ALL
    SELECT vec_id + {_VEC_OFFSET} AS vec_id, embedding
    FROM embeddings WHERE vec_id % 10 = 0
),
sig AS (
    SELECT vec_id, embedding, {_sql_band_cols('embedding')} FROM base
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       {_sql_cosine('a.embedding', 'b.embedding')} AS cosine
FROM sig a JOIN sig b ON ({_sql_any_band('a', 'b')}) AND a.vec_id < b.vec_id
WHERE {_sql_cosine('a.embedding', 'b.embedding')} >= 0.999
"""


@register(
    "dedup_embedding_cosine",
    _COSINE_NEARDUP_ORACLE,
    doc="embedding near-dup: SRP-LSH buckets + cosine>=0.999 verify (north star)",
)
def q_cosine_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    copies = emb.where(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + _VEC_OFFSET).alias("vec_id"), "embedding"
    )
    base = emb.select("vec_id", "embedding").unionByName(copies)
    return S.cosine_neardup_pairs(
        base, threshold=0.999, planes=_PLANES, bands=_BANDS
    )


# ---------------------------------------------------------------------------
# Similarity search, scale path: SRP-LSH bucketed top-k. Candidates are
# restricted to the query's signature bucket (cost ∝ collisions, not
# corpus size); exact cosine rank within the bucket. The oracle
# reproduces the md5-derived hyperplanes as SQL literals, so this
# APPROXIMATE operator still gets an exact oracle.
# ---------------------------------------------------------------------------

_LSH_TOPK_ORACLE = f"""
WITH q AS (
    SELECT vec_id AS query_id, embedding AS qe, {_sql_band_cols('embedding')}
    FROM embeddings WHERE vec_id % 100 = 0
),
c AS (
    SELECT vec_id, embedding AS ce, {_sql_band_cols('embedding')}
    FROM embeddings
),
scored AS (
    SELECT q.query_id, c.vec_id AS neighbor_id,
           {_sql_cosine('qe', 'ce')} AS cosine
    FROM q JOIN c ON ({_sql_any_band('q', 'c')})
    WHERE q.query_id <> c.vec_id
),
ranked AS (
    SELECT query_id, neighbor_id, cosine,
           row_number() OVER (
               PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
    FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, cosine
FROM ranked WHERE rank <= 10
"""


@register(
    "similarity_lsh_topk",
    _LSH_TOPK_ORACLE,
    doc="approximate cosine top-10 via SRP-LSH buckets — the 100 TB ANN path "
    "(north star)",
)
def q_sim_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return S.lsh_topk(queries, emb, k=10, planes=_PLANES, bands=_BANDS)


# ---------------------------------------------------------------------------
# Text quality stats — one map-side pass.
# ---------------------------------------------------------------------------


def _sql_text_stats() -> str:
    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    return f"""
WITH normed AS (
    SELECT doc_id, {sql_norm_text('text')} AS t FROM documents
),
tokd AS (
    SELECT doc_id, t, string_split(t, ' ') AS toks,
           length(t) AS n_chars_norm,
           length(regexp_replace(t, '[a-z0-9\\s]', '', 'g')) AS punct_count
    FROM normed
),
stats AS (
    SELECT doc_id,
           n_chars_norm,
           len(toks) AS n_tokens,
           len(regexp_extract_all(t, '{BPE_PATTERN}')) AS n_bpe_tokens,
           len(list_distinct(toks)) AS n_distinct,
           len(list_filter(toks, x -> x IN ({stop_list}))) AS stop_hits,
           punct_count
    FROM tokd
)
SELECT doc_id,
       CAST(n_chars_norm AS BIGINT) AS n_chars_norm,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_bpe_tokens AS BIGINT) AS n_bpe_tokens,
       CAST(n_chars_norm - (n_tokens - 1) AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS avg_token_len,
       CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS type_token_ratio,
       CAST(stop_hits AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS stopword_ratio,
       CAST(punct_count AS BIGINT) AS punct_count,
       least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0)
           * (CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE))
           * (1.0 - least(CAST(punct_count AS DOUBLE) / 50.0, 1.0)) AS quality_score
FROM stats
"""


@register(
    "text_quality_stats",
    _sql_text_stats(),
    doc="per-doc quality metrics: tokens/BPE/TTR/stopword/punct/score (north star)",
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return TA.with_text_stats(docs, "text").select(
        "doc_id",
        "n_chars_norm",
        "n_tokens",
        "n_bpe_tokens",
        "avg_token_len",
        "type_token_ratio",
        "stopword_ratio",
        "punct_count",
        "quality_score",
    )


# ---------------------------------------------------------------------------
# Language-ID heuristic → confusion matrix vs the labeled lang column.
# ---------------------------------------------------------------------------


def _sql_lang_id() -> str:
    hit_cols = ",\n           ".join(
        f"len(list_filter(toks, x -> x IN ({', '.join(chr(39) + w + chr(39) for w in words)}))) AS hits_{lang}"
        for lang, words in STOPWORDS.items()
    )
    langs = sorted(STOPWORDS)
    best = f"greatest({', '.join('hits_' + L for L in langs)})"
    case = " ".join(
        f"WHEN hits_{L} > 0 AND hits_{L} = {best} THEN '{L}'" for L in langs
    )
    return f"""
WITH tokd AS (
    SELECT doc_id, lang, {sql_tokens('text')} AS toks FROM documents
),
hits AS (
    SELECT doc_id, lang,
           {hit_cols}
    FROM tokd
)
SELECT lang AS labeled_lang,
       CASE {case} ELSE 'und' END AS lang_guess,
       count(*) AS n
FROM hits
GROUP BY 1, 2
"""


@register(
    "text_lang_id",
    _sql_lang_id(),
    doc="stopword-family language heuristic, confusion vs labels (north star)",
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tokd = docs.select(
        F.col("lang").alias("labeled_lang"), tokens(F.col("text")).alias("__toks__")
    )
    return (
        tokd.select(
            "labeled_lang",
            TA.lang_id_from_tokens(F.col("__toks__")).alias("lang_guess"),
        )
        .groupBy("labeled_lang", "lang_guess")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# Document fingerprinting: full + prefix md5 over normalized text;
# collision groups on the exact-dup corpus.
# ---------------------------------------------------------------------------

_FINGERPRINT_ORACLE = f"""
WITH {_SQL_EXACT_BASE}
SELECT md5({sql_norm_text('text')}) AS fingerprint,
       md5(substr({sql_norm_text('text')}, 1, 64)) AS prefix_fingerprint,
       count(*) AS n_docs,
       min(doc_id) AS first_doc
FROM base
GROUP BY 1, 2
"""


@register(
    "doc_fingerprint",
    _FINGERPRINT_ORACLE,
    doc="content fingerprint (full + 64-char prefix) collision groups (north star)",
)
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _docs_with_exact_dups(spark, sf_dir)
    return (
        base.select(
            "doc_id",
            TA.fingerprint(F.col("text")).alias("fingerprint"),
            TA.prefix_fingerprint(F.col("text"), 64).alias("prefix_fingerprint"),
        )
        .groupBy("fingerprint", "prefix_fingerprint")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
        )
    )


# ---------------------------------------------------------------------------
# IVF-style top-k: coarse quantizer = the label column; probe scans
# only the query's cell. At scale the corpus is partitioned by label
# on disk → partition-pruned probes.
# ---------------------------------------------------------------------------

_IVF_TOPK_ORACLE = f"""
WITH q AS (
    SELECT vec_id AS query_id, embedding AS qe, label
    FROM embeddings WHERE vec_id % 100 = 0
),
c AS (SELECT vec_id, embedding AS ce, label FROM embeddings),
scored AS (
    SELECT q.query_id, c.vec_id AS neighbor_id,
           {_sql_cosine('qe', 'ce')} AS cosine
    FROM q JOIN c ON q.label = c.label
    WHERE q.query_id <> c.vec_id
),
ranked AS (
    SELECT query_id, neighbor_id, cosine,
           row_number() OVER (
               PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
    FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, cosine
FROM ranked WHERE rank <= 10
"""


@register(
    "similarity_ivf_topk",
    _IVF_TOPK_ORACLE,
    doc="IVF-style ANN: label column as coarse quantizer, partition-prunable "
    "probe (north star)",
)
def q_sim_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding", "label"
    )
    return S.ivf_topk(queries, emb, k=10)


# nprobe>1 recall knob (round-3 verdict item 7): rank cells by cosine
# affinity to integer-quantized centroid DIRECTIONS (floor(x·2^20)
# elementwise sums — exact power-of-two quantize + exact BIGINT sums,
# so the centroid is bit-reproducible in DuckDB; cosine's scale
# invariance makes sum ≡ mean for ranking), probe the top-2 cells per
# query. An approximate operator with an exact oracle, like the SRP
# path above.
_IVF_NPROBE = 2

_IVF_NPROBE_ORACLE = f"""
WITH q AS (
    SELECT vec_id AS query_id, embedding AS qe
    FROM embeddings WHERE vec_id % 100 = 0
),
cent AS (
    SELECT label, list(CAST(s AS DOUBLE) ORDER BY pos) AS cvec
    FROM (
        SELECT label, g.i AS pos,
               CAST(sum(CAST(floor(CAST(embedding[g.i] AS DOUBLE)
                                   * 1048576.0) AS BIGINT)) AS BIGINT) AS s
        FROM embeddings, generate_series(1, 64) AS g(i)
        GROUP BY label, g.i
    )
    GROUP BY label
),
affinity AS (
    SELECT q.query_id, cent.label,
           {_sql_cosine('qe', 'cvec')} AS aff
    FROM q CROSS JOIN cent
),
probed AS (
    SELECT query_id, label FROM (
        SELECT query_id, label,
               row_number() OVER (
                   PARTITION BY query_id ORDER BY aff DESC, label) AS rn
        FROM affinity
    ) WHERE rn <= {_IVF_NPROBE}
),
scored AS (
    SELECT q.query_id, c.vec_id AS neighbor_id,
           {_sql_cosine('qe', 'c.embedding')} AS cosine
    FROM q
    JOIN probed p ON q.query_id = p.query_id
    JOIN embeddings c ON c.label = p.label
    WHERE q.query_id <> c.vec_id
),
ranked AS (
    SELECT query_id, neighbor_id, cosine,
           row_number() OVER (
               PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
    FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, cosine
FROM ranked WHERE rank <= 10
"""


@register(
    "similarity_ivf_topk_nprobe2",
    _IVF_NPROBE_ORACLE,
    doc="IVF ANN with nprobe=2: top-2 cells by centroid-direction cosine "
    "affinity per query — the recall/cost dial (north star, round-3 "
    "verdict item 7)",
)
def q_sim_ivf_nprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return S.ivf_topk_nprobe(queries, emb, k=10, nprobe=_IVF_NPROBE)


# Iterative algorithm class (driver contract: non-SQL-expressible →
# rows-only check): Lloyd's k-means over the embedding column. Each
# iteration's input is the previous iteration's global state, which no
# single SQL statement expresses; invariants (inertia monotone,
# assignment self-consistency, determinism) are asserted in
# tests/test_clustering.py instead.
@register(
    "kmeans_embedding_clusters",
    None,
    doc="Lloyd's k-means (k=8, 3 iters, deterministic init/ties) over "
    "embeddings — the iterative-algorithm class; map-side assign + "
    "skinny-agg update (north star; invariants in tests/test_clustering.py)",
)
def q_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.clustering import kmeans_lloyd

    emb = load_table(spark, sf_dir, "embeddings")
    return kmeans_lloyd(emb, id_col="vec_id", k=8, iters=3)


# ---------------------------------------------------------------------------
# Corpus curation capstone: the full training-data pipeline in ONE
# lazy plan — quality scoring + language ID (both map-side) → policy
# filter → exact dedup (hash-groupBy on the md5 fingerprint). The
# only shuffle in the whole pipeline is the final dedup groupBy; at
# 100 TB everything before it is embarrassingly parallel and the
# shuffle key is a 32-char hash, never the document text. Duplicate
# groups share a normalized text, so every derived stat is identical
# within a group — min() picks deterministic representatives.
# ---------------------------------------------------------------------------


def _sql_corpus_curation() -> str:
    stop_en = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    hit_cols = ",\n           ".join(
        f"len(list_filter(toks, x -> x IN ({', '.join(chr(39) + w + chr(39) for w in words)}))) AS hits_{lang}"
        for lang, words in STOPWORDS.items()
    )
    langs = sorted(STOPWORDS)
    best = f"greatest({', '.join('hits_' + L for L in langs)})"
    case = " ".join(
        f"WHEN hits_{L} > 0 AND hits_{L} = {best} THEN '{L}'" for L in langs
    )
    return f"""
WITH normed AS (
    SELECT doc_id, {sql_norm_text('text')} AS t FROM documents
),
tokd AS (
    SELECT doc_id, t, string_split(t, ' ') AS toks,
           length(t) AS n_chars_norm,
           length(regexp_replace(t, '[a-z0-9\\s]', '', 'g')) AS punct_count
    FROM normed
),
scored AS (
    SELECT doc_id, t,
           len(toks) AS n_tokens,
           least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0)
             * (CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE))
             * (1.0 - least(CAST(punct_count AS DOUBLE) / 50.0, 1.0)) AS quality_score,
           len(list_filter(toks, x -> x IN ({stop_en}))) AS stop_en_hits,
           {hit_cols}
    FROM tokd
),
kept AS (
    SELECT doc_id, t, n_tokens, quality_score,
           CASE {case} ELSE 'und' END AS lang_guess
    FROM scored
    WHERE n_tokens >= 10 AND quality_score > 0.1
)
SELECT md5(t) AS fingerprint,
       min(doc_id) AS kept_id,
       count(*) AS n_copies,
       min(lang_guess) AS lang_guess,
       min(n_tokens) AS n_tokens,
       min(quality_score) AS quality_score
FROM kept
GROUP BY md5(t)
"""


@register(
    "corpus_curation_pipeline",
    _sql_corpus_curation(),
    doc="end-to-end training-data curation: quality score + lang-ID "
    "(map-side) -> policy filter -> exact dedup; ONE shuffle total, "
    "keyed on the md5 fingerprint (north star capstone)",
)
def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    scored = TA.with_text_stats(docs, "text")
    with_lang = scored.withColumn("lang_guess", TA.lang_id(F.col("text")))
    kept = with_lang.where(
        (F.col("n_tokens") >= 10) & (F.col("quality_score") > 0.1)
    )
    return (
        kept.select(
            F.md5(norm_text(F.col("text"))).alias("fingerprint"),
            "doc_id",
            "lang_guess",
            "n_tokens",
            "quality_score",
        )
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("kept_id"),
            F.count(F.lit(1)).alias("n_copies"),
            F.min("lang_guess").alias("lang_guess"),
            F.min("n_tokens").alias("n_tokens"),
            F.min("quality_score").alias("quality_score"),
        )
    )


# ---------------------------------------------------------------------------
# Approximate set-similarity JOIN (cross-corpus): corrupted probe docs
# (70% token prefixes of doc_id%7 originals, id +30M) matched back
# against the full corpus via LSH bucket intersection + exact-Jaccard
# verify. The "dedup the new crawl against the training corpus" op —
# candidates cost bucket collisions, never |Q|x|C|.
# ---------------------------------------------------------------------------

_SIMJOIN_OFFSET = 30_000_000
_SJ_THRESHOLD = 0.5


def _sql_simjoin_oracle() -> str:
    from ..operators.dedup import MINHASH_A, MINHASH_B, MINHASH_P

    mins = ",\n           ".join(
        f"list_aggregate(list_transform(hh, h -> (h * {MINHASH_A[i]} + {MINHASH_B[i]}) % {MINHASH_P}), 'min') AS m{i}"
        for i in range(_NUM_HASHES)
    )

    def band_rows(src: str) -> str:
        return "\n    UNION ALL\n".join(
            f"    SELECT doc_id, {b} AS band, "
            + " + ".join(f"m{b * _ROWS + r}" for r in range(_ROWS))
            + f" AS band_sig FROM {src}"
            for b in range(_BANDS)
        )

    shingle_sign = """
{name}_shingled AS (
    SELECT doc_id, {sh} AS sh
    FROM (SELECT doc_id, {toks} AS toks FROM {base}) t
),
{name}_signed AS (
    SELECT doc_id, sh, {mins}
    FROM (SELECT doc_id, sh, list_transform(sh, s -> {h32}) AS hh
          FROM {name}_shingled WHERE len(sh) > 0) x
)"""

    def block(name: str, base: str) -> str:
        return shingle_sign.format(
            name=name,
            base=base,
            sh=sql_word_shingles("toks", _NGRAM),
            toks=sql_tokens("text"),
            mins=mins,
            h32=sql_hash32("s"),
        )

    return f"""
WITH qtok AS (
    SELECT doc_id, {sql_tokens('text')} AS toks FROM documents
    WHERE doc_id % 7 = 0
),
qbase AS (
    -- CAST the fraction to DOUBLE: DuckDB parses 0.7 as DECIMAL
    -- (exact, 90*0.7 = 63) while Spark multiplies doubles
    -- (62.999... -> floor 62); the cast pins IEEE semantics on
    -- both engines.
    SELECT doc_id + {_SIMJOIN_OFFSET} AS doc_id,
           array_to_string(
               list_slice(toks, 1,
                   greatest(3, CAST(floor(len(toks) * CAST(0.7 AS DOUBLE)) AS INT))),
               ' ') AS text
    FROM qtok
),
cbase AS (SELECT doc_id, text FROM documents),
{block('q', 'qbase')},
{block('c', 'cbase')},
qbands AS (
{band_rows('q_signed')}
),
cbands AS (
{band_rows('c_signed')}
),
cand AS (
    SELECT DISTINCT q.doc_id AS query_id, c.doc_id AS corpus_id
    FROM qbands q JOIN cbands c
      ON q.band = c.band AND q.band_sig = c.band_sig
)
SELECT cd.query_id, cd.corpus_id,
       CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
           / CAST(len(list_distinct(list_concat(sa.sh, sb.sh))) AS DOUBLE) AS jaccard
FROM cand cd
JOIN q_shingled sa ON sa.doc_id = cd.query_id
JOIN c_shingled sb ON sb.doc_id = cd.corpus_id
WHERE CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
          / CAST(len(list_distinct(list_concat(sa.sh, sb.sh))) AS DOUBLE) >= {_SJ_THRESHOLD}
"""


@register(
    "similarity_join_corpus",
    _sql_simjoin_oracle(),
    doc="approximate set-similarity JOIN: corrupted probes vs full corpus "
    "via LSH bucket intersection + Jaccard verify (north star — dedup "
    "the new crawl against the training corpus)",
)
def q_similarity_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tk = tokens(F.col("text"))
    keep_n = F.greatest(F.lit(3), F.floor(F.size(tk) * 0.7).cast("int"))
    probes = docs.where(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + _SIMJOIN_OFFSET).alias("doc_id"),
        F.array_join(F.slice(tk, F.lit(1), keep_n), " ").alias("text"),
    )
    return D.minhash_similarity_join(
        probes, docs, "doc_id", "text",
        ngram=_NGRAM, num_hashes=_NUM_HASHES, bands=_BANDS,
        threshold=_SJ_THRESHOLD,
    )


# ---------------------------------------------------------------------------
# Corpus balancing: deterministic stratified subsample — per-language
# quotas filled in md5(doc_id) order. The training-data staple
# ("cap English at N docs, keep all low-resource languages") done so
# the sample is REPRODUCIBLE: hash order is a stable shuffle-free
# shuffle, unlike sampleBy's RNG, so reruns and engines agree exactly.
# At 100 TB this is one window over the lang partition — the same
# exchange a groupBy(lang) would pay, no extra pass.
# ---------------------------------------------------------------------------

_BALANCED_QUOTA = 60

_BALANCED_SAMPLE_ORACLE = f"""
SELECT doc_id, lang
FROM (
    SELECT doc_id, lang,
           row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
           ) AS rn
    FROM documents
) t
WHERE rn <= {_BALANCED_QUOTA}
"""


@register(
    "corpus_balanced_sample",
    _BALANCED_SAMPLE_ORACLE,
    doc="deterministic stratified subsample: per-language quota filled in "
    "md5(doc_id) order — reproducible corpus balancing, one window over "
    "the lang partition (north star)",
)
def q_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _BALANCED_QUOTA)
        .select("doc_id", "lang")
    )


# ---------------------------------------------------------------------------
# Dataset mixing: per-language keep-rates applied as a deterministic
# hash-threshold Bernoulli ("cap the dominant language at 25%, keep
# low-resource languages whole"). Same reproducibility argument as
# the balanced sample — pmod(hash32(doc), 1000) < rate‰ survives
# reruns, engine swaps, and partial re-ingests, unlike rand()-based
# sampling. Map-side only: a filter, no shuffle at any scale.
# ---------------------------------------------------------------------------

_MIX_RATES = {"en": 250, "de": 600, "fr": 600, "es": 800, "zh": 1000}

_MIX_ORACLE = f"""
SELECT doc_id, lang, source
FROM documents
WHERE {sql_hash32("CAST(doc_id AS VARCHAR)", seed="mix")} % 1000 <
      CASE lang {' '.join(f"WHEN '{k}' THEN {v}" for k, v in _MIX_RATES.items())}
      ELSE 1000 END
"""


@register(
    "corpus_mix_sample",
    _MIX_ORACLE,
    doc="dataset-mixing weights as a deterministic hash-threshold "
    "Bernoulli per language; map-side filter, reproducible across "
    "reruns/engines (north star)",
)
def q_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    rate = F.lit(1000)
    for k, v in _MIX_RATES.items():
        rate = F.when(F.col("lang") == k, F.lit(v)).otherwise(rate)
    keep = (
        F.pmod(hash32(F.col("doc_id").cast("string"), seed="mix"), F.lit(1000))
        < rate
    )
    return docs.where(keep).select("doc_id", "lang", "source")


# ---------------------------------------------------------------------------
# Prefix-filtered EXACT Jaccard join (AllPairs/PPJoin): the engineered
# exact path that retires the quadratic baseline. The oracle is the
# straight uncapped ground truth (full inverted-index join) — the
# prefix filter must reproduce it exactly or the hash fails, which is
# precisely the property that makes the filter safe to deploy.
# ---------------------------------------------------------------------------

_PJ_THRESHOLD = 0.5

_PREFIX_JACCARD_ORACLE = f"""
WITH {_SQL_NEARDUP_BASE},
shingled AS (
    SELECT doc_id, {sql_word_shingles('toks', _NGRAM)} AS sh
    FROM (SELECT doc_id, {sql_tokens('text')} AS toks FROM base) t
),
sized AS (SELECT doc_id, sh, len(sh) AS n_sh FROM shingled WHERE len(sh) > 0),
exploded AS (SELECT doc_id, unnest(sh) AS shingle FROM sized),
shared AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
    FROM exploded a JOIN exploded b
      ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)
SELECT s.doc_a, s.doc_b,
       CAST(s.shared AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - s.shared AS DOUBLE) AS jaccard
FROM shared s
JOIN sized sa ON sa.doc_id = s.doc_a
JOIN sized sb ON sb.doc_id = s.doc_b
WHERE CAST(s.shared AS DOUBLE) / CAST(sa.n_sh + sb.n_sh - s.shared AS DOUBLE)
      >= {_PJ_THRESHOLD}
"""


@register(
    "dedup_prefix_jaccard",
    _PREFIX_JACCARD_ORACLE,
    doc="EXACT Jaccard near-dup join via AllPairs/PPJoin prefix filtering "
    "(rarest-first canonical order, index only |d|-ceil(t|d|)+1 shingles); "
    "oracle is the uncapped all-pairs ground truth, so the filter's "
    "exactness is hash-checked (north star)",
)
def q_dedup_prefix_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ensure_parallelism: the shingle+index build is the CPU stage and
    # the test corpus is a single-row-group file (no-op at real scale).
    base = ensure_parallelism(_docs_with_neardups(spark, sf_dir))
    return D.prefix_jaccard_pairs(
        base, "doc_id", "text", ngram=_NGRAM, threshold=_PJ_THRESHOLD
    )


# ---------------------------------------------------------------------------
# PII redaction: regex scrubbing of emails / phone-shaped tokens —
# the privacy pass every training corpus runs before the tokenizer.
# Pure Catalyst (regexp_count/regexp_replace, no UDF), patterns chosen
# to behave identically under Java regex (Spark) and RE2 (DuckDB):
# character classes and bounded quantifiers only, no lookarounds.
# Positives are PLANTED deterministically in-plan (docs %4==0 get an
# email, %6==0 a phone), mirroring the dedup fixtures' pattern, and
# the redacted text is compared by md5 so the oracle checks the FULL
# transform, not just the counts.
# ---------------------------------------------------------------------------

_EMAIL_RE = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
_PHONE_RE = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

_REDACT_ORACLE = f"""
WITH planted AS (
    SELECT doc_id,
           text
           || CASE WHEN doc_id % 4 = 0
                   THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                   ELSE '' END
           || CASE WHEN doc_id % 6 = 0
                   THEN ' call ' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-555-0199'
                   ELSE '' END AS text
    FROM documents
),
redacted AS (
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all(text, '{_PHONE_RE}')) AS INT) AS n_phones,
           regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{_PHONE_RE}', '<PHONE>', 'g') AS clean
    FROM planted
)
SELECT doc_id, n_emails, n_phones, md5(clean) AS redacted_md5
FROM redacted
"""


@register(
    "corpus_pii_redaction",
    _REDACT_ORACLE,
    doc="PII scrub (emails, phone-shaped tokens) as pure Catalyst "
    "regexp_count/regexp_replace over planted positives; the oracle "
    "md5-compares the fully redacted text, so the whole transform is "
    "hash-checked (north star)",
)
def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    email = F.when(
        F.col("doc_id") % 4 == 0,
        F.concat(
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com"),
        ),
    ).otherwise(F.lit(""))
    phone = F.when(
        F.col("doc_id") % 6 == 0,
        F.concat(
            F.lit(" call "),
            F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
            F.lit("-555-0199"),
        ),
    ).otherwise(F.lit(""))
    planted = docs.select(
        "doc_id", F.concat("text", email, phone).alias("text")
    )
    clean = F.regexp_replace(
        F.regexp_replace(F.col("text"), _EMAIL_RE, "<EMAIL>"),
        _PHONE_RE,
        "<PHONE>",
    )
    return planted.select(
        "doc_id",
        F.regexp_count("text", F.lit(_EMAIL_RE)).cast("int").alias("n_emails"),
        F.regexp_count("text", F.lit(_PHONE_RE)).cast("int").alias("n_phones"),
        F.md5(clean).alias("redacted_md5"),
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination: flag training documents sharing any long
# n-gram with a held-out eval set — the pass that keeps test data out
# of the training corpus. Shape differs from the self-join dedups: the
# eval set is SMALL, so its n-gram index broadcasts and contamination
# detection is a broadcast semi-join on the training side's map-side
# shingles — no shuffle of the training corpus at any scale, cost is
# one scan. Eval set is derived deterministically in-plan (docs with
# doc_id % 50 == 0 play the benchmark).
# ---------------------------------------------------------------------------

_DECON_NGRAM = 8

_DECONTAMINATION_ORACLE = f"""
WITH eval_docs AS (
    SELECT doc_id, {sql_tokens('text')} AS toks FROM documents
    WHERE doc_id % 50 = 0
),
eval_grams AS (
    SELECT DISTINCT unnest({sql_word_shingles('toks', _DECON_NGRAM)}) AS gram
    FROM eval_docs
),
-- Planted contamination: every 9th training doc gets the first 12
-- tokens of one eval doc appended (guaranteed >= 5 shared 8-grams).
train_raw AS (
    SELECT t.doc_id,
           t.text || CASE WHEN t.doc_id % 9 = 0 AND e.doc_id IS NOT NULL
                          THEN ' ' || array_to_string(list_slice(e.toks, 1, 12), ' ')
                          ELSE '' END AS text
    FROM documents t
    LEFT JOIN eval_docs e ON e.doc_id = (t.doc_id % 10) * 50
    WHERE t.doc_id % 50 <> 0
),
train AS (
    SELECT doc_id, {sql_word_shingles('toks', _DECON_NGRAM)} AS grams
    FROM (SELECT doc_id, {sql_tokens('text')} AS toks FROM train_raw) t
),
flagged AS (
    SELECT tr.doc_id,
           CAST(count(*) AS BIGINT) AS n_shared_grams
    FROM (SELECT doc_id, unnest(grams) AS gram FROM train) tr
    JOIN eval_grams e ON tr.gram = e.gram
    GROUP BY tr.doc_id
)
SELECT doc_id, n_shared_grams FROM flagged
"""


@register(
    "corpus_decontamination",
    _DECONTAMINATION_ORACLE,
    doc="benchmark decontamination: training docs sharing any "
    f"{_DECON_NGRAM}-gram with the (broadcast-small) eval set, counted "
    "per doc — broadcast semi-join, zero training-corpus shuffle "
    "(north star)",
)
def q_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    eval_docs = docs.where(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("eval_id"), tokens(F.col("text")).alias("toks")
    )
    eval_grams = (
        D.with_shingles(
            docs.where(F.col("doc_id") % 50 == 0), "doc_id", "text", _DECON_NGRAM
        )
        .select(F.explode("shingles").alias("gram"))
        .distinct()
    )
    # Planted contamination mirroring the oracle's train_raw CTE.
    leak = F.when(
        (F.col("doc_id") % 9 == 0) & F.col("eval_id").isNotNull(),
        F.concat(F.lit(" "), F.array_join(F.slice("toks", 1, 12), " ")),
    ).otherwise(F.lit(""))
    train_raw = (
        docs.where(F.col("doc_id") % 50 != 0)
        .join(
            F.broadcast(eval_docs),
            (F.col("doc_id") % 10) * 50 == F.col("eval_id"),
            "left",
        )
        .select("doc_id", F.concat("text", leak).alias("text"))
    )
    train = D.with_shingles(train_raw, "doc_id", "text", _DECON_NGRAM).select(
        "doc_id", F.explode("shingles").alias("gram")
    )
    return (
        train.join(F.broadcast(eval_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
    )


# ---------------------------------------------------------------------------
# Corpus token budget: the first question of training-data work — how
# many tokens, distributed how? Docs bucketed by power-of-2 BPE-token
# count; per-bucket doc/token counts plus each bucket's share of the
# grand total (window over the one-row aggregate — no second scan).
# Map-side token counting (same BPE-ish pre-tokenizer as
# text_quality_stats) + one tiny shuffle on the bucket key.
# ---------------------------------------------------------------------------

_TOKEN_BUDGET_ORACLE = f"""
WITH counted AS (
    SELECT doc_id,
           len(regexp_extract_all({sql_norm_text('text')}, '{BPE_PATTERN}'))
               AS n_bpe
    FROM documents
),
bucketed AS (
    SELECT CAST(floor(log2(n_bpe + 1)) AS INT) AS bucket_log2, n_bpe
    FROM counted
)
SELECT bucket_log2,
       CAST(pow(CAST(2.0 AS DOUBLE), bucket_log2) AS BIGINT) AS bucket_min_tokens,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CAST(n_bpe AS BIGINT)) AS BIGINT) AS bucket_tokens,
       CAST(sum(CAST(n_bpe AS BIGINT)) AS DOUBLE)
           / CAST(sum(sum(CAST(n_bpe AS BIGINT))) OVER () AS DOUBLE)
           AS token_share
FROM bucketed
GROUP BY bucket_log2
"""


@register(
    "corpus_token_budget",
    _TOKEN_BUDGET_ORACLE,
    doc="corpus token budget: docs bucketed by power-of-2 BPE-token count "
    "with per-bucket token totals and share-of-corpus (window over the "
    "aggregate, no second scan) — the 'how many tokens do we have' "
    "query (north star)",
)
def q_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import BPE_PATTERN as _BP

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_bpe = F.size(
        F.regexp_extract_all(norm_text(F.col("text")), F.lit(_BP), 0)
    ).cast("bigint")
    bucketed = docs.select(
        F.floor(F.log2(n_bpe + 1)).cast("int").alias("bucket_log2"),
        n_bpe.alias("n_bpe"),
    )
    from pyspark.sql import Window as W

    agg = bucketed.groupBy("bucket_log2").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_bpe").alias("bucket_tokens"),
    )
    return agg.select(
        "bucket_log2",
        F.pow(F.lit(2.0), F.col("bucket_log2")).cast("bigint").alias(
            "bucket_min_tokens"
        ),
        "n_docs",
        "bucket_tokens",
        (
            F.col("bucket_tokens").cast("double")
            / F.sum("bucket_tokens").over(W.partitionBy()).cast("double")
        ).alias("token_share"),
    )


# ---------------------------------------------------------------------------
# Context-window chunking (round-4 extension): fixed-token-budget
# chunks with strided overlap — the training-batch preparation step.
# One in-plan `sequence` + explode per doc; output rows ∝ corpus
# tokens / stride, the plan is pure map-side (PLANS.md). The oracle
# rebuilds every chunk with generate_series + list_slice.
# ---------------------------------------------------------------------------


def _sql_chunks(size: int, stride: int) -> str:
    """CTE text producing (doc_id, chunk_id, chunk list) at the given
    geometry over `documents` — mirrors operators/text_analysis.
    chunk_documents token for token."""
    return f"""
tokd AS (
    SELECT doc_id, string_split({sql_norm_text('text')}, ' ') AS toks
    FROM documents
    WHERE length({sql_norm_text('text')}) > 0
),
chunked AS (
    SELECT doc_id,
           CAST(s / {stride} AS BIGINT) AS chunk_id,
           list_slice(toks, s + 1, s + {size}) AS chunk
    FROM (
        SELECT doc_id, toks,
               unnest(generate_series(0, len(toks) - 1, {stride})) AS s
        FROM tokd
    )
)"""


_CHUNKING_ORACLE = f"""
WITH {_sql_chunks(64, 48)}
SELECT doc_id, chunk_id,
       CAST(len(chunk) AS BIGINT) AS n_chunk_tokens,
       array_to_string(chunk, ' ') AS chunk_text,
       md5(array_to_string(chunk, ' ')) AS chunk_fingerprint
FROM chunked
"""


@register(
    "corpus_chunking",
    _CHUNKING_ORACLE,
    doc="context-window chunking: 64-token chunks, stride 48 (overlap 16) — "
    "training-batch prep, pure map-side sequence+explode (north star, r4)",
)
def q_corpus_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return TA.chunk_documents(docs, chunk_tokens=64, stride=48)


# ---------------------------------------------------------------------------
# Boilerplate segments (round-4 extension): a non-overlapping 32-token
# segment recurring in >= 3 DISTINCT documents is boilerplate (the C4
# line-frequency rule, applied to token segments because the synthetic
# docs are single-line; operators/text_analysis.boilerplate_line_stats
# is the newline-corpus variant, unit-tested on fabricated multi-line
# docs). Two md5-keyed shuffles; segment text never shuffles.
# ---------------------------------------------------------------------------

_BOILER_ORACLE = f"""
WITH {_sql_chunks(32, 32)},
segs AS (
    SELECT doc_id, md5(array_to_string(chunk, ' ')) AS seg_hash FROM chunked
),
seg_df AS (
    SELECT seg_hash, count(DISTINCT doc_id) AS seg_doc_freq
    FROM segs GROUP BY seg_hash
)
SELECT s.doc_id,
       CAST(count(*) AS BIGINT) AS n_segments,
       CAST(sum(CASE WHEN d.seg_doc_freq >= 3 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_boiler_segments,
       CAST(sum(CASE WHEN d.seg_doc_freq >= 3 THEN 1 ELSE 0 END) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS boiler_ratio
FROM segs s JOIN seg_df d USING (seg_hash)
GROUP BY s.doc_id
"""


@register(
    "corpus_boilerplate_segments",
    _BOILER_ORACLE,
    doc="boilerplate detection: 32-token segments recurring in >=3 distinct "
    "docs; per-doc boilerplate ratio (C4 rule on segments; north star, r4)",
)
def q_corpus_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    segs = TA.chunk_documents(docs, chunk_tokens=32, stride=32).select(
        "doc_id", F.col("chunk_fingerprint").alias("seg_hash")
    )
    seg_df = segs.groupBy("seg_hash").agg(
        F.count_distinct("doc_id").alias("seg_doc_freq")
    )
    boiler = F.when(F.col("seg_doc_freq") >= 3, F.lit(1)).otherwise(F.lit(0))
    return (
        segs.join(seg_df, "seg_hash")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_segments"),
            F.sum(boiler).cast("bigint").alias("n_boiler_segments"),
        )
        .withColumn(
            "boiler_ratio",
            F.col("n_boiler_segments").cast("double")
            / F.col("n_segments").cast("double"),
        )
    )


# ---------------------------------------------------------------------------
# Greedy sequence packing (round-4 extension): docs → fixed-budget
# training sequences. The per-group fold is inherently sequential
# (each placement depends on the running fill), so the Spark side is
# the documented applyInPandas escape hatch; the oracle replays the
# identical fold as a DuckDB recursive CTE — an exact oracle for a
# non-window-expressible computation.
# ---------------------------------------------------------------------------

_PACK_BUDGET = 256

_PACKING_ORACLE = f"""
WITH RECURSIVE ordered AS (
    SELECT lang, doc_id, n,
           row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
    FROM (
        SELECT lang, doc_id,
               len(string_split({sql_norm_text('text')}, ' ')) AS n
        FROM documents
    )
),
packed AS (
    SELECT lang, doc_id, n, rn, 0 AS bin_id, n AS fill
    FROM ordered WHERE rn = 1
    UNION ALL
    SELECT o.lang, o.doc_id, o.n, o.rn,
           CASE WHEN p.fill + o.n > {_PACK_BUDGET}
                THEN p.bin_id + 1 ELSE p.bin_id END,
           CASE WHEN p.fill + o.n > {_PACK_BUDGET}
                THEN o.n ELSE p.fill + o.n END
    FROM packed p
    JOIN ordered o ON o.lang = p.lang AND o.rn = p.rn + 1
)
SELECT lang, doc_id,
       CAST(n AS BIGINT) AS n_tokens,
       CAST(bin_id AS BIGINT) AS bin_id
FROM packed
"""


@register(
    "corpus_sequence_packing",
    _PACKING_ORACLE,
    doc="greedy fixed-budget sequence packing per language (applyInPandas "
    "sequential fold; recursive-CTE oracle) (north star, r4)",
)
def q_corpus_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "lang", "doc_id", F.size(tokens(F.col("text"))).cast("bigint").alias("n_tokens")
    )
    return TA.pack_sequences(
        docs, group_col="lang", id_col="doc_id",
        weight_col="n_tokens", budget=_PACK_BUDGET,
    )


# ---------------------------------------------------------------------------
# Dedup-cluster resolution (round-4 extension): pairs → components.
# The pair graph links orig → first copy → second copy as a CHAIN
# (consecutive ids within each fingerprint group), so min-label
# propagation genuinely has to walk diameter 2 — while the oracle can
# state the fixpoint directly (component = group-min over the
# fingerprint partition). An exact oracle for an iterative algorithm.
# ---------------------------------------------------------------------------

_CC_OFFSET_B, _CC_OFFSET_C = 20_000_000, 30_000_000

_CC_ORACLE = f"""
WITH base AS (
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + {_CC_OFFSET_B} AS doc_id, text
    FROM documents WHERE doc_id % 3 = 0
    UNION ALL
    SELECT doc_id + {_CC_OFFSET_C} AS doc_id, text
    FROM documents WHERE doc_id % 6 = 0
),
fp AS (
    SELECT doc_id, md5({sql_norm_text('text')}) AS f FROM base
),
counted AS (
    SELECT doc_id,
           count(*) OVER (PARTITION BY f) AS c,
           min(doc_id) OVER (PARTITION BY f) AS m
    FROM fp
)
SELECT doc_id AS node, CAST(m AS BIGINT) AS component
FROM counted WHERE c >= 2
"""


@register(
    "dedup_connected_components",
    _CC_ORACLE,
    doc="dedup pairs -> clusters via min-label-propagation connected "
    "components (iterative class, like kmeans, but with an exact "
    "fixpoint oracle); chain edges force diameter-2 walks (north star, r4)",
)
def q_dedup_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = (
        docs.unionByName(
            docs.where(F.col("doc_id") % 3 == 0).select(
                (F.col("doc_id") + _CC_OFFSET_B).alias("doc_id"), "text"
            )
        )
        .unionByName(
            docs.where(F.col("doc_id") % 6 == 0).select(
                (F.col("doc_id") + _CC_OFFSET_C).alias("doc_id"), "text"
            )
        )
    )
    fp = base.select("doc_id", F.md5(norm_text(F.col("text"))).alias("f"))
    w = W.partitionBy("f").orderBy("doc_id")
    edges = (
        fp.withColumn("nxt", F.lead("doc_id").over(w))
        .where(F.col("nxt").isNotNull())
        .select(F.col("doc_id").alias("src"), F.col("nxt").alias("dst"))
    )
    return D.connected_components(edges)


@register(
    "dedup_connected_components_star",
    _CC_ORACLE,  # same fixpoint, different algorithm — shared oracle
    doc="same cluster resolution via alternating large-star/small-star "
    "contraction (O(log^2) rounds — the deep-graph variant); sharing "
    "the propagation query's exact oracle cross-checks the two "
    "algorithms against each other (north star, r5)",
)
def q_dedup_cc_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = (
        docs.unionByName(
            docs.where(F.col("doc_id") % 3 == 0).select(
                (F.col("doc_id") + _CC_OFFSET_B).alias("doc_id"), "text"
            )
        )
        .unionByName(
            docs.where(F.col("doc_id") % 6 == 0).select(
                (F.col("doc_id") + _CC_OFFSET_C).alias("doc_id"), "text"
            )
        )
    )
    fp = base.select("doc_id", F.md5(norm_text(F.col("text"))).alias("f"))
    w = W.partitionBy("f").orderBy("doc_id")
    edges = (
        fp.withColumn("nxt", F.lead("doc_id").over(w))
        .where(F.col("nxt").isNotNull())
        .select(F.col("doc_id").alias("src"), F.col("nxt").alias("dst"))
    )
    return D.connected_components_star(edges)


# ---------------------------------------------------------------------------
# Heavy hitters via Misra-Gries (round-4 ext; r8 oracle upgrade, r7
# verdict item 3): the mergeable-sketch twin of token_frequency_topn.
# The raw estimates depend on the physical partitioning (legitimately
# — the sketch is defined per stream split), so they can never be
# hash-checked. The registered output is instead the sketch's
# CERTIFICATE: exact counts for a fixed vocabulary slice (top-32 by
# (count DESC, token) — a deterministic total order) plus integer
# invariant flags the sketch must satisfy under ANY partitioning —
# present-or-below-bound, never-overcounts, undercount <= its own
# reported bound. The oracle recomputes the exact slice and expects
# literal 1s: a broken sketch flips a flag and fails the hash. Raw
# estimates remain exposed through the operator and are bound-tested
# in tests/test_heavy_hitters.py.
# ---------------------------------------------------------------------------

_HH_SLICE = 32

_HEAVY_HITTERS_ORACLE = f"""
WITH toks AS (
    SELECT unnest({sql_tokens('text')}) AS token FROM documents
),
exact AS (
    SELECT token, count(*) AS exact_cnt
    FROM toks WHERE token <> '' GROUP BY token
)
SELECT token, exact_cnt,
       CAST(1 AS INT) AS sk_present_ok,
       CAST(1 AS INT) AS sk_no_overcount,
       CAST(1 AS INT) AS sk_within_bound
FROM exact
ORDER BY exact_cnt DESC, token
LIMIT {_HH_SLICE}
"""


@register(
    "token_heavy_hitters_sketch",
    _HEAVY_HITTERS_ORACLE,
    doc="Misra-Gries mergeable heavy-hitters over the token stream (k "
    "rows per partition instead of a vocabulary-wide shuffle), hash-"
    "certified in-query: output = exact counts of the deterministic "
    "top-32 slice + the sketch's partitioning-independent invariant "
    "flags, oracle expects all-ones (north star, r4; r8 upgrade)",
)
def q_token_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("text")
    sk = TA.misra_gries_heavy_hitters(docs, "text", k=64).select(
        F.col("token").alias("sk_token"), "est_freq", "max_undercount"
    )
    exact = (
        docs.select(
            F.explode(F.split(norm_text(F.col("text")), " ")).alias("token")
        )
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
    )
    # TakeOrderedAndProject (distributed top-k, no global window task).
    top = exact.orderBy(F.col("exact_cnt").desc(), "token").limit(_HH_SLICE)
    # The global undercount bound is one scalar — broadcast it.
    bound = sk.agg(F.max("max_undercount").alias("bound"))
    return (
        top.join(sk, top.token == sk.sk_token, "left")
        .crossJoin(F.broadcast(bound))
        .select(
            "token",
            "exact_cnt",
            (
                F.col("est_freq").isNotNull()
                | (F.col("exact_cnt") <= F.col("bound"))
            ).cast("int").alias("sk_present_ok"),
            (F.coalesce("est_freq", F.lit(0)) <= F.col("exact_cnt"))
            .cast("int").alias("sk_no_overcount"),
            (
                F.col("exact_cnt") - F.coalesce("est_freq", F.lit(0))
                <= F.col("bound")
            ).cast("int").alias("sk_within_bound"),
        )
    )


# ---------------------------------------------------------------------------
# int8 embedding quantization (round-4 ext): symmetric per-vector
# codes — the 100 TB embedding-storage transform (4× under float32).
# Lossy, yet bitwise-oracle-checkable: every step is elementwise
# double arithmetic in one pinned expression order.
# ---------------------------------------------------------------------------

_QUANTIZE_ORACLE = """
WITH scaled AS (
    SELECT vec_id, embedding,
           CASE WHEN list_max(list_transform(embedding,
                    x -> abs(CAST(x AS DOUBLE)))) = 0.0
                THEN 1.0
                ELSE list_max(list_transform(embedding,
                    x -> abs(CAST(x AS DOUBLE)))) END AS scale
    FROM embeddings
),
coded AS (
    SELECT vec_id, embedding, scale,
           list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 127.0 / scale + 0.5) AS INT)
           ) AS q_embedding
    FROM scaled
)
SELECT vec_id, scale,
       array_to_string(q_embedding, ',') AS q_codes,
       list_max(
           list_transform(
               generate_series(1, len(embedding)),
               i -> abs(CAST(embedding[i] AS DOUBLE)
                        - CAST(q_embedding[i] AS DOUBLE) * scale / 127.0)
           )
       ) AS max_abs_err
FROM coded
"""


@register(
    "embedding_quantize_int8",
    _QUANTIZE_ORACLE,
    doc="symmetric per-vector int8 quantization of embeddings with "
    "self-reported reconstruction error — lossy transform, exact oracle "
    "(north star, r4; r6: codes final-projected to a joined string so "
    "the driver canonicalizer never sees a top-level array — the r4/r5 "
    "crash class, now swept registry-wide by tests/test_schema_audit.py)",
)
def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    out = S.quantize_embeddings_int8(emb)
    return out.select(
        "vec_id",
        "scale",
        F.array_join(
            F.transform("q_embedding", lambda c: c.cast("string")), ","
        ).alias("q_codes"),
        "max_abs_err",
    )


# ---------------------------------------------------------------------------
# Training-batch build capstone (round-4 ext): the full context-window
# path in ONE lazy plan — chunk (map-side) → exact-dedup chunks (one
# md5 groupBy; strided overlap makes repeated chunks common) → greedy
# pack survivors into fixed-budget sequences per language. Composes
# three operators; the oracle composes their SQL (chunk CTE + group-
# min dedup + recursive-CTE packing). Survivor = lowest (doc_id,
# chunk_id) per fingerprint, packing order = (doc_id, chunk_id) —
# every step totally ordered, so the emitted (lang, chunk, bin)
# assignment is bit-deterministic end to end.
# ---------------------------------------------------------------------------

_BUILD_BUDGET = 256

_TRAINING_BUILD_ORACLE = f"""
WITH RECURSIVE {_sql_chunks(64, 48)},
fp AS (
    SELECT c.doc_id, c.chunk_id, d.lang,
           CAST(len(c.chunk) AS BIGINT) AS n_tokens,
           md5(array_to_string(c.chunk, ' ')) AS f
    FROM chunked c JOIN documents d USING (doc_id)
),
survivors AS (
    SELECT doc_id, chunk_id, lang, n_tokens, f
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY f ORDER BY doc_id, chunk_id) AS rn
        FROM fp
    ) WHERE rn = 1
),
ordered AS (
    SELECT lang, doc_id, chunk_id, n_tokens,
           row_number() OVER (PARTITION BY lang ORDER BY doc_id, chunk_id) AS rn
    FROM survivors
),
packed AS (
    SELECT lang, doc_id, chunk_id, n_tokens, rn, 0 AS bin_id, n_tokens AS fill
    FROM ordered WHERE rn = 1
    UNION ALL
    SELECT o.lang, o.doc_id, o.chunk_id, o.n_tokens, o.rn,
           CASE WHEN p.fill + o.n_tokens > {_BUILD_BUDGET}
                THEN p.bin_id + 1 ELSE p.bin_id END,
           CASE WHEN p.fill + o.n_tokens > {_BUILD_BUDGET}
                THEN o.n_tokens ELSE p.fill + o.n_tokens END
    FROM packed p
    JOIN ordered o ON o.lang = p.lang AND o.rn = p.rn + 1
)
SELECT lang, doc_id, chunk_id, n_tokens, CAST(bin_id AS BIGINT) AS bin_id
FROM packed
"""


@register(
    "corpus_training_build",
    _TRAINING_BUILD_ORACLE,
    doc="capstone: chunk -> exact-dedup chunks -> greedy-pack survivors "
    "into fixed-budget sequences per language, one lazy plan; composed "
    "recursive-CTE oracle (north star, r4)",
)
def q_corpus_training_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    chunks = TA.chunk_documents(
        docs.select("doc_id", "text"), chunk_tokens=64, stride=48
    ).join(docs.select("doc_id", "lang"), "doc_id")
    w = W.partitionBy("chunk_fingerprint").orderBy("doc_id", "chunk_id")
    survivors = (
        chunks.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("lang", "doc_id", "chunk_id", "n_chunk_tokens")
    )
    # pack_sequences orders by one id column; (doc_id, chunk_id) packs
    # into a single orderable key (chunk_id < 2^20 per doc by
    # construction: docs are far shorter than 2^20 strides).
    keyed = survivors.select(
        "lang",
        (F.col("doc_id") * F.lit(1 << 20) + F.col("chunk_id")).alias("__key__"),
        F.col("n_chunk_tokens").alias("n_tokens"),
    )
    packed = TA.pack_sequences(
        keyed, group_col="lang", id_col="__key__",
        weight_col="n_tokens", budget=_BUILD_BUDGET,
    )
    return packed.select(
        "lang",
        (F.col("__key__") / F.lit(1 << 20)).cast("bigint").alias("doc_id"),
        (F.col("__key__") % F.lit(1 << 20)).cast("bigint").alias("chunk_id"),
        "n_tokens",
        "bin_id",
    )


# ---------------------------------------------------------------------------
# Repetition stats (round-5 ext): the Gopher/MassiveText repetition
# rule — the fraction of a document's token trigrams that are
# duplicates. Boilerplate-stuffed and looped generations score high;
# the companion keep-flag applies the published <=0.30 duplicate-
# trigram threshold. Entirely map-side higher-order array expressions
# (no explode, no shuffle): the trigram list never leaves its row.
# ---------------------------------------------------------------------------

_REPETITION_ORACLE = f"""
WITH tokd AS (
    SELECT doc_id, {sql_tokens('text')} AS toks FROM documents
),
tri AS (
    SELECT doc_id,
           len(toks) AS n_tokens,
           CASE WHEN len(toks) >= 3
                THEN list_transform(
                    generate_series(1, len(toks) - 2),
                    i -> concat_ws(' ', toks[CAST(i AS INT)],
                                   toks[CAST(i AS INT) + 1],
                                   toks[CAST(i AS INT) + 2]))
                ELSE [] END AS grams
    FROM tokd
)
SELECT doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(len(grams) AS BIGINT) AS n_trigrams,
       CAST(len(grams) - len(list_distinct(grams)) AS BIGINT)
           AS n_dup_trigrams,
       CASE WHEN len(grams) > 0
            THEN CAST(len(grams) - len(list_distinct(grams)) AS DOUBLE)
                 / CAST(len(grams) AS DOUBLE)
            ELSE CAST(0 AS DOUBLE) END AS dup_trigram_frac,
       CASE WHEN len(grams) > 0
            THEN (CAST(len(grams) - len(list_distinct(grams)) AS DOUBLE)
                  / CAST(len(grams) AS DOUBLE)) <= 0.30
            ELSE TRUE END AS passes_repetition_rule
FROM tri
"""


@register(
    "text_repetition_stats",
    _REPETITION_ORACLE,
    doc="Gopher-style repetition rule: duplicate-trigram fraction per doc "
    "+ <=0.30 keep flag; pure map-side array expressions, zero shuffle "
    "(north star, r5)",
)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = tokens(F.col("text"))
    d = docs.select("doc_id", toks.alias("toks"))
    n = F.size("toks")
    grams = F.when(
        n >= 3,
        F.transform(
            F.sequence(F.lit(1), n - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at(F.col("toks"), i.cast("int")),
                F.element_at(F.col("toks"), i.cast("int") + 1),
                F.element_at(F.col("toks"), i.cast("int") + 2),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = d.select("doc_id", n.alias("n_tokens"), grams.alias("grams"))
    n_tri = F.size("grams")
    n_dup = n_tri - F.size(F.array_distinct("grams"))
    frac = F.when(
        n_tri > 0, n_dup.cast("double") / n_tri.cast("double")
    ).otherwise(F.lit(0.0))
    return g.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        n_tri.cast("bigint").alias("n_trigrams"),
        n_dup.cast("bigint").alias("n_dup_trigrams"),
        frac.alias("dup_trigram_frac"),
        F.when(n_tri > 0, frac <= 0.30).otherwise(F.lit(True)).alias(
            "passes_repetition_rule"
        ),
    )


# ---------------------------------------------------------------------------
# Bloom-prefiltered decontamination (round-5 ext): the same planted-
# contamination setup as corpus_decontamination, but the eval-gram
# membership test goes through a Catalyst-built Bloom filter
# (operators/joins.bloom_semi_prefilter) BEFORE the exact confirm
# join. Same final answer (Bloom has no false negatives), same
# oracle; what changes is the 100 TB posture — the broadcast is a
# fixed-size bitmap (n_bits/8 bytes) instead of the distinct-gram
# set, so the pattern survives an eval suite too large to broadcast
# exactly. False positives only cost confirm-join work.
# ---------------------------------------------------------------------------


@register(
    "corpus_decontamination_bloom",
    _DECONTAMINATION_ORACLE,
    doc="decontamination via Catalyst-built Bloom prefilter (fixed-size "
    "bitmap broadcast, map-side membership test, no false negatives) + "
    "exact confirm join — bitwise-identical result to the broadcast "
    "semi-join, proven by sharing its oracle (north star, r5)",
)
def q_decontamination_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.joins import bloom_semi_prefilter

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    eval_docs = docs.where(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("eval_id"), tokens(F.col("text")).alias("toks")
    )
    eval_grams = (
        D.with_shingles(
            docs.where(F.col("doc_id") % 50 == 0), "doc_id", "text", _DECON_NGRAM
        )
        .select(F.explode("shingles").alias("gram"))
        .distinct()
    )
    leak = F.when(
        (F.col("doc_id") % 9 == 0) & F.col("eval_id").isNotNull(),
        F.concat(F.lit(" "), F.array_join(F.slice("toks", 1, 12), " ")),
    ).otherwise(F.lit(""))
    train_raw = (
        docs.where(F.col("doc_id") % 50 != 0)
        .join(
            F.broadcast(eval_docs),
            (F.col("doc_id") % 10) * 50 == F.col("eval_id"),
            "left",
        )
        .select("doc_id", F.concat("text", leak).alias("text"))
    )
    # Shingling+hashing is the CPU stage; a single-row-group test file
    # pins it to one task (readers.ensure_parallelism is a no-op
    # whenever the scan already yields >= cores splits).
    train = D.with_shingles(
        ensure_parallelism(train_raw), "doc_id", "text", _DECON_NGRAM
    ).select("doc_id", F.explode("shingles").alias("gram"))
    survivors = bloom_semi_prefilter(train, "gram", eval_grams, "gram")
    return (
        survivors.join(F.broadcast(eval_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
    )


# ---------------------------------------------------------------------------
# Corpus unigram statistics (round-5 ext): the two-pass global-
# statistic shape every corpus-level quality scorer needs — pass 1
# aggregates a corpus-wide token-frequency table (shuffle on token,
# output ~vocabulary-sized); pass 2 broadcasts it back over the
# corpus to score each document (OOV rate vs the top-V vocabulary,
# mean corpus frequency of the doc's tokens — a rare-token-heavy doc
# scores low, the unigram proxy for perplexity filtering). All
# arithmetic stays in exact BIGINTs until the two terminal divisions,
# so the oracle matches bitwise; vocabulary ties break on
# (count DESC, token ASC) identically in both engines.
# ---------------------------------------------------------------------------

_VOCAB_TOP = 16

_UNIGRAM_ORACLE = f"""
WITH tokd AS (
    SELECT doc_id, unnest({sql_tokens('text')}) AS tok FROM documents
),
freq AS (
    SELECT tok, CAST(count(*) AS BIGINT) AS c FROM tokd GROUP BY tok
),
total AS (SELECT CAST(sum(c) AS BIGINT) AS t FROM freq),
vocab AS (
    SELECT tok, c,
           row_number() OVER (ORDER BY c DESC, tok) <= {_VOCAB_TOP}
               AS in_vocab
    FROM freq
)
SELECT d.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN v.in_vocab THEN 0 ELSE 1 END) AS BIGINT)
           AS n_oov,
       CAST(sum(CASE WHEN v.in_vocab THEN 0 ELSE 1 END) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS oov_rate,
       CAST(sum(v.c) AS BIGINT) AS sum_freq,
       CAST(sum(v.c) AS DOUBLE)
           / (CAST(count(*) AS BIGINT) * (SELECT t FROM total))
           AS mean_token_freq
FROM tokd d JOIN vocab v ON v.tok = d.tok
GROUP BY d.doc_id
"""


@register(
    "corpus_unigram_stats",
    _UNIGRAM_ORACLE,
    doc="two-pass corpus statistic: global token-frequency table "
    "(vocabulary-sized) broadcast back over the corpus — per-doc OOV "
    f"rate vs the top-{_VOCAB_TOP} vocabulary and mean token corpus "
    "frequency (unigram perplexity proxy); exact BIGINT arithmetic "
    "until the terminal divisions (north star, r5)",
)
def q_corpus_unigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    exploded = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
    )
    freq = exploded.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    vocab = freq.withColumn(
        "in_vocab",
        F.row_number().over(W.orderBy(F.col("c").desc(), F.col("tok")))
        <= _VOCAB_TOP,
    )
    total = freq.agg(F.sum("c").cast("bigint").alias("t"))
    n_oov = F.sum(F.when(F.col("in_vocab"), 0).otherwise(1)).cast("bigint")
    return (
        exploded.join(F.broadcast(vocab), "tok")
        .join(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            n_oov.alias("n_oov"),
            (
                n_oov.cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("oov_rate"),
            F.sum("c").cast("bigint").alias("sum_freq"),
            (
                F.sum("c").cast("double")
                / (
                    F.count(F.lit(1)).cast("bigint") * F.first("t")
                ).cast("double")
            ).alias("mean_token_freq"),
        )
    )


# ---------------------------------------------------------------------------
# Boilerplate REMOVAL with ordered reassembly (round-5 ext): the step
# after detection (corpus_boilerplate_segments stops at flagging) —
# drop every 32-token segment recurring in >= 3 distinct documents and
# rebuild each document's cleaned text in original segment order, the
# C4/RefinedWeb line-dedup rewrite applied to token segments. A fixed
# 32-token banner is planted at the head of every doc_id%4==0 document
# (both engines build the identical input) so the rule provably fires.
#
# Scale shape: the recurring-segment set is BY DEFINITION the small
# minority of distinct segments (boilerplate = high doc-frequency), so
# it broadcasts; classification is then a map-side left join, and the
# only full-corpus shuffle is the doc_id reassembly groupBy — segment
# text never shuffles by hash. The doc-frequency pass itself shuffles
# md5 digests only. If the recurring set ever outgrew the broadcast
# threshold, the fallback is the plain shuffle join (same result, one
# extra corpus shuffle); the oracle is agnostic.
# ---------------------------------------------------------------------------

_BOILER_BANNER = " ".join(f"boiler{i % 7}" for i in range(32))

_BOILER_REWRITE_ORACLE = f"""
WITH src AS (
    SELECT doc_id,
           CASE WHEN doc_id % 4 = 0
                THEN '{_BOILER_BANNER} ' || text ELSE text END AS text
    FROM documents
),
tokd AS (
    SELECT doc_id, string_split({sql_norm_text('text')}, ' ') AS toks
    FROM src
    WHERE length({sql_norm_text('text')}) > 0
),
chunked AS (
    SELECT doc_id,
           CAST(s / 32 AS BIGINT) AS chunk_id,
           list_slice(toks, s + 1, s + 32) AS chunk
    FROM (
        SELECT doc_id, toks,
               unnest(generate_series(0, len(toks) - 1, 32)) AS s
        FROM tokd
    )
),
segs AS (
    SELECT doc_id, chunk_id,
           array_to_string(chunk, ' ') AS seg_text,
           md5(array_to_string(chunk, ' ')) AS seg_hash,
           len(chunk) AS n_seg_tokens
    FROM chunked
),
freq AS (
    SELECT seg_hash, count(DISTINCT doc_id) AS f FROM segs GROUP BY seg_hash
)
SELECT s.doc_id,
       CAST(count(*) AS BIGINT) AS n_segments,
       CAST(sum(CASE WHEN q.f >= 3 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dropped,
       md5(coalesce(
           string_agg(CASE WHEN q.f < 3 THEN s.seg_text END, ' '
                      ORDER BY s.chunk_id),
           '')) AS clean_fingerprint,
       CAST(coalesce(
           sum(CASE WHEN q.f < 3 THEN s.n_seg_tokens END), 0) AS BIGINT)
           AS clean_n_tokens
FROM segs s JOIN freq q USING (seg_hash)
GROUP BY s.doc_id
"""


@register(
    "corpus_boilerplate_rewrite",
    _BOILER_REWRITE_ORACLE,
    doc="boilerplate REMOVAL: drop segments recurring in >=3 docs and "
    "reassemble each doc's cleaned text in segment order (C4/RefinedWeb "
    "rewrite step); recurring set broadcast, classification map-side, "
    "one reassembly shuffle (north star, r5)",
)
def q_corpus_boilerplate_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    src = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(F.lit(_BOILER_BANNER + " "), F.col("text")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    segs = TA.chunk_documents(src, chunk_tokens=32, stride=32).select(
        "doc_id",
        "chunk_id",
        F.col("chunk_text").alias("seg_text"),
        F.col("chunk_fingerprint").alias("seg_hash"),
        F.col("n_chunk_tokens").alias("n_seg_tokens"),
    )
    # Doc-frequency pass ships md5 digests only; the >=3 survivors are
    # the broadcastable boilerplate set (see block comment).
    boiler = (
        segs.groupBy("seg_hash")
        .agg(F.count_distinct("doc_id").alias("f"))
        .where(F.col("f") >= 3)
        .select("seg_hash")
        .withColumn("is_boiler", F.lit(True))
    )
    flagged = segs.join(F.broadcast(boiler), "seg_hash", "left")
    kept = F.col("is_boiler").isNull()
    kept_seg = F.when(kept, F.struct("chunk_id", "seg_text"))
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_segments"),
        F.sum(F.when(kept, 0).otherwise(1)).cast("bigint").alias("n_dropped"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_seg)),
                    lambda x: x.seg_text,
                ),
                " ",
            )
        ).alias("clean_fingerprint"),
        F.coalesce(
            F.sum(F.when(kept, F.col("n_seg_tokens"))), F.lit(0)
        )
        .cast("bigint")
        .alias("clean_n_tokens"),
    )


# ---------------------------------------------------------------------------
# TF-IDF top terms per document (round-5 ext): the keyword-extraction
# / topic-tagging pass of a curation pipeline. Two global statistics
# (document count, per-token document frequency) broadcast back over
# the per-doc term frequencies; per-doc top-3 by a rank window.
# idf is integer-scaled (N*1000 div df) so scores stay in exact
# BIGINTs — ln() is deliberately avoided because libm parity across
# engines is not a contract worth betting a hash on. Ties break
# (score DESC, token ASC) identically in both engines. Scale: tf
# shuffles once on (doc_id, tok); df is vocabulary-sized → broadcast;
# the rank window re-uses the doc_id partitioning of the tf output.
# ---------------------------------------------------------------------------

_TFIDF_TOPN = 3

_TFIDF_ORACLE = f"""
WITH tokd AS (
    SELECT doc_id, unnest({sql_tokens('text')}) AS tok FROM documents
),
tf AS (
    SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
    FROM tokd GROUP BY doc_id, tok
),
df AS (
    SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
    FROM tokd GROUP BY tok
),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
scored AS (
    SELECT tf.doc_id, tf.tok,
           tf.tf * ((SELECT n_docs FROM n) * 1000 // df.df) AS score
    FROM tf JOIN df USING (tok)
),
ranked AS (
    SELECT doc_id, tok, score,
           row_number() OVER (
               PARTITION BY doc_id ORDER BY score DESC, tok
           ) AS rnk
    FROM scored
)
SELECT doc_id, CAST(rnk AS INTEGER) AS rnk, tok,
       CAST(score AS BIGINT) AS score
FROM ranked WHERE rnk <= {_TFIDF_TOPN}
"""


@register(
    "corpus_tfidf_topterms",
    _TFIDF_ORACLE,
    doc=f"TF-IDF top-{_TFIDF_TOPN} terms per doc: integer-scaled idf "
    "(N*1000 div df — exact BIGINT scores, no libm parity bet), "
    "vocabulary-sized df broadcast, one (doc_id,tok) shuffle "
    "(north star, r5)",
)
def q_corpus_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tokd = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
    tf = tokd.groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    dfreq = tokd.groupBy("tok").agg(
        F.count_distinct("doc_id").cast("bigint").alias("df")
    )
    n_docs = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dfreq), "tok")
        .join(F.broadcast(n_docs))
        .select(
            "doc_id",
            "tok",
            (F.col("tf") * F.expr("(n_docs * 1000) div df")).alias("score"),
        )
    )
    rnk = F.row_number().over(
        W.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("tok"))
    )
    return (
        scored.withColumn("rnk", rnk)
        .where(F.col("rnk") <= _TFIDF_TOPN)
        .select(
            "doc_id",
            F.col("rnk").cast("int").alias("rnk"),
            "tok",
            F.col("score").cast("bigint").alias("score"),
        )
    )


# ---------------------------------------------------------------------------
# SemDeDup — semantic dedup via cluster-then-prune (round-5 ext,
# after Abbas et al. 2023, arXiv:2303.09540): restrict pairwise
# cosine comparison to members of the same semantic cell and drop
# every member with a higher id than some near-identical neighbor
# (cos >= tau). The cell is the embeddings' coarse `label` (the same
# deterministic cell the IVF index probes), so the quadratic work is
# per-cell, not corpus-wide: with k ~ sqrt(N) balanced cells the
# total comparison count is N^1.5, and each cell's pair set stays on
# one partition (shuffle key = label). Near-identical variants are
# planted (last 4 of 64 dims zeroed, id +40M, same cell) because the
# synthetic embeddings have no organic near-dups (within-cell max
# cosine 0.47); tau=0.9 catches exactly the planted ones. Verdict per
# vector: keep + diagnostics, the SemDeDup decision surface.
# ---------------------------------------------------------------------------

_SEMDEDUP_TAU = 0.9
_SEMDEDUP_OFFSET = 40_000_000

_SEMDEDUP_BASE_SQL = f"""
base AS (
    SELECT vec_id, label,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
    FROM embeddings
    UNION ALL
    SELECT vec_id + {_SEMDEDUP_OFFSET}, label,
           list_transform(generate_series(1, len(embedding)),
                          i -> CASE WHEN i <= len(embedding) - 4
                                    THEN CAST(embedding[i] AS DOUBLE)
                                    ELSE 0.0 END)
    FROM embeddings WHERE vec_id % 10 = 0
)"""

# The quadratic stage scores each pair with ONE dot product over
# PRE-NORMALIZED vectors (x / sqrt(dot(v,v)) once per vector), not
# cosine per pair (dot + two norms = 3 folds/pair): ~3x less work in
# the only stage that scales with pair count. Re-evaluating the norm
# per element in SQL yields bitwise-identical doubles, so the two
# engines agree despite different evaluation counts.
_SEMDEDUP_ORACLE = f"""
WITH {_SEMDEDUP_BASE_SQL},
normed AS (
    SELECT vec_id, label,
           list_transform(v, x -> x / sqrt({_SQL_DOT.format(a='v', b='v')}))
               AS nv
    FROM base
),
pairs AS (
    SELECT b.vec_id AS vid, {_SQL_DOT.format(a='a.nv', b='b.nv')} AS c
    FROM normed a JOIN normed b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {_SQL_DOT.format(a='a.nv', b='b.nv')} >= {_SEMDEDUP_TAU}
),
agg AS (
    SELECT vid, CAST(count(*) AS BIGINT) AS n_dups,
           max(c) AS max_dup_cosine
    FROM pairs GROUP BY vid
)
SELECT e.vec_id, e.label,
       coalesce(a.n_dups, 0) AS n_dups,
       a.max_dup_cosine AS max_dup_cosine,
       (a.vid IS NULL) AS keep
FROM base e LEFT JOIN agg a ON a.vid = e.vec_id
"""


@register(
    "dedup_semantic_clusters",
    _SEMDEDUP_ORACLE,
    doc="SemDeDup: within-cell pairwise cosine prune (keep lowest id "
    "per near-dup set, tau=0.9); quadratic work confined per cell, "
    "planted last-4-dims-zeroed variants are the positives "
    "(north star, r5)",
)
def q_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    to_d = F.transform(F.col("embedding"), lambda v: v.cast("double"))
    base = emb.select("vec_id", "label", to_d.alias("v"))
    d = F.size(F.col("v"))
    variant = F.transform(
        F.col("v"),
        lambda v, i: F.when(i < d - 4, v).otherwise(F.lit(0.0)),
    )
    var = base.where(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + _SEMDEDUP_OFFSET).alias("vec_id"),
        "label",
        variant.alias("v"),
    )
    full = base.unionByName(var)
    # Normalize ONCE per vector (norm materialized as its own column
    # first — referencing the fold inside the transform lambda would
    # re-run it per element, the with_shingles expression trap), so
    # the per-pair score in the quadratic stage is a single dot.
    normed = full.withColumn("__n__", S.norm(F.col("v"))).select(
        "vec_id",
        "label",
        F.transform(F.col("v"), lambda x: x / F.col("__n__")).alias("nv"),
    )
    a = normed.select(
        F.col("vec_id").alias("a_id"), "label", F.col("nv").alias("av")
    )
    b = normed.select(
        F.col("vec_id").alias("vid"), "label", F.col("nv").alias("bv")
    )
    pairs = (
        a.join(b, "label")
        .where(F.col("a_id") < F.col("vid"))
        .select("vid", S.dot(F.col("av"), F.col("bv")).alias("c"))
        .where(F.col("c") >= _SEMDEDUP_TAU)
    )
    agg = pairs.groupBy("vid").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_dups"),
        F.max("c").alias("max_dup_cosine"),
    )
    return full.join(
        agg, full.vec_id == agg.vid, "left"
    ).select(
        "vec_id",
        "label",
        F.coalesce("n_dups", F.lit(0).cast("bigint")).alias("n_dups"),
        "max_dup_cosine",
        F.col("vid").isNull().alias("keep"),
    )


# ---------------------------------------------------------------------------
# Exact-K per-stratum sample (round-5 ext): the distributed analogue
# of reservoir sampling, made deterministic — rank every doc inside
# its stratum by the engine-shared md5 hash of its id (a fixed random
# permutation) and keep the first K. Same guarantees as a reservoir
# (uniform without replacement, exact K per stratum) but
# reproducible, mergeable, and one window over the stratum
# partitioning. At 100 TB per-stratum TakeOrdered beats a global
# sort: only K rows per stratum survive the shuffle.
# ---------------------------------------------------------------------------

_RESERVOIR_K = 20

_RESERVOIR_ORACLE = f"""
WITH ranked AS (
    SELECT lang, doc_id, n_chars,
           {sql_hash32("CAST(doc_id AS VARCHAR)", "sample")} AS h,
           row_number() OVER (
               PARTITION BY lang
               ORDER BY {sql_hash32("CAST(doc_id AS VARCHAR)", "sample")},
                        doc_id
           ) AS rnk
    FROM documents
)
SELECT lang, doc_id, n_chars, CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= {_RESERVOIR_K}
"""


@register(
    "corpus_reservoir_sample",
    _RESERVOIR_ORACLE,
    doc=f"exact-{_RESERVOIR_K}-per-stratum deterministic sample "
    "(reservoir semantics via hash-rank window; uniform without "
    "replacement, reproducible across engines) (north star, r5)",
)
def q_corpus_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    h = hash32(F.col("doc_id").cast("string"), "sample")
    rnk = F.row_number().over(
        W.partitionBy("lang").orderBy(h.asc(), F.col("doc_id"))
    )
    return (
        docs.withColumn("rnk", rnk)
        .where(F.col("rnk") <= _RESERVOIR_K)
        .select("lang", "doc_id", "n_chars", F.col("rnk").cast("bigint").alias("rnk"))
    )


# ---------------------------------------------------------------------------
# Train/val/test split (round-5 ext): deterministic hash-mod
# assignment (80/10/10 on the shared md5 hash — stable under corpus
# growth: a doc's split never changes when other docs arrive, unlike
# rank-based splits) + per-(split, lang) token accounting. Pure
# map-side assignment; one aggregation shuffle.
# ---------------------------------------------------------------------------

_SPLIT_ORACLE = f"""
WITH assigned AS (
    SELECT doc_id, lang,
           len(string_split({sql_norm_text('text')}, ' ')) AS n_toks,
           {sql_hash32("CAST(doc_id AS VARCHAR)", "split")} % 100 AS bucket
    FROM documents
),
labeled AS (
    SELECT lang,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split,
           n_toks
    FROM assigned
)
SELECT split, lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_toks) AS BIGINT) AS n_tokens
FROM labeled
GROUP BY split, lang
"""


@register(
    "corpus_train_val_test_split",
    _SPLIT_ORACLE,
    doc="deterministic 80/10/10 train/val/test hash split (assignment "
    "stable under corpus growth) + per-(split,lang) token accounting "
    "(north star, r5)",
)
def q_corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "text"
    )
    bucket = hash32(F.col("doc_id").cast("string"), "split") % 100
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        docs.select(
            split.alias("split"),
            "lang",
            F.size(tokens(F.col("text"))).alias("n_toks"),
        )
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_toks").cast("bigint").alias("n_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# BPE merge learning (round-5 ext): tokenizer VOCABULARY TRAINING —
# the inherently iterative LLM-pipeline step (each merge changes what
# the next pair count sees). Distributed shape: per round one
# vocabulary-keyed pair-count shuffle + ONE collected row (the
# winning pair, the kmeans-centroid driver budget); symbol arrays
# never leave the cluster; greedy left-to-right merge is a Catalyst
# aggregate fold. Deterministic by construction (ties: count DESC,
# (left,right) ASC) but not SQL-expressible (iterated global argmax
# + rewrite), so it carries the rows-only driver check; exactness is
# pinned against a sequential Sennrich-style reference in
# tests/test_bpe_merges.py, overlap and tie cases included.
# ---------------------------------------------------------------------------


@register(
    "corpus_bpe_merges",
    None,  # iterative argmax+rewrite: exact-vs-reference pytest, rows-only
    doc="BPE tokenizer-vocabulary training: top-8 merges over the corpus "
    "(iterative pair-count + greedy in-plan merge; driver sees one row "
    "per round) (north star, r5)",
)
def q_corpus_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return TA.bpe_learn_merges(docs, "text", k=8)

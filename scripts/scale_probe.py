#!/usr/bin/env python
"""Scale probes (SURVEY.md §7.4 evidence): replicate each pipeline's
input N x IN-PLAN (union of shifted copies — no extra files, the scan
itself fans out) and measure wall-clock at 1x vs Nx. Sub-linear
ratios show fixed overhead amortizing and all cores engaging; the
interesting probes are the ones whose candidate/pair space grows
super-linearly (dedup, band join) — wall-clock tracking collisions,
not corpus^2, is the scale argument.

Usage: python scripts/scale_probe.py [N] (default 10; sf dir from
$SPARK_GRAFT_SF_DIR, default /root/testdata/sf0.1). Prints one JSON
line per probe.
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import reduce

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from sp500_stock_etl_spark.io.readers import load_table  # noqa: E402
from sp500_stock_etl_spark.session import get_spark  # noqa: E402


def replicate(df: DataFrame, n: int, id_cols: list[str], ts_col: str | None = None) -> DataFrame:
    """Union n copies with disjoint id spaces; optionally shift event
    time per copy so temporal density stays constant (capacity probe,
    not skew probe)."""
    copies = []
    for i in range(n):
        c = df
        for col in id_cols:
            c = c.withColumn(col, F.col(col) + F.lit(i * 100_000_000))
        if ts_col is not None:
            c = c.withColumn(
                ts_col, F.col(ts_col) + F.expr(f"INTERVAL {i * 31} DAYS")
            )
        copies.append(c)
    return reduce(lambda a, b: a.unionByName(b), copies)


def timed(df: DataFrame) -> float:
    t = time.time()
    df.write.format("noop").mode("overwrite").save()
    return round(time.time() - t, 2)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("scale-probe")

    li = load_table(spark, sf_dir, "lineitem")
    docs = load_table(spark, sf_dir, "documents")
    ev = load_table(spark, sf_dir, "events")

    from sp500_stock_etl_spark.functions.rounding import round_half_up
    from sp500_stock_etl_spark.io.readers import stock_data_from_lineitem
    from sp500_stock_etl_spark.operators.dedup import minhash_lsh_dedup
    from sp500_stock_etl_spark.operators.window_metrics import with_lag_metrics

    def window_pipeline(src: DataFrame) -> DataFrame:
        quotes = stock_data_from_lineitem(src)
        m = with_lag_metrics(
            quotes, "symbol", ["trade_date", "order_key", "line_number"],
            "close", change_col="close_change", pct_change_col="close_pct_change",
        )
        return m.withColumn(
            "daily_range", round_half_up(F.col("high") - F.col("low"), 4)
        )

    def band_join(src: DataFrame) -> DataFrame:
        p = src.where(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("pid"), F.col("user_id").alias("pu"),
            F.col("ts").alias("pts"),
        )
        f = src.select("event_id", "user_id", "ts")
        return p.join(
            f,
            (F.col("pu") == F.col("user_id"))
            & (F.col("ts") > F.col("pts"))
            & (F.col("ts") <= F.col("pts") + F.expr("INTERVAL 1 HOUR")),
        ).select("pid", "event_id")

    def rollup(src: DataFrame) -> DataFrame:
        hourly = src.groupBy(
            F.date_trunc("hour", "ts").alias("hour"), "event_type"
        ).agg(F.count(F.lit(1)).alias("n"))
        return hourly.groupBy(F.to_date("hour").alias("day"), "event_type").agg(
            F.sum("n").alias("n")
        )

    probes = {
        "flagship_window_metrics": (
            lambda k: window_pipeline(
                replicate(li, k, ["l_orderkey"]) if k > 1 else li
            )
        ),
        "minhash_lsh_dedup": (
            lambda k: minhash_lsh_dedup(
                replicate(docs, k, ["doc_id"]) if k > 1 else docs,
                "doc_id", "text",
            )
        ),
        "range_band_join": (
            lambda k: band_join(
                replicate(ev, k, ["event_id", "user_id"], "ts") if k > 1 else ev
            )
        ),
        "hierarchical_rollup": (
            lambda k: rollup(
                replicate(ev, k, ["event_id"], "ts") if k > 1 else ev
            )
        ),
    }

    # warmup
    timed(li.select(F.count(F.lit(1)).alias("n")))
    for name, build in probes.items():
        t1 = timed(build(1))
        tn = timed(build(n))
        print(json.dumps({
            "probe": name, "sf_dir": sf_dir, "n": n,
            "sec_1x": t1, "sec_nx": tn,
            "ratio": round(tn / t1, 2) if t1 > 0 else None,
        }), flush=True)

    srp_banding_probe(spark, sf_dir, n)
    lsh_topk_runtime_probe(spark, sf_dir, n)
    connected_components_probe(spark, sf_dir, n)
    streaming_dedup_ttl_probe(spark, sf_dir, n)
    bloom_prefilter_probe(spark, sf_dir, n)
    bucketed_join_probe(spark, sf_dir)
    entity_resolution_probe(spark, sf_dir, n)
    semantic_dedup_probe(spark, sf_dir, n)
    triangle_probe(spark, sf_dir, n)
    pagerank_probe(spark, sf_dir, n)
    bpe_encode_probe(spark, sf_dir, n)
    global_rank_probe(spark, sf_dir, n)
    incremental_refresh_probe(spark, sf_dir, n)
    span_dedup_probe(spark, sf_dir, n)
    calibration_probe(spark, sf_dir, n)


def codec_execute_probe(spark, sf_dir: str, n: int) -> None:
    """Round-8 probe: the two REAL codec execute stages (PNG pixel
    decode + resample, WAV PCM chunk features) at 1x vs Nx corpus
    size. Both are shuffle-free mapInPandas stages, so wall should
    scale with rows/cores — strongly sub-linear at Nx while the
    32-thread scheduler has headroom, approaching linear once tasks
    saturate. Row counts must scale exactly with the corpus (one row
    per image; one row per chunk)."""
    from sp500_stock_etl_spark.operators.multimodal import (
        jpeg_decode_features,
        mjpeg_frame_decode,
        png_resize_execute,
        synthetic_avi_corpus,
        synthetic_jpeg_corpus,
        synthetic_png_corpus,
        synthetic_wav_corpus,
        wav_pcm_chunk_features,
    )

    for name, base, build in (
        ("png_resize_execute", 48,
         lambda k: png_resize_execute(synthetic_png_corpus(spark, 48 * k))),
        ("wav_pcm_chunk_execute", 36,
         lambda k: wav_pcm_chunk_features(synthetic_wav_corpus(spark, 36 * k))),
        ("jpeg_decode_execute", 40,
         lambda k: jpeg_decode_features(synthetic_jpeg_corpus(spark, 40 * k))),
        ("mjpeg_frame_decode", 12,
         lambda k: mjpeg_frame_decode(synthetic_avi_corpus(spark, 12 * k))),
    ):
        out = {"probe": name, "sf_dir": sf_dir, "n": n, "base_rows": base}
        for tag, k in (("1x", 1), ("nx", n)):
            t = time.time()
            out[f"rows_{tag}"] = build(k).count()
            out[f"sec_{tag}"] = round(time.time() - t, 2)
        out["sec_ratio"] = round(out["sec_nx"] / max(out["sec_1x"], 0.01), 2)
        print(json.dumps(out), flush=True)



def global_rank_probe(spark, sf_dir: str, n: int) -> None:
    """Round-7 probe (r6 verdict item 4): the distributed global-rank /
    global-cumsum operators at 1x vs Nx rows. Two claims under test:
    (a) wall scales sub-linearly (the range sort is parallel), and
    (b) NO single task sees the whole frame — max rows per task of the
    ranked output stays ~total/numPartitions, where Window.orderBy
    would put 100% of rows through one task."""
    from sp500_stock_etl_spark.caching import release_caches
    from sp500_stock_etl_spark.operators.window_metrics import (
        with_global_cumsum,
        with_global_rank,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )

    def src(k: int) -> DataFrame:
        return replicate(ev, k, ["event_id"]) if k > 1 else ev

    builds = {
        "global_rank": lambda k: with_global_rank(
            src(k), ["value", "event_id"]
        ),
        "global_cumsum": lambda k: with_global_cumsum(
            src(k), ["value", "event_id"], "user_id"
        ),
    }
    for name, build in builds.items():
        t1 = timed(build(1))
        release_caches()
        dfn = build(n)
        tn = timed(dfn)
        per = (
            dfn.withColumn("__p__", F.spark_partition_id())
            .groupBy("__p__")
            .count()
            .agg(
                F.max("count").alias("mx"),
                F.sum("count").alias("tot"),
                F.count(F.lit(1)).alias("nparts"),
            )
            .collect()[0]
        )
        release_caches()
        print(json.dumps({
            "probe": name, "sf_dir": sf_dir, "n": n,
            "sec_1x": t1, "sec_nx": tn,
            "ratio": round(tn / t1, 2) if t1 > 0 else None,
            "total_rows": per["tot"],
            "max_rows_per_task": per["mx"],
            "tasks": per["nparts"],
            "max_task_fraction": round(per["mx"] / per["tot"], 4),
        }), flush=True)


def span_dedup_probe(spark, sf_dir: str, n: int) -> None:
    """Round-7 probe: winnowed exact-substring dedup at 1x vs Nx docs
    (rotated-token replicas -> independent text, constant dup rate).
    The pipeline is map-side hashing/winnowing + one count shuffle on
    fingerprints + one join, so wall must track the token stream
    linearly — never corpus^2."""
    from sp500_stock_etl_spark.caching import release_caches
    from sp500_stock_etl_spark.functions.text import tokens
    from sp500_stock_etl_spark.plans.queries_r7 import winnowed_fingerprints

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def corpus(k: int) -> DataFrame:
        copies = [docs]
        for i in range(1, k):
            copies.append(
                docs.select(
                    (F.col("doc_id") + i * 100_000_000).alias("doc_id"),
                    F.regexp_replace("text", r"(\S+)", "$1q" + str(i)).alias(
                        "text"
                    ),
                )
            )
        return reduce(lambda a, b: a.unionByName(b), copies)

    def build(k: int) -> DataFrame:
        tokd = corpus(k).select(
            "doc_id", tokens(F.col("text")).alias("toks")
        )
        sites = winnowed_fingerprints(tokd)
        freq = sites.groupBy("fp").agg(F.count(F.lit(1)).alias("n_docs"))
        return (
            sites.join(freq, "fp")
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).alias("n_fp"),
                F.sum((F.col("n_docs") > 1).cast("int")).alias("n_dup"),
            )
        )

    t1 = timed(build(1))
    release_caches()
    tn = timed(build(n))
    release_caches()
    print(json.dumps({
        "probe": "span_dedup_winnowing", "sf_dir": sf_dir, "n": n,
        "sec_1x": t1, "sec_nx": tn,
        "ratio": round(tn / t1, 2) if t1 > 0 else None,
    }), flush=True)


def incremental_refresh_probe(spark, sf_dir: str, n: int) -> None:
    """Round-7 probe (r6 verdict item 3): incremental signature-store
    refresh with the CORPUS at 1x vs Nx and a FIXED new batch. Corpus
    replicas carry distinct text (a per-replica token prefix shifts
    every shingle) so only replica-0 matches the new docs — store rows
    grow Nx while the true candidate set stays constant. The store
    build is untimed (one-off in production); the timed phase is the
    refresh itself: new-batch signatures + bucket join against the
    store + intra-batch join + candidate-pruned Jaccard verify. Claim:
    refresh wall tracks the new batch and its collisions, NOT corpus
    size — corpus signatures are never recomputed, and corpus text is
    read only in the semi-join-pruned (doc_id, text) candidate fetch."""
    from sp500_stock_etl_spark.caching import release_caches, track_persist
    from sp500_stock_etl_spark.io.writers import write_bucketed_table
    from sp500_stock_etl_spark.operators.dedup import (
        jaccard_verify,
        with_shingles,
    )
    from sp500_stock_etl_spark.plans.queries_northstar import (
        _NEARDUP_OFFSET,
        _docs_with_neardups,
    )
    from sp500_stock_etl_spark.plans.queries_r7 import (
        _INC_BUCKETS,
        _INC_JT,
        _INC_NGRAM,
        _inc_band_key_rows,
    )

    both = _docs_with_neardups(spark, sf_dir)
    corpus1 = both.where(F.col("doc_id") < _NEARDUP_OFFSET)
    new = both.where(F.col("doc_id") >= _NEARDUP_OFFSET)

    def corpus(k: int) -> DataFrame:
        # Every TOKEN gets a per-replica suffix, so every shingle of a
        # replica differs from the original's — replicas are genuinely
        # independent documents, not near-dups (a mere text prefix
        # leaves ~all shingles shared and Jaccard above threshold).
        copies = [corpus1]
        for i in range(1, k):
            copies.append(
                corpus1.select(
                    (F.col("doc_id") + i * 1_000_000_000).alias("doc_id"),
                    F.regexp_replace(
                        "text", r"(\S+)", "$1zz" + str(i)
                    ).alias("text"),
                )
            )
        return reduce(lambda a, b: a.unionByName(b), copies)

    results = {}
    for k in (1, n):
        write_bucketed_table(
            _inc_band_key_rows(corpus(k)),
            "probe_sigstore",
            "band_key",
            n_buckets=_INC_BUCKETS,
        )
        store = spark.table("probe_sigstore")
        t0 = time.time()
        new_sh = track_persist(with_shingles(new, "doc_id", "text", _INC_NGRAM))
        new_bands = track_persist(_inc_band_key_rows(new))
        cand_cn = (
            store.alias("c")
            .join(new_bands.alias("x"), "band_key")
            .select(
                F.col("c.doc_id").alias("doc_a"),
                F.col("x.doc_id").alias("doc_b"),
            )
            .distinct()
        )
        cand_nn = (
            new_bands.alias("x")
            .join(new_bands.alias("y"), "band_key")
            .where(F.col("x.doc_id") < F.col("y.doc_id"))
            .select(
                F.col("x.doc_id").alias("doc_a"),
                F.col("y.doc_id").alias("doc_b"),
            )
            .distinct()
        )
        cand = cand_cn.unionByName(cand_nn)
        cand_ids = cand_cn.select(F.col("doc_a").alias("doc_id")).distinct()
        corpus_sh = with_shingles(
            corpus(k).join(cand_ids, "doc_id", "left_semi"),
            "doc_id", "text", _INC_NGRAM,
        )
        verified = jaccard_verify(cand, corpus_sh.unionByName(new_sh), _INC_JT)
        n_pairs = verified.count()
        results[k] = (round(time.time() - t0, 2), n_pairs)
        release_caches()
        spark.sql("DROP TABLE IF EXISTS probe_sigstore")
    t1, p1 = results[1]
    tn, pn = results[n]
    print(json.dumps({
        "probe": "incremental_refresh", "sf_dir": sf_dir, "n": n,
        "sec_1x": t1, "sec_nx": tn,
        "ratio": round(tn / t1, 2) if t1 > 0 else None,
        "pairs_1x": p1, "pairs_nx": pn,
    }), flush=True)


def lsh_topk_runtime_probe(spark, sf_dir: str, n: int) -> None:
    """Wall-clock for the round-4 pair-dedup-then-score lsh_topk at 1×
    vs N× corpus (rotated replicas — independent vectors, see
    srp_banding_probe). The claim under test: with signatures one
    Arrow matmul and the bucket join carrying ids only, runtime tracks
    candidate collisions (∝ N at scaled r), not corpus × signature
    cost — the regression the round-3 layout had."""
    from sp500_stock_etl_spark.operators.similarity import lsh_topk, srp_params_for

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def rotated(k: int) -> DataFrame:
        copies = []
        for i in range(k):
            shift = i % 63 + 1 if i else 0
            c = emb.select(
                (F.col("vec_id") + F.lit(i * 100_000_000)).alias("vec_id"),
                (
                    F.concat(
                        F.slice("embedding", shift + 1, 64 - shift),
                        F.slice("embedding", 1, shift),
                    )
                    if shift
                    else F.col("embedding")
                ).alias("embedding"),
            )
            copies.append(c)
        return reduce(lambda a, b: a.unionByName(b), copies)

    n_1x = emb.count()
    out = {"probe": "lsh_topk_runtime", "sf_dir": sf_dir, "n": n,
           "n_vectors_1x": n_1x, "n_vectors_nx": n_1x * n}
    for scale, k in (("1x", 1), ("nx", n)):
        corpus = rotated(k)
        queries = corpus.where(F.col("vec_id") % 100 == 0).where(
            F.col("vec_id") < 1_000_000
        ).select(F.col("vec_id").alias("query_id"), "embedding")
        r = srp_params_for(n_1x * k)
        best = None
        for _ in range(2):
            t = timed(lsh_topk(queries, corpus, k=10, planes=r, bands=4))
            best = t if best is None else min(best, t)
        out[f"sec_{scale}"] = best
        out[f"r_{scale}"] = r
    out["ratio"] = round(out["sec_nx"] / max(out["sec_1x"], 0.01), 2)
    print(json.dumps(out), flush=True)


def srp_banding_probe(spark, sf_dir: str, n: int) -> None:
    """Candidate-count evidence for the banded SRP layout (round-2
    verdict item 2): with the plane count FIXED, bucket population —
    and so the bucket self-join's candidate pairs — grows ∝ N²/2^r;
    with r sized by srp_params_for(N), expected bucket population is
    pinned near target_bucket and candidates stay ∝ N · collisions.
    Copies are circularly ROTATED (not duplicated) so each replica
    behaves as an independent random vector w.r.t. the hyperplanes —
    exact duplicates would collide in every band by construction and
    measure the planted-dup rate, not the background collision rate."""
    from sp500_stock_etl_spark.operators.similarity import (
        srp_band_rows,
        srp_params_for,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def rotated(k: int) -> DataFrame:
        copies = []
        for i in range(k):
            shift = i % 63 + 1 if i else 0
            c = emb.select(
                (F.col("vec_id") + F.lit(i * 100_000_000)).alias("vec_id"),
                (
                    F.concat(
                        F.slice("embedding", shift + 1, 64 - shift),
                        F.slice("embedding", 1, shift),
                    )
                    if shift
                    else F.col("embedding")
                ).alias("embedding"),
            )
            copies.append(c)
        return reduce(lambda a, b: a.unionByName(b), copies)

    n_1x = emb.count()
    bands = 4
    out = {"probe": "srp_banding_candidates", "sf_dir": sf_dir, "n": n,
           "bands": bands, "n_vectors_1x": n_1x, "n_vectors_nx": n_1x * n}
    for label, r_of in (
        ("fixed_r8", lambda nv: 8),
        ("scaled_r", lambda nv: srp_params_for(nv)),
    ):
        for scale, k in (("1x", 1), ("nx", n)):
            src = rotated(k)
            r = r_of(n_1x * k)
            rows = srp_band_rows(
                src, "id_a", "va", "vec_id", "embedding", bands, r
            ).select("id_a", "band", "sig")
            cand = (
                rows.join(
                    rows.select(
                        F.col("id_a").alias("id_b"), "band", "sig"
                    ),
                    ["band", "sig"],
                )
                .where(F.col("id_a") < F.col("id_b"))
                .select("id_a", "id_b")
                .distinct()
                .count()
            )
            out[f"{label}_{scale}"] = {"r": r, "candidates": cand}
        f, x = out[f"{label}_1x"], out[f"{label}_nx"]
        out[f"{label}_growth"] = round(x["candidates"] / max(f["candidates"], 1), 1)
    print(json.dumps(out), flush=True)


def connected_components_probe(spark, sf_dir: str, n: int) -> None:
    """Round-4 verdict item 8, first half: the iterative
    min-label-propagation operator at 1× vs N× EDGES (disjoint
    fingerprint spaces per replica — component diameter constant, so
    the round count is constant and cost is per-round join volume),
    plus a DEPTH probe on a synthetic path graph (rounds ∝ diameter —
    the documented cost model; the per-replica suffix keeps capacity
    replicas from merging into one long chain)."""
    from pyspark.sql import Window as W

    from sp500_stock_etl_spark.functions.text import norm_text
    from sp500_stock_etl_spark.operators.dedup import connected_components

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def edges_of(k: int) -> DataFrame:
        # Each replica plants its own duplicate groups (exact copies of
        # every 3rd / 6th doc, like the registry query) inside a
        # disjoint id+text space, so k× replicas = k× edges at the
        # same per-component diameter.
        copies = []
        for i in range(k):
            rep = docs.select(
                (F.col("doc_id") + F.lit(i * 100_000_000)).alias("doc_id"),
                F.concat(F.col("text"), F.lit(f" replica{i}")).alias("text"),
            )
            copies.append(rep)
            copies.append(
                rep.where(F.col("doc_id") % 3 == 0).select(
                    (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
                )
            )
            copies.append(
                rep.where(F.col("doc_id") % 6 == 0).select(
                    (F.col("doc_id") + 20_000_000).alias("doc_id"), "text"
                )
            )
        base = reduce(lambda a, b: a.unionByName(b), copies)
        fp = base.select(
            "doc_id", F.md5(norm_text(F.col("text"))).alias("f")
        )
        w = W.partitionBy("f").orderBy("doc_id")
        return (
            fp.withColumn("nxt", F.lead("doc_id").over(w))
            .where(F.col("nxt").isNotNull())
            .select(F.col("doc_id").alias("src"), F.col("nxt").alias("dst"))
        )

    out = {"probe": "connected_components", "sf_dir": sf_dir, "n": n}
    for tag, k in (("1x", 1), ("nx", n)):
        t = time.time()
        cnt = connected_components(edges_of(k)).count()
        out[f"sec_{tag}"] = round(time.time() - t, 2)
        out[f"nodes_{tag}"] = cnt
    out["ratio"] = round(out["sec_nx"] / max(out["sec_1x"], 0.01), 2)

    # Depth: a path graph of length L needs ~L propagation rounds (the
    # min label walks one hop per round). Cost should scale with
    # rounds, not explode — and past max_iter the operator now raises
    # instead of returning split clusters.
    from sp500_stock_etl_spark.operators.dedup import (
        connected_components_star,
    )

    for depth in (10, 10 * n):
        path = spark.range(depth).select(
            F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
        )
        t = time.time()
        connected_components(path, max_iter=depth + 2).count()
        out[f"sec_depth_{depth}"] = round(time.time() - t, 2)
        # The deep-graph variant: O(log^2) star-contraction rounds —
        # should be near-FLAT in depth where propagation is linear.
        t = time.time()
        connected_components_star(path, max_iter=30).count()
        out[f"sec_star_depth_{depth}"] = round(time.time() - t, 2)
    out["depth_ratio"] = round(
        out[f"sec_depth_{10 * n}"] / max(out["sec_depth_10"], 0.01), 2
    )
    out["star_depth_ratio"] = round(
        out[f"sec_star_depth_{10 * n}"]
        / max(out["sec_star_depth_10"], 0.01),
        2,
    )
    print(json.dumps(out), flush=True)


def streaming_dedup_ttl_probe(spark, sf_dir: str, n: int) -> None:
    """Round-4 verdict item 8, second half: the bounded-state
    streaming dedup (dropDuplicatesWithinWatermark on hour-bucketed
    keys) at 1× vs N× KEY CARDINALITY (user_id space replicated
    disjointly). Wall should track rows/keys ~linearly — the state
    store holds only keys inside the watermark horizon either way, so
    no super-linear state blowup appears."""
    import shutil
    import tempfile

    from sp500_stock_etl_spark.streaming import events as SE

    ev = load_table(spark, sf_dir, "events")
    out = {"probe": "streaming_dedup_keys_ttl", "sf_dir": sf_dir, "n": n}
    for tag, k in (("1x", 1), ("nx", n)):
        copies = []
        for i in range(k):
            copies.append(
                ev.withColumn(
                    "user_id", F.col("user_id") + F.lit(i * 100_000_000)
                ).withColumn(
                    "event_id", F.col("event_id") + F.lit(i * 100_000_000)
                )
            )
        staged = tempfile.mkdtemp(prefix="sg_ttl_probe_")
        reduce(lambda a, b: a.unionByName(b), copies).write.mode(
            "overwrite"
        ).parquet(staged)
        stream = SE.read_event_stream(spark, staged)
        deduped = (
            stream.withColumn("hour_start", F.date_trunc("hour", "ts"))
            .withWatermark("hour_start", "2 hours")
            .dropDuplicatesWithinWatermark(
                ["user_id", "event_type", "hour_start"]
            )
            .select("user_id", "event_type", "hour_start")
        )
        name = f"ttl_probe_{tag}"
        t = time.time()
        SE.run_available_now(
            deduped, tempfile.mkdtemp(prefix="sg_ckpt_"), name, "append"
        )
        rows = spark.table(name).count()
        out[f"sec_{tag}"] = round(time.time() - t, 2)
        out[f"rows_{tag}"] = rows
        shutil.rmtree(staged, ignore_errors=True)
    out["ratio"] = round(out["sec_nx"] / max(out["sec_1x"], 0.01), 2)
    print(json.dumps(out), flush=True)


def bloom_prefilter_probe(spark, sf_dir: str, n: int) -> None:
    """Round-5 probe: the Bloom-prefiltered decontamination path after
    the expression-blowup fix. Probe side (the training corpus) grows
    n x while the eval gram set — and therefore the broadcast bitmap —
    stays FIXED, which is exactly the production shape: probe cost
    must track corpus volume linearly, bitmap cost not at all."""
    from sp500_stock_etl_spark.operators.dedup import with_shingles
    from sp500_stock_etl_spark.operators.joins import bloom_semi_prefilter

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    eval_grams = (
        with_shingles(docs.where(F.col("doc_id") % 50 == 0), "doc_id", "text", 8)
        .select(F.explode("shingles").alias("gram"))
        .distinct()
    )
    out = {"probe": "bloom_prefilter_decontamination", "sf_dir": sf_dir, "n": n}
    for tag, k in (("1x", 1), ("nx", n)):
        corpus = replicate(docs, k, ["doc_id"]) if k > 1 else docs
        grams = with_shingles(corpus, "doc_id", "text", 8).select(
            "doc_id", F.explode("shingles").alias("gram")
        )
        surv = bloom_semi_prefilter(grams, "gram", eval_grams, "gram")
        t = time.time()
        rows = surv.count()
        out[f"sec_{tag}"] = round(time.time() - t, 2)
        out[f"rows_{tag}"] = rows
    out["ratio"] = round(out["sec_nx"] / max(out["sec_1x"], 0.01), 2)
    print(json.dumps(out), flush=True)


def bucketed_join_probe(spark, sf_dir: str) -> None:
    """Round-5 probe: steady-state read-side cost of the fact-fact
    join over plain parquet (both sides shuffle + sort into the SMJ)
    vs the SAME join over pre-bucketed sorted tables (zero exchanges —
    tests/test_scale_plans.py pins the plan shape). The write cost is
    excluded on purpose: a warehouse pays bucketing once per load and
    re-joins many times, so the read-side delta is the number that
    compounds at 100 TB."""
    import tempfile

    from sp500_stock_etl_spark.io.writers import write_bucketed_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    od = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    base = tempfile.mkdtemp(prefix="sg_bkt_probe_")
    write_bucketed_table(li, "sg_probe_li", "l_orderkey", 8, base + "/li")
    write_bucketed_table(od, "sg_probe_od", "o_orderkey", 8, base + "/od")
    # Restore the session's explicit value afterwards, not the build
    # default (unset would lose any caller-configured threshold).
    try:
        prev_abt = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    except Exception:
        prev_abt = None
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plain = li.join(od, F.col("l_orderkey") == F.col("o_orderkey"))
        bkt = spark.table("sg_probe_li").join(
            spark.table("sg_probe_od"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        out = {"probe": "bucketed_vs_shuffle_join", "sf_dir": sf_dir}
        for tag, df in (("shuffle", plain), ("bucketed", bkt)):
            df.count()  # warm file listing / page cache
            t = time.time()
            for _ in range(3):
                df.count()
            out[f"sec3_{tag}"] = round(time.time() - t, 2)
        out["speedup"] = round(
            out["sec3_shuffle"] / max(out["sec3_bucketed"], 0.01), 2
        )
        print(json.dumps(out), flush=True)
    finally:
        if prev_abt is None:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        else:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_abt)
        spark.sql("DROP TABLE IF EXISTS sg_probe_li")
        spark.sql("DROP TABLE IF EXISTS sg_probe_od")


def pagerank_probe(spark, sf_dir: str, n: int) -> None:
    """Round-6 probe: integer PageRank at 1x vs Nx nodes. Replicated
    node ids keep the hash-target graph ~3-out-regular, so nodes AND
    edges grow Nx — per-iteration cost (one edge join + one groupBy)
    must track linearly; the cached edge list keeps the scan count at
    one regardless of iteration count."""
    from sp500_stock_etl_spark.plans.queries_r6 import pagerank_scores

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    base_n = docs.count()
    out = {"probe": "pagerank", "sf_dir": sf_dir, "n": n}
    for tag, k in (("1x", 1), ("nx", n)):
        # Contiguous renumbering (shift by base_n, not the generic
        # 100M id-space shift): the hash-target construction assumes
        # ids 0..N-1, and a sparse id space would send most
        # contributions to nonexistent nodes.
        copies = [
            docs.select((F.col("doc_id") + i * base_n).alias("doc_id"))
            for i in range(k)
        ]
        src = reduce(lambda a, b: a.unionByName(b), copies)
        t = time.time()
        out[f"rows_{tag}"] = pagerank_scores(src).count()
        out[f"sec_{tag}"] = round(time.time() - t, 2)
    out["sec_ratio"] = round(out["sec_nx"] / max(out["sec_1x"], 0.01), 2)
    print(json.dumps(out), flush=True)


def bpe_encode_probe(spark, sf_dir: str, n: int) -> None:
    """Round-6 probe: BPE ENCODE at 1x vs Nx docs with a fixed merge
    table. The encoder folds over the DISTINCT-WORD vocabulary and
    broadcast-joins encodings back, so the expensive fold stage is
    constant in corpus size (replicas share the synthetic vocabulary)
    and only the token-stream join grows — wall must be strongly
    sub-linear. The per-occurrence first cut scaled with the token
    stream instead (~6x slower already at 1x)."""
    from sp500_stock_etl_spark.operators.text_analysis import (
        bpe_encode,
        bpe_learn_merges,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    merges = [
        (r["left"], r["right"])
        for r in bpe_learn_merges(docs, "text", k=8).collect()
    ]
    out = {"probe": "bpe_encode", "sf_dir": sf_dir, "n": n,
           "n_merges": len(merges)}
    for tag, k in (("1x", 1), ("nx", n)):
        src = replicate(docs, k, ["doc_id"]) if k > 1 else docs
        t = time.time()
        out[f"rows_{tag}"] = bpe_encode(src, merges).count()
        out[f"sec_{tag}"] = round(time.time() - t, 2)
    out["sec_ratio"] = round(out["sec_nx"] / max(out["sec_1x"], 0.01), 2)
    print(json.dumps(out), flush=True)


def entity_resolution_probe(spark, sf_dir: str, n: int) -> None:
    """Round-6 probe (round-5 verdict item 4): candidate-pair volume
    of the deletion-neighborhood ER blocking at 1x vs Nx corpus.
    Replicas get DISTINCT names regenerated from their shifted keys
    (replicating identical names would plant n^2 true duplicates and
    measure the data, not the blocking). The claim under test: with
    near-unique variant keys, candidate pairs grow ~linearly with the
    corpus — the r5 (nation, segment)-only blocking grew them
    quadratically (~125 distinct blocks)."""
    from sp500_stock_etl_spark.plans.queries_extensions import (
        er_candidate_pairs,
    )

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )

    def corpus(k: int) -> DataFrame:
        # md5-derived name digits: sequential digits would make every
        # cross-replica key pair a genuine distance-1 match (names
        # differing only in the leading replica digit), planting n^2
        # TRUE duplicates and measuring the data instead of the
        # blocking. With random hex digits the only systematic
        # duplicates are the planted one-edit copies (~corpus/20).
        c = (replicate(cust, k, ["c_custkey"]) if k > 1 else cust).withColumn(
            "c_name",
            F.concat(
                F.lit("Customer#"),
                F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 9),
            ),
        )
        dirty = c.where(F.col("c_custkey") % 20 == 0).select(
            (F.col("c_custkey") + F.lit(1_000_000)).alias("c_custkey"),
            "c_nationkey",
            "c_mktsegment",
            F.concat(
                F.substring("c_name", 1, 9),
                F.lit("x"),
                F.expr("substr(c_name, 11)"),
            ).alias("c_name"),
        )
        return c.unionByName(dirty)

    out = {"probe": "entity_resolution_candidates", "sf_dir": sf_dir, "n": n}
    for tag, k in (("1x", 1), ("nx", n)):
        t = time.time()
        pairs = er_candidate_pairs(corpus(k)).count()
        out[f"sec_{tag}"] = round(time.time() - t, 2)
        out[f"pairs_{tag}"] = pairs
    out["pair_ratio"] = round(out["pairs_nx"] / max(out["pairs_1x"], 1), 2)
    out["sec_ratio"] = round(out["sec_nx"] / max(out["sec_1x"], 0.01), 2)
    print(json.dumps(out), flush=True)


def semantic_dedup_probe(spark, sf_dir: str, n: int) -> None:
    """Round-6 probe (round-5 verdict item 7): SemDeDup's per-cell
    quadratic under the k ~ sqrt(N) cell policy. Nx vectors are spread
    over ~sqrt(N)x cells (label shifted by replica % ceil(sqrt(n))),
    so cell SIZE grows sqrt(N)x and total pair work N^1.5 — the
    documented scale claim for dedup_semantic_clusters. Wall-clock at
    Nx should track the N^1.5 pair model (printed as `model_ratio`),
    not N^2."""
    import math

    from sp500_stock_etl_spark.operators import similarity as S

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.transform("embedding", lambda v: v.cast("double")).alias("v")
    )
    groups = max(1, math.isqrt(n))

    def cells(k: int) -> DataFrame:
        copies = []
        for i in range(k):
            copies.append(
                emb.select(
                    (F.col("vec_id") + F.lit(i * 100_000_000)).alias("vec_id"),
                    # replica -> one of ~sqrt(n) label spaces
                    (F.col("label") + F.lit((i % groups) * 1_000_000)).alias(
                        "label"
                    ),
                    "v",
                )
            )
        return reduce(lambda a, b: a.unionByName(b), copies)

    def score(src: DataFrame) -> DataFrame:
        normed = src.withColumn("__n__", S.norm(F.col("v"))).select(
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
        return (
            a.join(b, "label")
            .where(F.col("a_id") < F.col("vid"))
            .select("vid", S.dot(F.col("av"), F.col("bv")).alias("c"))
            .where(F.col("c") >= 0.9)
            .groupBy("vid")
            .agg(F.count(F.lit(1)).alias("n_dups"))
        )

    out = {
        "probe": "semantic_dedup_cells",
        "sf_dir": sf_dir,
        "n": n,
        "cell_groups_nx": groups,
        # pair-work model: cells x size^2 => (g) * (n/g)^2 = n^2/g ~ n^1.5
        "model_ratio": round(n * n / groups, 1),
    }
    for tag, k in (("1x", 1), ("nx", n)):
        t = time.time()
        score(cells(k)).write.format("noop").mode("overwrite").save()
        out[f"sec_{tag}"] = round(time.time() - t, 2)
    out["sec_ratio"] = round(out["sec_nx"] / max(out["sec_1x"], 0.01), 2)
    print(json.dumps(out), flush=True)


def triangle_probe(spark, sf_dir: str, n: int) -> None:
    """Round-6 probe (round-5 verdict item 7): degree-ordered triangle
    enumeration at 1x vs Nx orders. Replicas shift BOTH orderkey and
    partkey, so the graph becomes n disjoint copies — edges and
    triangles grow exactly linearly, and the claim under test is that
    wall-clock follows (the orientation bounds wedge fan-out at
    O(sqrt E) per node regardless of copies)."""
    from sp500_stock_etl_spark.operators.graph import enumerate_triangles

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    out = {"probe": "triangle_enumeration", "sf_dir": sf_dir, "n": n}
    for tag, k in (("1x", 1), ("nx", n)):
        src = (
            replicate(li, k, ["l_orderkey", "l_partkey"]) if k > 1 else li
        )
        items = src.distinct()
        a = items.select("l_orderkey", F.col("l_partkey").alias("pu"))
        b = items.select("l_orderkey", F.col("l_partkey").alias("pv"))
        edges = (
            a.join(b, "l_orderkey")
            .where(F.col("pu") < F.col("pv"))
            .groupBy("pu", "pv")
            .agg(F.count(F.lit(1)).alias("s"))
            .where(F.col("s") >= 2)
            .select(F.col("pu").alias("u"), F.col("pv").alias("v"))
        )
        t = time.time()
        tri = enumerate_triangles(edges).count()
        out[f"sec_{tag}"] = round(time.time() - t, 2)
        out[f"triangles_{tag}"] = tri
    out["sec_ratio"] = round(out["sec_nx"] / max(out["sec_1x"], 0.01), 2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()


def calibration_probe(spark, sf_dir: str, n: int) -> None:
    """Late-r8 probe: per-domain threshold calibration at 1x vs Nx
    corpus. Two exact invariants under N-plication of every document
    (doc_id shifted, source kept): (a) each domain's threshold VALUE
    is unchanged — the k = 3m/10 + 1 order statistic of an N-duplicated
    multiset lands on the same element (ceil(k_N / N) == k_1 for any
    N, m); (b) kept counts scale EXACTLY N-fold (the keep rule is
    value-based, not rank-based). Wall tracks the per-domain sort,
    which distributes across domains."""
    from sp500_stock_etl_spark.plans.queries_r8 import q_quality_calibration

    docs = load_table(spark, sf_dir, "documents")

    def run(k: int):
        if k == 1:
            src = docs
        else:
            src = replicate(docs, k, ["doc_id"])
        src.createOrReplaceTempView("__calib_probe_docs__")
        # reuse the registered plan body over the replicated frame
        from sp500_stock_etl_spark.plans.queries_r8 import classifier_scores
        from pyspark.sql import Window

        scores = classifier_scores(
            src.select("doc_id", "source", "text"), carry=("source",)
        ).select("source", "doc_id", "logit_micro", "keep")
        ranked = scores.select(
            "source",
            "logit_micro",
            "keep",
            F.row_number()
            .over(
                Window.partitionBy("source").orderBy(
                    F.asc("logit_micro"), F.asc("doc_id")
                )
            )
            .alias("rnk"),
            F.count(F.lit(1)).over(Window.partitionBy("source")).alias("m"),
        )
        thr = ranked.where(F.col("rnk") == F.expr("3 * m div 10 + 1")).select(
            "source", F.col("logit_micro").alias("thr")
        )
        joined = ranked.join(F.broadcast(thr), "source")
        return joined.groupBy("source").agg(
            F.max("thr").alias("thr"),
            F.sum((F.col("logit_micro") >= F.col("thr")).cast("bigint")).alias(
                "kept"
            ),
        )

    out = {"probe": "quality_threshold_calibration", "sf_dir": sf_dir, "n": n}
    t = time.time()
    r1 = {r["source"]: (r["thr"], r["kept"]) for r in run(1).collect()}
    out["sec_1x"] = round(time.time() - t, 2)
    t = time.time()
    rn = {r["source"]: (r["thr"], r["kept"]) for r in run(n).collect()}
    out["sec_nx"] = round(time.time() - t, 2)
    out["sec_ratio"] = round(out["sec_nx"] / max(out["sec_1x"], 0.01), 2)
    out["thresholds_invariant"] = all(
        rn[s][0] == r1[s][0] for s in r1
    )
    out["kept_exact_nfold"] = all(rn[s][1] == n * r1[s][1] for s in r1)
    print(json.dumps(out), flush=True)


def indicator_fold_probe(spark, sf_dir: str, n: int) -> None:
    """Late-r8 probe: the two sequential-fold indicators (fixed-point
    EWMA and the SMA-crossover backtest) under symbol-space
    N-plication — the realistic 100 TB growth axis (more symbols,
    same series length). Two checks: (a) wall stays ~flat per symbol
    (the folds are embarrassingly parallel across symbols; no stage
    depends on symbol count); (b) results are EXACTLY invariant —
    every replica symbol carries the original's series, so the
    distinct (result-tuple -> count) histogram at Nx must be the 1x
    histogram with every count multiplied by N."""
    from sp500_stock_etl_spark.plans.queries_indicators import (
        _stock,
        backtest_frame,
        ewma_fold_frame,
    )

    li = load_table(spark, sf_dir, "lineitem")

    def stock_of(k: int) -> DataFrame:
        src = li if k == 1 else replicate(li, k, ["l_partkey"])
        return src.select(
            F.col("l_partkey").alias("symbol"),
            F.to_date("l_shipdate").alias("trade_date"),
            F.col("l_orderkey").alias("order_key"),
            F.col("l_linenumber").alias("line_number"),
            F.floor(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
        )

    out = {"probe": "indicator_folds", "sf_dir": sf_dir, "n": n}
    for tag, frame_fn, cols in (
        ("ewma", ewma_fold_frame, ["ewma_final", "ewma_sum", "n_obs"]),
        (
            "backtest",
            backtest_frame,
            ["realized_pnl_cents", "n_trades", "final_pos", "unrealized_cents"],
        ),
    ):
        t = time.time()
        h1 = {
            tuple(r[c] for c in cols): r["cnt"]
            for r in frame_fn(stock_of(1))
            .groupBy(*cols)
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }
        out[f"{tag}_sec_1x"] = round(time.time() - t, 2)
        t = time.time()
        hn = {
            tuple(r[c] for c in cols): r["cnt"]
            for r in frame_fn(stock_of(n))
            .groupBy(*cols)
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }
        out[f"{tag}_sec_nx"] = round(time.time() - t, 2)
        out[f"{tag}_sec_ratio"] = round(
            out[f"{tag}_sec_nx"] / max(out[f"{tag}_sec_1x"], 0.01), 2
        )
        out[f"{tag}_exact_nfold"] = hn == {k: n * v for k, v in h1.items()}
    print(json.dumps(out), flush=True)


def cdc_apply_probe(spark, sf_dir: str, n: int) -> None:
    """Late-r8 probe: the foreachBatch CDC merge under event-stream
    N-plication (disjoint event_id spaces, same timeline — a denser
    change feed over the same 256-key device space, i.e. the capacity
    axis: more writes per key, same store width). Checks: (a) the
    final store is BIT-EQUAL to the batch last-write-per-key rollup
    of the replicated feed (the CDC invariant must survive load),
    (b) wall ratio vs 1x — per-batch merge cost is driven by the
    batch + the 256-row store, so the ratio should track the input
    ratio (shuffle volume), never the store count."""
    import shutil as _sh
    import tempfile as _tf

    from pyspark.sql import Window

    from sp500_stock_etl_spark.plans.queries_streaming import (
        q_streaming_cdc_upsert,
    )

    ev = load_table(spark, sf_dir, "events")
    out = {"probe": "cdc_apply", "sf_dir": sf_dir, "n": n}

    for tag, k in (("1x", 1), ("nx", n)):
        src = ev if k == 1 else replicate(ev, k, ["event_id"])
        d = _tf.mkdtemp(prefix=f"sg_cdcprobe_{tag}_")
        src.write.mode("overwrite").parquet(f"{d}/events.parquet")
        t = time.time()
        got = q_streaming_cdc_upsert(spark, d).collect()
        out[f"sec_{tag}"] = round(time.time() - t, 2)
        w = Window.partitionBy("device_id").orderBy(
            F.col("ts").desc(), F.col("event_id").desc()
        )
        exp = (
            spark.read.parquet(f"{d}/events.parquet")
            .select(
                F.expr(
                    "((event_id * 2654435761) % 4294967296) div 16777216"
                ).alias("device_id"),
                "ts",
                "event_id",
                "value",
            )
            .withColumn("rn", F.row_number().over(w))
            .where("rn = 1")
            .select(
                "device_id",
                F.unix_millis("ts").alias("last_ms"),
                F.floor(F.col("value") * 100).cast("bigint").alias("last_cents"),
            )
            .collect()
        )
        out[f"rows_{tag}"] = len(got)
        out[f"exact_{tag}"] = sorted(map(tuple, got)) == sorted(map(tuple, exp))
        _sh.rmtree(d, ignore_errors=True)
    out["sec_ratio"] = round(out["sec_nx"] / max(out["sec_1x"], 0.01), 2)
    print(json.dumps(out), flush=True)


def indicator_skew_probe(spark, sf_dir: str, k: int) -> None:
    """Late-r8 probe: the indicator window pipelines under DEPTH skew
    — one hot symbol carries k x the rows while every other key stays
    flat. Per-key window work is inherently sequential (a window
    cannot be salted without changing semantics), so a k x -deep key
    makes one task do k x the frame arithmetic; the design defense is
    the DOMAIN bound (a price series is capped by trading days,
    ~10^4 rows — depth skew is bounded, breadth is the growth axis,
    probed by indicator_fold_probe). This probe MEASURES the
    straggler effect honestly: wall ratio vs 1x, the hot partition's
    row share, and bit-equality of every non-hot symbol's result row
    (a straggling key must never perturb its neighbors)."""
    from sp500_stock_etl_spark.plans.queries_indicators import q_bollinger

    li = load_table(spark, sf_dir, "lineitem")
    hot = li.select(F.min("l_partkey").alias("k")).collect()[0]["k"]

    def stock_of(deep: bool) -> DataFrame:
        if not deep:
            return li
        hot_extra = (
            li.where(F.col("l_partkey") == hot)
            .withColumn("__i__", F.explode(F.expr(f"sequence(1, {k - 1})")))
            .withColumn(
                "l_orderkey",
                F.col("l_orderkey") + F.col("__i__") * F.lit(100_000_000),
            )
            .drop("__i__")
        )
        return li.unionByName(hot_extra)

    import tempfile as _tf
    import shutil as _sh

    out = {"probe": "indicator_depth_skew", "sf_dir": sf_dir, "k": k,
           "hot_symbol": hot}
    results = {}
    for tag, deep in (("1x", False), ("kx", True)):
        d = _tf.mkdtemp(prefix=f"sg_skewprobe_{tag}_")
        stock_of(deep).write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
        staged = spark.read.parquet(f"{d}/lineitem.parquet")
        if deep:
            # MEASURED hot share over the staged input (not an
            # estimate — partkey row counts are not uniform).
            counts = staged.agg(
                F.count(F.lit(1)).alias("tot"),
                F.sum(
                    F.when(F.col("l_partkey") == hot, 1).otherwise(0)
                ).alias("hot_rows"),
            ).collect()[0]
            out["hot_rows_share"] = round(counts["hot_rows"] / counts["tot"], 4)
            out["hot_rows"] = counts["hot_rows"]
        t = time.time()
        rows = q_bollinger(spark, d).collect()
        out[f"sec_{tag}"] = round(time.time() - t, 2)
        results[tag] = {r["symbol"]: tuple(r)[1:] for r in rows}
        _sh.rmtree(d, ignore_errors=True)
    out["sec_ratio"] = round(out["sec_kx"] / max(out["sec_1x"], 0.01), 2)
    cold = {s: v for s, v in results["1x"].items() if s != hot}
    deep = {s: v for s, v in results["kx"].items() if s != hot}
    out["non_hot_bit_equal"] = cold == deep
    print(json.dumps(out), flush=True)

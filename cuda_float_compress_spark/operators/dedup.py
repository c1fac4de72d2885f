"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Design for 100 TB: every variant reduces to hash -> shuffle-on-small-key ->
per-bucket work. Signatures are computed JVM-side with built-in expressions
where possible (MinHash = array_min over hashed shingles — no Python);
SimHash uses one vectorized pandas UDF (bit-majority needs numpy). Candidate
generation NEVER self-joins raw text — only compact (id, bucket) pairs
shuffle, and bucket sizes are bounded by construction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cuda_float_compress_spark.operators.text import shingles_col


# --- exact dedup -------------------------------------------------------------


def exact_dedup(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Keep the min-id representative of each exact text group (hash-groupBy;
    the md5 keeps the shuffle key small — never shuffles full documents)."""
    h = F.md5(F.col(text_col)).alias("text_md5")
    return (
        df.select(F.col(id_col), h)
        .groupBy("text_md5")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("group_size"))
    )


def exact_dup_groups(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    g = exact_dedup(df, id_col, text_col)
    return g.filter(F.col("group_size") > 1)


# --- MinHash + LSH -----------------------------------------------------------


def minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    n_hashes: int = 16,
    shingle_k: int = 5,
) -> DataFrame:
    """Adds ``minhash: array<bigint>``. Shingles are string-hashed ONCE
    (the expensive pass over text bytes), then each of the n_hashes
    components re-hashes the int64 — min over xxhash64(xxhash64(shingle),
    seed_i). All JVM expressions, one string pass instead of n_hashes."""
    sh = shingles_col(F.col(text_col), shingle_k)
    # materialize the hashed-shingle array in its own projection so the
    # n_hashes component expressions reuse it instead of re-hashing strings
    with_base = df.withColumn("__shingle_hashes", F.transform(sh, lambda s: F.xxhash64(s)))
    comps = [
        F.array_min(
            F.transform(F.col("__shingle_hashes"), lambda h, i=i: F.xxhash64(h, F.lit(i)))
        )
        for i in range(n_hashes)
    ]
    return with_base.withColumn("minhash", F.array(*comps)).drop("__shingle_hashes")


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 5,
    threshold: float = 0.7,
) -> DataFrame:
    """Candidate duplicate pairs via banding: equal band-hash -> candidate;
    estimated Jaccard = matching minhash fraction; filter >= threshold.

    Scale: the only shuffle is groupBy(band, band_hash) over (id, signature)
    rows — tiny compared to the corpus. Hot buckets (boilerplate) are capped
    per-bucket to bound the quadratic pair expansion.
    """
    rows_per_band = n_hashes // bands
    sig = minhash_signature(df, text_col, n_hashes, shingle_k).select(
        F.col(id_col).alias("id"), "minhash"
    )
    band_cols = [
        F.xxhash64(
            F.slice(F.col("minhash"), 1 + b * rows_per_band, rows_per_band)
        ).alias(f"band_{b}")
        for b in range(bands)
    ]
    banded = sig.select("id", "minhash", *band_cols)
    stack = F.array(
        *[
            F.struct(F.lit(b).alias("band"), F.col(f"band_{b}").alias("bh"))
            for b in range(bands)
        ]
    )
    exploded = banded.select(
        "id", "minhash", F.explode(stack).alias("bb")
    ).select("id", "minhash", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))
    # bucket-join: pair ids sharing a (band, band_hash); cap bucket fan-out
    bucketed = exploded.groupBy("band", "bh").agg(
        F.slice(F.sort_array(F.collect_list(F.struct("id", "minhash"))), 1, 64).alias(
            "members"
        )
    )
    pairs = (
        bucketed.filter(F.size("members") > 1)
        .select(
            F.explode(
                F.filter(
                    F.flatten(
                        F.transform(
                            F.col("members"),
                            lambda a: F.transform(
                                F.col("members"),
                                lambda b: F.struct(
                                    a["id"].alias("id_a"),
                                    b["id"].alias("id_b"),
                                    a["minhash"].alias("mh_a"),
                                    b["minhash"].alias("mh_b"),
                                ),
                            ),
                        )
                    ),
                    lambda p: p["id_a"] < p["id_b"],
                )
            ).alias("p")
        )
        .select("p.id_a", "p.id_b", "p.mh_a", "p.mh_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    est = (
        F.size(
            F.filter(
                F.zip_with(F.col("mh_a"), F.col("mh_b"), lambda x, y: x == y),
                lambda eq: eq,
            )
        ).cast("double")
        / F.lit(float(n_hashes))
    )
    return (
        pairs.withColumn("est_jaccard", F.round(est, 6))
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


# --- n-gram Jaccard (exact, for candidate verification) ----------------------


def ngram_jaccard_pairs(
    df: DataFrame, candidates: DataFrame, id_col: str, text_col: str = "text",
    shingle_k: int = 5,
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate (id_a, id_b) pairs. Joins the
    (small) candidate set back to texts — broadcast when it fits."""
    sh = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(shingles_col(F.col(text_col), shingle_k)).alias("sh"),
    )
    a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    j = candidates.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return j.select(
        "id_a",
        "id_b",
        F.round(inter.cast("double") / F.greatest(union, F.lit(1)), 6).alias("jaccard"),
    )


# --- SimHash ------------------------------------------------------------------


@F.pandas_udf(T.LongType())
def _simhash64(texts: pd.Series) -> pd.Series:
    """64-bit SimHash over whitespace tokens (vectorized numpy bit-majority).
    Deterministic: token hash = splitmix64 of the token's UTF-8 bytes."""

    def h64(tok: str) -> int:
        z = (hash_bytes(tok.encode("utf-8"))) & 0xFFFFFFFFFFFFFFFF
        return z

    def hash_bytes(b: bytes) -> int:
        # FNV-1a 64-bit (public domain) — stable across processes
        h = 0xCBF29CE484222325
        for byte in b:
            h ^= byte
            h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        return h

    out = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        if not t:
            continue
        toks = t.split()
        if not toks:
            continue
        hs = np.fromiter((h64(tok) for tok in toks), dtype=np.uint64, count=len(toks))
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int32)
        maj = (bits.sum(axis=0) * 2 >= len(toks)).astype(np.uint64)
        val = np.uint64(0)
        for k in range(64):
            val |= maj[k] << np.uint64(k)
        out[i] = np.int64(val)
    return pd.Series(out)


def with_simhash(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("simhash", _simhash64(F.col(text_col)))


def simhash_near_dups(
    df: DataFrame, id_col: str, text_col: str = "text", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash: block on 16-bit chunks (pigeonhole: any pair
    within hamming<=3 shares at least one of 4 chunks), verify hamming."""
    s = with_simhash(df, text_col).select(F.col(id_col).alias("id"), "simhash")
    chunks = [
        F.shiftrightunsigned(F.col("simhash"), 16 * c)
        .bitwiseAND(F.lit(0xFFFF).cast("long"))
        .alias(f"c{c}")
        for c in range(4)
    ]
    t = s.select("id", "simhash", *chunks)
    pairs = None
    for c in range(4):
        a = t.select(
            F.col(f"c{c}").alias("key"),
            F.col("id").alias("id_a"),
            F.col("simhash").alias("sh_a"),
        )
        b = t.select(
            F.col(f"c{c}").alias("key"),
            F.col("id").alias("id_b"),
            F.col("simhash").alias("sh_b"),
        )
        p = a.join(b, "key").filter(F.col("id_a") < F.col("id_b")).drop("key")
        pairs = p if pairs is None else pairs.unionByName(p)
    pairs = pairs.dropDuplicates(["id_a", "id_b"])
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return pairs.select(
        "id_a", "id_b", ham.alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)


# --- embedding-cosine near-dup ------------------------------------------------


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    min_cosine: float = 0.95,
) -> DataFrame:
    """Near-dup pairs by embedding cosine within LSH (random-hyperplane sign)
    buckets. Hyperplanes are deterministic (seeded per dimension index)."""
    from cuda_float_compress_spark.operators.similarity import (
        cosine_sim_cols,
        hyperplane_bucket_col,
    )

    v = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    ).withColumn("bucket", hyperplane_bucket_col(F.col("v"), n_planes))
    a = v.select(F.col("bucket"), F.col("id").alias("id_a"), F.col("v").alias("v_a"))
    b = v.select(F.col("bucket"), F.col("id").alias("id_b"), F.col("v").alias("v_b"))
    pairs = a.join(b, "bucket").filter(F.col("id_a") < F.col("id_b"))
    cos = cosine_sim_cols(F.col("v_a"), F.col("v_b"))
    return pairs.select(
        "id_a", "id_b", F.round(cos, 6).alias("cosine")
    ).filter(F.col("cosine") >= min_cosine)

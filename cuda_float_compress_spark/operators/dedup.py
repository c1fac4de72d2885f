"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Design for 100 TB: every variant reduces to hash -> shuffle-on-small-key ->
per-bucket work. Signatures are computed JVM-side with built-in expressions
(no per-row Python anywhere in the hash path); SimHash's bit-majority is the
single numpy step, Arrow-batched. Candidate generation NEVER self-joins raw
text — only compact (id, key) pairs shuffle — and every LSH bucket is CAPPED
(deterministically: lowest ids win) so a boilerplate-heavy corpus cannot
blow up quadratically; the number of members dropped by caps is observable
via ``pyspark.sql.Observation`` (the DataFrame analog of an accumulator).

Portability: all hashes are 60-bit integers from md5 hex (see
``hash60_col``), so a SQL oracle (DuckDB) recomputes identical signatures,
buckets, and pairs — the correctness gate covers these operators end-to-end.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cuda_float_compress_spark.operators.text import shingles_col, word_shingles_col

# ---------------------------------------------------------------------------
# Portable 60-bit hash: int(md5(s)[:15 hex], 16). Chosen over xxhash64 so a
# SQL oracle reproduces it exactly: DuckDB ('0x' || substr(md5(s),1,15))::BIGINT,
# Python int(hashlib.md5(s).hexdigest()[:15], 16), Spark conv(substr(md5,1,15)).
# 60 bits (not 64) keeps every engine in non-negative signed-int64 territory
# (DuckDB's 1<<63 overflows; Spark conv of 16 hex chars can exceed int64).
# ---------------------------------------------------------------------------

HASH_BITS = 60

_WS_SPLIT = __import__("re").compile(r"[ \t\n\x0b\f\r]+")  # Java \\s+ twin

#: r7 optimization switch: eagerly materialize (localCheckpoint) small
#: intermediates that feed multiple plan branches, so their expensive
#: upstream (signatures, window hashing, bucket caps) runs ONCE instead of
#: once per branch. Tests that assert on the pre-materialization plan shape
#: monkeypatch this to False (results are identical either way).
EAGER_MATERIALIZE = True


def _materialize(df: DataFrame) -> DataFrame:
    return df.localCheckpoint(eager=True) if EAGER_MATERIALIZE else df


def _arrow_id_type(df: DataFrame, id_col: str):
    """Arrow type matching the Spark id column — the mapInArrow fast paths
    must emit EXACTLY the declared schema type (pa.array's int64 inference
    crashes the JVM reader on e.g. IntegerType ids)."""
    from pyspark.sql.pandas.types import to_arrow_type

    return to_arrow_type(df.schema[id_col].dataType)


def hash60_col(c: Column) -> Column:
    """60-bit md5-derived hash of a string column (JVM-side, portable)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def hash60_py(s: str) -> int:
    """Driver-side twin of :func:`hash60_col` (same value, same bytes)."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def _window_capped_pairs(
    exploded: DataFrame, bucket_cols: list, cap: int, observation=None
) -> DataFrame:
    """Distinct (id_a < id_b) pairs from (id, *bucket_cols) rows, with every
    bucket capped at ``cap`` members (lowest ids win — deterministic,
    SQL-reproducible as ``list_slice(list_sort(list(id)), 1, cap)``).

    The cap is a ``row_number()`` window — a spillable sort that keeps at
    most ``cap`` rows per bucket in flight — NOT ``collect_list`` + slice,
    which would first materialize the UNCAPPED bucket in one aggregation
    buffer (a boilerplate-heavy corpus whose near-dups are not exact dups
    can put 10^7+ ids in one band bucket: executor OOM at 100 TB scale).
    Pairs come from a bounded within-bucket self-join (<= cap^2 rows per
    bucket). ``observation`` (pyspark Observation) records the drops:
    dropped_members = sum(rn > cap), truncated_buckets = sum(rn == cap+1),
    buckets = sum(rn == 1) — identical values to the old aggregate counters.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy(*bucket_cols).orderBy("id")
    ranked = exploded.withColumn("rn", F.row_number().over(w))
    if observation is not None:
        ranked = ranked.observe(
            observation,
            F.sum((F.col("rn") > cap).cast("long")).alias("dropped_members"),
            F.sum((F.col("rn") == cap + 1).cast("long")).alias(
                "truncated_buckets"
            ),
            F.sum((F.col("rn") == 1).cast("long")).alias("buckets"),
        )
    # `kept` feeds BOTH self-join branches; without materialization each
    # branch re-derives the whole upstream pipeline (for minhash: the full
    # shingle->signature->band computation ran TWICE). kept is tiny —
    # (bucket_cols, id) rows, <= cap per bucket.
    kept = _materialize(ranked.filter(F.col("rn") <= cap).drop("rn"))
    a = kept.select(*bucket_cols, F.col("id").alias("id_a"))
    b = kept.select(*bucket_cols, F.col("id").alias("id_b"))
    return (
        a.join(b, bucket_cols)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )


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


# --- exact-substring duplicate spans -----------------------------------------


def dup_span_counts(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    gram_len: int = 32,
    stride: int = 16,
) -> DataFrame:
    """Exact-substring duplication signal (the ExactSubstr idea from
    "Deduplicating Training Data Makes Language Models Better", Lee et
    al. 2022 — arXiv:2107.06499 — re-expressed for Spark): per document,
    how many distinct ``gram_len``-char windows (sampled every ``stride``
    chars) also occur in at least one OTHER document. Exact duplicates
    light up every window; partially-copied documents (boilerplate,
    quoted passages) light up proportionally to the copied span — the
    signal suffix-array ExactSubstr derives, without the suffix array.

    Scale shape: windows are hashed JVM-side (hash60) before leaving the
    row, so the exploded relation is (id, long) — never window text; one
    shuffle groups by hash with partial aggregation, a second joins the
    duplicated-hash set back (shuffle join: the dup set is data-sized,
    not broadcastable), a third regroups by document. stride trades
    recall floor for a stride-fold smaller explode: a shared span of
    length >= gram_len + stride - 1 is guaranteed to cover a sampled
    window in BOTH documents only when the copies are stride-aligned;
    unaligned copies need length >= 2*gram_len (window-inclusion
    argument), still far below typical boilerplate spans.

    Returns (id_col, dup_gram_count) for documents with >= 1 shared
    window. Oracle twin: same windows via generate_series + substr in
    DuckDB with the md5-60bit portable hash.

    The window hashes are computed in a ``mapInArrow`` batch function
    (guide §4.2: hand whole batches to native code): hashlib.md5 over the
    utf-8 bytes of each codepoint-sliced window — the identical value the
    old Catalyst chain (per-codepoint split + 19 slice/array_join allocs +
    md5 expression per window) produced at ~28 us/window; the Python-slice
    path measures ~2 us/window and is O(doc) not O(doc^2) on 100 KB pages.
    Windows are deduplicated PER DOC inside the task (a Python set); a
    cheap global dropDuplicates (near-no-op partial aggregate when ids are
    unique) keeps duplicate-id INPUT rows from inflating counts, so dup_h
    needs count(*), not count_distinct."""
    import hashlib

    import pyarrow as pa

    id_type = df.schema[id_col].dataType.simpleString()
    id_arrow = _arrow_id_type(df, id_col)
    filtered = df.filter(F.length(F.col(text_col)) >= gram_len).select(
        F.col(id_col), F.col(text_col).alias("__t")
    )

    def win_hashes(batches):
        md5 = hashlib.md5
        for b in batches:
            out_ids: list = []
            out_h: list = []
            for rid, s in zip(b.column(0).to_pylist(),
                              b.column(1).to_pylist()):
                hs = {
                    int(md5(s[j:j + gram_len].encode("utf-8"))
                        .hexdigest()[:15], 16)
                    for j in range(0, len(s) - gram_len + 1, stride)
                }
                out_ids.extend([rid] * len(hs))
                out_h.extend(hs)
            yield pa.record_batch(
                [pa.array(out_ids, type=id_arrow),
                 pa.array(out_h, pa.int64())],
                names=["id", "h"],
            )

    grams = filtered.mapInArrow(
        win_hashes, schema=f"id {id_type}, h long"
    ).withColumnRenamed("id", id_col).dropDuplicates([id_col, "h"])
    # materialized ONCE: `grams` feeds BOTH the dup_h groupBy and the
    # final join — without the checkpoint Spark re-runs the whole window
    # hashing per branch. Same pattern as minhash_lsh_pairs' candidates.
    grams = _materialize(grams)
    dup_h = (
        grams.groupBy("h")
        .agg(F.count("*").alias("nd"))  # (id, h) globally distinct above
        .filter(F.col("nd") >= 2)
        .select("h")
    )
    return (
        grams.join(dup_h, "h")
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("dup_gram_count"))
    )


# --- MinHash + LSH -----------------------------------------------------------


def _shingle_expr(text, shingle_k: int, shingle_mode: str):
    if shingle_mode == "word":
        return word_shingles_col(text, shingle_k)
    return shingles_col(text, shingle_k)


ROT_STEP = 8  # per-window-position rotation distance for word-shingle hashes


def _rot60(x: Column, r: int) -> Column:
    """Rotate a 60-bit value left by ``r`` (mask-first so the int64 shift
    never touches the sign bit). Portable: DuckDB ((x & low) << r) | (x >> s)
    computes the identical value for non-negative x. ``r`` is reduced mod 60
    (shingle_k >= 9 rotates by 8*8=64, which would otherwise shift by a
    negative count) — the SQL generator applies the same reduction."""
    r %= 60
    if r == 0:
        return x
    low = (1 << (60 - r)) - 1
    return F.shiftleft(x.bitwiseAND(F.lit(low)), r).bitwiseOR(
        F.shiftrightunsigned(x, 60 - r)
    )


def _rot_fn(r: int):
    return lambda x: _rot60(F.coalesce(x, F.lit(0).cast("long")), r)


def with_shingle_hashes(
    df: DataFrame,
    text_col: str = "text",
    shingle_k: int = 5,
    shingle_mode: str = "char",
    out: str = "__shingle_hashes",
) -> DataFrame:
    """Adds ``out: array<bigint>`` of 60-bit shingle hashes.

    char mode: hash60 of every k-char substring (one md5 per shingle).
    word mode: hash60 of every WORD once, then each w-word window's hash is
    the XOR of its word hashes rotated by 8*position — pure shift/xor
    arithmetic instead of building + md5-ing every space-joined window
    string (4.5x faster at sf0.1: the window-string concat dominated the
    whole minhash query). Position-dependent rotation keeps the hash
    order-sensitive ("a b" != "b a") and repeated-word windows nonzero.
    Portable: a SQL oracle reproduces every step (md5 words + shift/xor).

    Staged via named columns so the word-hash array is computed once, not
    once per window slice."""
    if shingle_mode == "char":
        sh = _shingle_expr(F.col(text_col), shingle_k, shingle_mode)
        return df.withColumn(out, F.transform(sh, hash60_col))
    if shingle_mode != "word":
        raise ValueError(f"unknown shingle_mode: {shingle_mode}")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    tmp = df.withColumn("__wh", F.transform(toks, hash60_col))
    n = F.size(F.col("__wh"))
    n_windows = F.greatest(n - (shingle_k - 1), F.lit(1))
    # window i's members via k aligned slices; shorter slices zero-pad (the
    # zip_with null) so a doc with < k words still gets one shingle
    arrs = [
        F.transform(
            F.slice(F.col("__wh"), j + 1, n_windows), _rot_fn(ROT_STEP * j)
        )
        for j in range(shingle_k)
    ]
    sh = arrs[0]
    for a in arrs[1:]:
        sh = F.zip_with(
            sh,
            a,
            lambda x, y: F.coalesce(x, F.lit(0).cast("long")).bitwiseXOR(
                F.coalesce(y, F.lit(0).cast("long"))
            ),
        )
    return tmp.withColumn(out, sh).drop("__wh")


def minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    n_hashes: int = 16,
    shingle_k: int = 5,
    shingle_mode: str = "char",
) -> DataFrame:
    """Adds ``minhash: array<bigint>``. Shingles are hashed ONCE (the
    expensive pass over text bytes — see with_shingle_hashes); each of the
    ``n_hashes`` components is min over (shingle_hash XOR K_i) — an
    xor-permutation family with fixed 60-bit constants
    K_i = hash60("minhash-perm-i"). All JVM expressions; a SQL oracle
    recomputes the identical signature."""
    perms = [hash60_py(f"minhash-perm-{i}") for i in range(n_hashes)]
    with_base = with_shingle_hashes(df, text_col, shingle_k, shingle_mode)

    def _xor_with(k: int):
        # closure factory, NOT a defaulted second lambda arg: pyspark treats
        # a two-parameter transform lambda as (element, INDEX) and would
        # silently shadow k with the element index (degenerating all
        # n_hashes components to the same value)
        return lambda h: h.bitwiseXOR(F.lit(k))

    comps = [
        F.array_min(F.transform(F.col("__shingle_hashes"), _xor_with(k)))
        for k in perms
    ]
    return with_base.withColumn("minhash", F.array(*comps)).drop("__shingle_hashes")


def minhash_banded_keys(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 5,
    shingle_mode: str = "char",
) -> DataFrame:
    """(id, band, key) rows: one row per document per band, key = md5 of the
    comma-joined band slice of the minhash signature (portable to SQL).
    Pure Column expressions, so it works on BATCH and STREAMING DataFrames
    alike — the shared front half of batch LSH candidates and the
    cross-epoch streaming near-dup state job."""
    rows_per_band = n_hashes // bands
    sig = minhash_signature(df, text_col, n_hashes, shingle_k, shingle_mode).select(
        F.col(id_col).alias("id"), "minhash"
    )
    band_keys = [
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    F.slice(F.col("minhash"), 1 + b * rows_per_band, rows_per_band),
                    lambda x: x.cast("string"),
                ),
            )
        ).alias(f"band_{b}")
        for b in range(bands)
    ]
    banded = sig.select("id", *band_keys)
    stack = F.array(
        *[
            F.struct(F.lit(b).alias("band"), F.col(f"band_{b}").alias("key"))
            for b in range(bands)
        ]
    )
    return banded.select("id", F.explode(stack).alias("bb")).select(
        "id", F.col("bb.band").alias("band"), F.col("bb.key").alias("key")
    )


def _np_word_window_hashes(
    s: str, w: int = 5, cache: dict | None = None
) -> np.ndarray:
    """Python/numpy twin of ``with_shingle_hashes`` word mode for ONE
    document: md5-60bit word hashes, then each w-window's hash = XOR over
    positions j of rot60(word_hash[i+j], 8j) with out-of-range words as 0.
    Bit-identical to the Column-expression path (pinned by
    tests/test_ops.py::test_minhash_arrow_matches_expression_path):
    - tokenization: strip SPACES only (Spark trim), split on Java \\s+
      ([ \\t\\n\\x0B\\f\\r]+) keeping leading/trailing empty tokens like
      Java split(limit=-1);
    - hash60: int(md5(utf8)[:15 hex], 16), same as hash60_col/the oracle.
    Returns a uint64 array of window hashes (values < 2^60)."""
    toks = _WS_SPLIT.split(s.strip(" "))
    md5 = hashlib.md5
    if cache is None:
        it = (int(md5(t.encode("utf-8")).hexdigest()[:15], 16) for t in toks)
    else:
        # word-hash memo (Zipf: most tokens repeat constantly) — the caller
        # owns the dict, typically one per task so it amortizes across every
        # batch of the partition (guide §4.5)
        def _h(t: str) -> int:
            v = cache.get(t)
            if v is None:
                v = int(md5(t.encode("utf-8")).hexdigest()[:15], 16)
                if len(cache) < 1_000_000:  # bound task memory
                    cache[t] = v
            return v

        it = (_h(t) for t in toks)
    wh = np.fromiter(it, dtype=np.uint64, count=len(toks))
    n = len(wh)
    nw = max(n - (w - 1), 1)
    pad = np.zeros(nw + w - 1, dtype=np.uint64)
    pad[:n] = wh[: nw + w - 1]
    acc = np.zeros(nw, dtype=np.uint64)
    for j in range(w):
        r = (ROT_STEP * j) % 60
        x = pad[j:j + nw]
        if r:
            low = np.uint64((1 << (60 - r)) - 1)
            x = ((x & low) << np.uint64(r)) | (x >> np.uint64(60 - r))
        acc = acc ^ x
    return acc


def minhash_banded_keys_arrow(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 5,
) -> DataFrame:
    """Batch fast path for :func:`minhash_banded_keys` (word mode): the
    whole signature -> band-key chain runs inside ``mapInArrow`` (guide
    §4.2) — hashlib md5 per word + numpy rot/xor windows + numpy min per
    permutation — instead of a per-word md5 Catalyst expression tree
    (measured ~2x on the signature stage). Values are bit-identical to
    the expression path (parity-pinned); streaming callers keep the pure
    Column-expression form."""
    import pyarrow as pa

    perms = np.array(
        [hash60_py(f"minhash-perm-{i}") for i in range(n_hashes)],
        dtype=np.uint64,
    )
    rows_per_band = n_hashes // bands
    id_type = df.schema[id_col].dataType.simpleString()
    id_arrow = _arrow_id_type(df, id_col)
    src = df.select(F.col(id_col), F.col(text_col))

    def band_keys(batches):
        md5 = hashlib.md5
        band_ids = list(range(bands))
        # NULL text in the expression path: the whole signature array is
        # NULL, and concat_ws skips the NULL transform result, so every
        # band key is md5 of the empty string — mirror that exactly
        null_key = md5(b"").hexdigest()
        word_cache: dict = {}
        for b in batches:
            out_ids: list = []
            out_band: list = []
            out_key: list = []
            for rid, s in zip(b.column(0).to_pylist(),
                              b.column(1).to_pylist()):
                if s is None:
                    for bi in band_ids:
                        out_ids.append(rid)
                        out_band.append(bi)
                        out_key.append(null_key)
                    continue
                win = _np_word_window_hashes(s, shingle_k, word_cache)
                sig = (win[:, None] ^ perms[None, :]).min(axis=0)
                for bi in band_ids:
                    sl = sig[bi * rows_per_band:(bi + 1) * rows_per_band]
                    key = md5(",".join(
                        str(int(v)) for v in sl
                    ).encode("utf-8")).hexdigest()
                    out_ids.append(rid)
                    out_band.append(bi)
                    out_key.append(key)
            yield pa.record_batch(
                [pa.array(out_ids, type=id_arrow),
                 pa.array(out_band, pa.int32()),
                 pa.array(out_key, pa.string())],
                names=["id", "band", "key"],
            )

    return src.mapInArrow(band_keys, schema=f"id {id_type}, band int, key string")


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 5,
    bucket_cap: int = 64,
    observation=None,
    shingle_mode: str = "char",
) -> DataFrame:
    """Candidate (id_a, id_b) pairs via banding: equal band-key -> candidate.
    Band key = md5 of the comma-joined band slice (portable to SQL). The only
    shuffle is groupBy(band, key) over (id, key) rows — tiny vs the corpus —
    and buckets are capped at ``bucket_cap`` members (drops observable)."""
    if shingle_mode == "word" and not df.isStreaming:
        exploded = minhash_banded_keys_arrow(
            df, id_col, text_col, n_hashes, bands, shingle_k
        )
    else:
        exploded = minhash_banded_keys(
            df, id_col, text_col, n_hashes, bands, shingle_k, shingle_mode
        )
    return _window_capped_pairs(exploded, ["band", "key"], bucket_cap, observation)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 5,
    threshold: float = 0.7,
    bucket_cap: int = 64,
    observation=None,
    shingle_mode: str = "char",
) -> DataFrame:
    """Near-duplicate pairs: MinHash-LSH candidate generation, then EXACT
    shingle-Jaccard verification >= threshold (the verify join touches only
    candidate ids, semi-join-pruned before shingling).

    Scale: signatures are one md5 pass per shingle; candidates shuffle
    (id, band-key) only; verification shingles only docs that appear in some
    candidate pair."""
    # Materialize the candidate set ONCE: it feeds three consumers (two
    # union branches of `wanted` + the verify join), and without the
    # checkpoint Spark re-derives the full shingle->hash->signature->band
    # pipeline per consumer — three corpus scans instead of one at 100 TB.
    # Candidates are tiny (id pairs), so the checkpoint is ~free.
    cands = minhash_lsh_candidates(
        df, id_col, text_col, n_hashes, bands, shingle_k, bucket_cap,
        observation, shingle_mode,
    ).localCheckpoint(eager=True)
    return jaccard_verify_candidates(
        df, cands, id_col, text_col, shingle_k, shingle_mode, threshold
    )


def jaccard_verify_candidates(
    df: DataFrame,
    cands: DataFrame,
    id_col: str,
    text_col: str = "text",
    shingle_k: int = 5,
    shingle_mode: str = "char",
    threshold: float = 0.7,
) -> DataFrame:
    """Exact hashed-shingle-Jaccard verification of (id_a, id_b) candidate
    pairs against the document store ``df`` — the verify stage of
    :func:`minhash_lsh_pairs`, shared with the streaming epoch-end verifier
    (candidates are tiny id pairs; only candidate docs are shingled)."""
    wanted = (
        cands.select(F.col("id_a").alias(id_col))
        .union(cands.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    pruned = df.join(wanted, id_col, "left_semi")
    # verify on the HASHED shingle sets (same arithmetic the signature used
    # — no second string-building pass; 60-bit collisions are negligible and
    # the SQL oracle computes the identical sets)
    # materialized once: `sh` feeds both join sides (a and b) — without the
    # checkpoint the semi-join + shingle-hash pass over candidate docs runs
    # twice. Word mode on batch frames uses the numpy window hasher (same
    # values as the expression path; set-distinct order differs, which
    # array_intersect/array_union sizes never observe).
    if shingle_mode == "word" and not pruned.isStreaming:
        import pyarrow as pa

        id_type = df.schema[id_col].dataType.simpleString()
        id_arrow = _arrow_id_type(df, id_col)

        def hash_sets(batches):
            word_cache: dict = {}
            for b in batches:
                ids = b.column(0).to_pylist()
                # NULL text -> NULL set (array_distinct(NULL) is NULL in
                # the expression path; the jaccard then nulls out and the
                # threshold filter drops the pair — identical behavior)
                sets = [
                    None if s is None else np.unique(
                        _np_word_window_hashes(s, shingle_k, word_cache)
                    ).astype(np.int64)
                    for s in b.column(1).to_pylist()
                ]
                yield pa.record_batch(
                    [pa.array(ids, type=id_arrow),
                     pa.array(sets, pa.list_(pa.int64()))],
                    names=["id", "sh"],
                )

        sh = _materialize(
            pruned.select(F.col(id_col), F.col(text_col)).mapInArrow(
                hash_sets, schema=f"id {id_type}, sh array<bigint>"
            )
        )
    else:
        sh = _materialize(
            with_shingle_hashes(
                pruned, text_col, shingle_k, shingle_mode
            ).select(
                F.col(id_col).alias("id"),
                F.array_distinct("__shingle_hashes").alias("sh"),
            )
        )
    a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    j = cands.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    verified = j.select(
        "id_a",
        "id_b",
        F.round(inter.cast("double") / F.greatest(union, F.lit(1)), 6).alias(
            "jaccard"
        ),
    )
    return verified.filter(F.col("jaccard") >= threshold)


# --- n-gram Jaccard (exact, for candidate verification) ----------------------


def ngram_jaccard_pairs(
    df: DataFrame, candidates: DataFrame, id_col: str, text_col: str = "text",
    shingle_k: int = 5, shingle_mode: str = "char",
) -> DataFrame:
    """Exact shingle-set Jaccard for candidate (id_a, id_b) pairs. Joins the
    (small) candidate set back to texts — broadcast when it fits."""
    sh = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(
            _shingle_expr(F.col(text_col), shingle_k, shingle_mode)
        ).alias("sh"),
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


def token_hashes_col(text: Column) -> Column:
    """60-bit hashes of whitespace tokens (JVM split + md5; NULL/empty/blank
    text -> empty array, so downstream numpy never sees None). Portable: a
    SQL oracle computes the identical array."""
    trimmed = F.trim(F.coalesce(text, F.lit("")))
    return F.when(
        F.length(trimmed) == 0, F.array().cast("array<long>")
    ).otherwise(F.transform(F.split(trimmed, r"\s+"), hash60_col))


@F.pandas_udf(T.LongType())
def _simhash_majority(hash_arrays: pd.Series) -> pd.Series:
    """Bit-majority over per-document token-hash arrays -> 60-bit SimHash.
    Vectorized: one concatenated token-hash vector per Arrow batch, then 60
    shift-mask-reduceat passes (no per-row or per-byte Python — the fix for
    the round-1 per-byte FNV loop). Delegates to the shared numpy core so
    the pandas-UDF and mapInArrow paths cannot drift."""
    return pd.Series(_simhash_from_token_lists(list(hash_arrays)))


def _simhash_from_token_lists(token_hash_lists: list) -> np.ndarray:
    """Bit-majority SimHash for a list of per-doc token-hash sequences
    (None/empty -> 0) — the shared numpy core of the pandas-UDF path and
    the mapInArrow fast path: one concatenated vector, 60 reduceat passes."""
    n_rows = len(token_hash_lists)
    out = np.zeros(n_rows, dtype=np.int64)
    if n_rows == 0:
        return out
    lens = np.fromiter(
        (0 if a is None else len(a) for a in token_hash_lists),
        dtype=np.int64, count=n_rows,
    )
    nz = lens > 0
    if not nz.any():
        return out
    flat = np.concatenate(
        [np.asarray(a, dtype=np.uint64)
         for a, keep in zip(token_hash_lists, nz) if keep]
    )
    nz_lens = lens[nz]
    offs = np.zeros(len(nz_lens), dtype=np.int64)
    np.cumsum(nz_lens[:-1], out=offs[1:])
    sig = np.zeros(len(nz_lens), dtype=np.uint64)
    for b in range(HASH_BITS):
        ones = np.add.reduceat((flat >> np.uint64(b)) & np.uint64(1), offs)
        sig |= ((ones * 2 >= nz_lens).astype(np.uint64)) << np.uint64(b)
    out[nz] = sig.astype(np.int64)
    return out


def simhash_ids_arrow(
    df: DataFrame, id_col: str, text_col: str = "text"
) -> DataFrame:
    """Batch fast path producing (id, simhash): tokenization + md5 token
    hashing + bit-majority all inside ONE mapInArrow (guide §4.2), with a
    per-task word-hash memo — replacing a per-token md5 Catalyst expression
    tree AND a second Python crossing for the pandas-UDF majority. Values
    bit-identical to with_simhash (parity-pinned by
    tests/test_ops.py::test_simhash_arrow_matches_expression_path)."""
    import pyarrow as pa

    id_type = df.schema[id_col].dataType.simpleString()
    id_arrow = _arrow_id_type(df, id_col)
    src = df.select(F.col(id_col), F.col(text_col))

    def sim(batches):
        md5 = hashlib.md5
        cache: dict = {}

        def _h(t: str) -> int:
            v = cache.get(t)
            if v is None:
                v = int(md5(t.encode("utf-8")).hexdigest()[:15], 16)
                if len(cache) < 1_000_000:
                    cache[t] = v
            return v

        for b in batches:
            ids = b.column(0).to_pylist()
            token_lists = []
            for s in b.column(1).to_pylist():
                trimmed = (s or "").strip(" ")
                if not trimmed:
                    token_lists.append(None)
                else:
                    token_lists.append(
                        [_h(t) for t in _WS_SPLIT.split(trimmed)]
                    )
            sig = _simhash_from_token_lists(token_lists)
            yield pa.record_batch(
                [pa.array(ids, type=id_arrow), pa.array(sig, pa.int64())],
                names=["id", "simhash"],
            )

    return src.mapInArrow(sim, schema=f"id {id_type}, simhash long")


def with_simhash(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds ``simhash: bigint`` (60-bit; see token_hashes_col/_simhash_majority)."""
    return df.withColumn("simhash", _simhash_majority(token_hashes_col(F.col(text_col))))


def simhash_near_dups(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    max_hamming: int = 3,
    bucket_cap: int = 128,
    observation=None,
) -> DataFrame:
    """Near-dup pairs by SimHash: block on 15-bit chunks (pigeonhole: any
    pair within hamming<=3 shares at least one of 4 chunks), verify hamming.
    Buckets capped at ``bucket_cap`` (lowest ids win, drops observable)."""
    # Materialize the signatures ONCE: `s` feeds THREE consumers (the
    # bucket explode + both verify-join sides), and the simhash pass over
    # every document would otherwise run three times. (id, simhash) is two
    # longs per doc — the checkpoint is ~free. Batch frames use the
    # single-crossing mapInArrow hasher; streaming keeps the expression +
    # pandas-UDF form.
    if df.isStreaming:
        s = with_simhash(df, text_col).select(
            F.col(id_col).alias("id"), "simhash"
        )
    else:
        s = _materialize(simhash_ids_arrow(df, id_col, text_col))
    chunk = F.array(
        *[
            F.struct(
                F.lit(c).alias("blk"),
                F.shiftrightunsigned(F.col("simhash"), 15 * c)
                .bitwiseAND(F.lit(0x7FFF).cast("long"))
                .alias("key"),
            )
            for c in range(4)
        ]
    )
    exploded = s.select("id", F.explode(chunk).alias("bb")).select(
        "id", F.col("bb.blk").alias("blk"), F.col("bb.key").alias("key")
    )
    pairs = _window_capped_pairs(exploded, ["blk", "key"], bucket_cap, observation)
    a = s.select(F.col("id").alias("id_a"), F.col("simhash").alias("sh_a"))
    b = s.select(F.col("id").alias("id_b"), F.col("simhash").alias("sh_b"))
    joined = pairs.join(a, "id_a").join(b, "id_b")
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).cast("int")
    return joined.select("id_a", "id_b", ham.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


# --- duplicate components: pairs -> groups -> keep-list ----------------------


def connected_components(
    pairs: DataFrame,
    nodes: DataFrame,
    id_col: str = "id",
    max_iter: int = 25,
) -> DataFrame:
    """Min-label connected components over a (id_a, id_b) pair graph:
    every node's component = the smallest id reachable from it. Iterative
    label propagation (each round: label <- min(label, neighbors' labels)),
    stopping when a round changes nothing — the standard large-scale
    pattern (GraphFrames-style) in plain DataFrame joins; duplicate clusters
    are shallow, so rounds ~ O(log(cluster diameter)).

    ``nodes``: one column ``id_col`` with every node (singletons keep their
    own id as component). Deterministic — a SQL oracle's recursive CTE
    computes the identical fixpoint."""
    # Materialize `pairs` before the two-branch union: callers hand in an
    # expensive LSH subtree (e.g. simhash_near_dups), and referencing it in
    # both union branches would otherwise evaluate it twice.
    pairs = pairs.localCheckpoint(eager=True)
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .union(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = nodes.select(F.col(id_col).alias("id")).distinct().withColumn(
        "label", F.col("id")
    )
    converged = False
    for _ in range(max_iter):
        neigh = (
            edges.join(labels, edges["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = (
            labels.join(neigh, labels["id"] == neigh["src"], "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
                ).alias("label"),
            )
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels.localCheckpoint(eager=True)  # cut the lineage per round
        if changed == 0:
            converged = True
            break
        # star contraction: rewrite edges through the current labels so later
        # rounds hop between component representatives — O(log diameter)
        # rounds instead of O(diameter) one-hop propagation
        ls = labels.select(F.col("id").alias("src"), F.col("label").alias("slabel"))
        ld = labels.select(F.col("id").alias("dst"), F.col("label").alias("dlabel"))
        edges = (
            edges.join(ls, "src").join(ld, "dst")
            .select(F.col("slabel").alias("src"), F.col("dlabel").alias("dst"))
            .filter(F.col("src") != F.col("dst"))
            .distinct()
            .localCheckpoint(eager=True)
        )
    if not converged:
        # Exiting via max_iter means labels may still be split mid-cluster:
        # downstream keep-lists would retain extra "representatives". Loud
        # failure beats silently-wrong components (star contraction converges
        # in O(log diameter) rounds, so hitting 25 means a pathological graph
        # — raise so the caller can bump max_iter deliberately).
        raise RuntimeError(
            f"connected_components: label propagation did not converge in "
            f"{max_iter} rounds; components would be split. Raise max_iter."
        )
    converged = False
    # resolve label chains by pointer jumping (label <- label[label]):
    # contraction leaves nodes pointing at intermediate representatives;
    # pointers strictly decrease, so this doubles chain depth per round
    for _ in range(max_iter):
        a = labels.alias("a")
        b = labels.select(
            F.col("id").alias("pid"), F.col("label").alias("plabel")
        )
        jumped = a.join(b, F.col("a.label") == F.col("pid")).select(
            F.col("a.id").alias("id"), F.col("plabel").alias("label")
        )
        changed = (
            jumped.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = jumped.localCheckpoint(eager=True)
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components: pointer jumping did not converge in "
            f"{max_iter} rounds (chain depth > 2^{max_iter}); raise max_iter."
        )
    return labels.select(F.col("id"), F.col("label").alias("component"))


def dedup_keep_list(
    df: DataFrame, pairs: DataFrame, id_col: str
) -> DataFrame:
    """The deduplicated corpus keep-list: one representative (min id) per
    duplicate component; singletons keep themselves."""
    nodes = df.select(F.col(id_col).alias("id"))
    comp = connected_components(pairs, nodes)
    return comp.filter(F.col("id") == F.col("component")).select(
        F.col("id").alias(id_col)
    )


# --- embedding-cosine near-dup ------------------------------------------------


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 16,
    min_cosine: float = 0.95,
    bucket_cap: int = 256,
    observation=None,
) -> DataFrame:
    """Near-dup pairs by embedding cosine within LSH (random-hyperplane sign)
    buckets. Hyperplanes are deterministic md5-derived ±1 (portable to SQL).

    Scale: n_planes=16 -> 65k buckets keeps expected bucket size ~N/65k, and
    every bucket is capped at ``bucket_cap`` rows (row_number window, lowest
    ids win) so the within-bucket self-join is bounded regardless of skew."""
    from pyspark.sql import Window as W

    from cuda_float_compress_spark.operators.similarity import (
        cosine_sim_cols,
        hyperplane_bucket_col,
    )

    v = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    ).withColumn("bucket", hyperplane_bucket_col(F.col("v"), n_planes))
    w = W.partitionBy("bucket").orderBy("id")
    ranked = v.withColumn("rn", F.row_number().over(w))
    if observation is not None:
        ranked = ranked.observe(
            observation,
            F.sum((F.col("rn") > bucket_cap).cast("long")).alias("dropped_members"),
        )
    # materialized once: `kept` feeds both self-join branches — without it
    # the hyperplane-bucket pandas UDF + window run twice
    kept = _materialize(ranked.filter(F.col("rn") <= bucket_cap).drop("rn"))
    a = kept.select("bucket", F.col("id").alias("id_a"), F.col("v").alias("v_a"))
    b = kept.select("bucket", F.col("id").alias("id_b"), F.col("v").alias("v_b"))
    pairs = a.join(b, "bucket").filter(F.col("id_a") < F.col("id_b"))
    cos = cosine_sim_cols(
        F.col("v_a").cast("array<double>"), F.col("v_b").cast("array<double>")
    )
    return pairs.select(
        "id_a", "id_b", F.round(cos, 6).alias("cosine")
    ).filter(F.col("cosine") >= min_cosine)

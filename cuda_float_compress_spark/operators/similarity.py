"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline (all JVM built-ins:
zip_with + aggregate — no Python in the scan). The scale path is
LSH-bucketing by random-hyperplane sign bits: at 100 TB the bucket key
prunes the candidate set by ~2^n_planes before any arithmetic, and the
query-side probe touches one bucket (plus optional multiprobe neighbors).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot_col(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x)
    )


def cosine_sim_cols(a: Column, b: Column) -> Column:
    return dot_col(a, b) / F.greatest(norm_col(a) * norm_col(b), F.lit(1e-12))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force top-k by cosine similarity to a literal query vector.
    One scan, one partial top-k per partition, k rows to the driver (Spark's
    TakeOrdered does the per-partition pruning)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = cosine_sim_cols(F.col(vec_col).cast("array<double>"), q)
    return (
        df.select(F.col(id_col), F.round(sim, 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


MAX_DIM = 256  # hyperplane sign matrix extent; vectors longer than this
# would need a larger literal (raise if your embeddings exceed it)


def plane_sign(i: int, p: int) -> int:
    """Deterministic ±1 for (dimension i, plane p): +1 iff the first hex char
    of md5(f"{i}_{p}") is < '8'. Portable: a SQL oracle recomputes it with its
    own md5 (DuckDB: substr(md5(i::VARCHAR||'_'||p::VARCHAR),1,1) < '8')."""
    import hashlib

    return 1 if hashlib.md5(f"{i}_{p}".encode()).hexdigest()[0] < "8" else -1


def hyperplane_bucket_col(vec: Column, n_planes: int = 8) -> Column:
    """LSH bucket id from random-hyperplane sign bits.

    The projection is INTEGER arithmetic — sum_i round(v_i * 1e6) * sign(i,p)
    — so it is order-independent and bit-identical across engines (float
    summation order would flip signs near zero between Spark and a SQL
    oracle). Signs are broadcast as literal arrays (no per-row hashing)."""
    bits = []
    for p in range(n_planes):
        signs = F.array(*[F.lit(plane_sign(i, p)) for i in range(MAX_DIM)])
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.slice(signs, 1, F.size(vec)),
                lambda x, s: F.round(x.cast("double") * 1e6).cast("long")
                * s.cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def ann_lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
) -> DataFrame:
    """Approximate top-k: probe only the query's hyperplane bucket, exact
    cosine inside it. Recall improves with multiprobe (neighbor buckets at
    hamming distance 1) — included so small buckets don't starve results."""
    bucketed = df.withColumn("__bucket", hyperplane_bucket_col(F.col(vec_col), n_planes))
    # compute the query's bucket with the same expression on a 1-row frame
    spark = df.sparkSession
    qrow = spark.range(1).select(
        F.array(*[F.lit(float(x)) for x in query_vec]).alias("qv")
    )
    qb = qrow.select(hyperplane_bucket_col(F.col("qv"), n_planes).alias("b")).collect()[
        0
    ]["b"]
    probe = [qb] + [qb ^ (1 << p) for p in range(n_planes)]  # multiprobe r=1
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = cosine_sim_cols(F.col(vec_col).cast("array<double>"), q)
    return (
        bucketed.filter(F.col("__bucket").isin(probe))
        .select(F.col(id_col), F.round(sim, 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def pairwise_cosine_topk_per_query(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k corpus neighbors for EVERY query row (small query side →
    broadcast; window top-k per query)."""
    from pyspark.sql import Window as W

    q = queries.select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec"))
    joined = c.crossJoin(F.broadcast(q)).filter(F.col("q_id") != F.col("c_id"))
    sim = cosine_sim_cols(
        F.col("c_vec").cast("array<double>"), F.col("q_vec").cast("array<double>")
    )
    scored = joined.select("q_id", "c_id", F.round(sim, 6).alias("cosine"))
    w = W.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "cosine", "rank")
    )

"""Operators Spark's DataFrame API lacks as primitives, composed from
built-ins (the task brief's category: as-of join, sketches).

Both are deterministic and SQL-oracle-checkable: the as-of join against
DuckDB's native ASOF JOIN, the KMV sketch against the same k-minimum
md5-60bit hash computation in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from cuda_float_compress_spark.operators.dedup import HASH_BITS, hash60_col


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    value_cols: list[str],
) -> DataFrame:
    """LEFT as-of join: every left row gets the value columns of the LATEST
    right row with the same key and right.ts <= left.ts (inclusive).

    Spark has no ASOF JOIN primitive; the scale-correct composition is
    union-tag + one running ``last(ignorenulls)`` window per value column —
    a SINGLE shuffle on (key, ts), versus the naive range-join which
    explodes to |left| x |right| per key before filtering. Right rows sort
    before left rows at equal ts (inclusive semantics, matching DuckDB's
    ASOF JOIN). ``right`` must be unique per (key, ts) — dedupe upstream."""
    lcols = [c for c in left.columns]
    # value columns travel inside ONE struct: last(ignorenulls) then skips
    # only LEFT rows (whose struct is NULL), never a matched right row that
    # legitimately carries a NULL value — same semantics as a real ASOF JOIN
    rstruct = F.struct(*[F.col(c) for c in value_cols])
    null_struct = F.lit(None).cast(
        "struct<" + ",".join(
            f"{c}:{right.schema[c].dataType.simpleString()}" for c in value_cols
        ) + ">"
    )
    tagged_l = left.select(*lcols, F.lit(1).alias("__is_l"),
                           null_struct.alias("__r"))
    tagged_r = right.select(
        F.col(key_col),
        F.col(ts_col),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c not in (key_col, ts_col)],
        F.lit(0).alias("__is_l"),
        rstruct.alias("__r"),
    ).select(*lcols, "__is_l", "__r")
    u = tagged_l.unionByName(tagged_r)
    w = (
        W.partitionBy(key_col)
        .orderBy(ts_col, "__is_l")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    u = u.withColumn("__r", F.last("__r", ignorenulls=True).over(w))
    return (
        u.filter(F.col("__is_l") == 1)
        .select(*lcols,
                *[F.col(f"__r.{c}").alias(f"asof_{c}") for c in value_cols])
    )


def range_join_points_to_intervals(
    points: DataFrame,
    intervals: DataFrame,
    key_col: str,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
) -> DataFrame:
    """Range join (point-in-interval) WITHOUT the naive cross-join blowup:
    each interval explodes to the fixed-width buckets it covers, points map
    to their single bucket, and the join runs on (key, bucket) before the
    exact containment filter — candidate pairs are bounded by
    interval_length/bucket_width per interval instead of |points|x|intervals|
    per key. Containment is inclusive start, exclusive end. Choose
    bucket_width ~ median interval length."""
    bw = int(bucket_width)
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                (F.col(start_col) / bw).cast("long"),
                ((F.col(end_col) - 1) / bw).cast("long"),
            )
        ),
    )
    pt = points.withColumn("__bucket", (F.col(point_col) / bw).cast("long"))
    joined = pt.join(iv, [key_col, "__bucket"]).filter(
        (F.col(point_col) >= F.col(start_col))
        & (F.col(point_col) < F.col(end_col))
    )
    return joined.drop("__bucket")


def kmv_distinct(
    df: DataFrame, col: str, k: int = 256
) -> DataFrame:
    """K-minimum-values distinct-count sketch (Bar-Yossef et al., public):
    hash every value to 60 bits, keep the k smallest DISTINCT hashes; if
    fewer than k exist the count is exact, else estimate
    (k-1) * 2^60 / kth_min. Deterministic (md5-based) — unlike
    approx_count_distinct's HLL, a SQL oracle reproduces the estimate
    bit-for-bit, and sketches from disjoint partitions merge by keeping the
    k smallest of the union (the property that makes it a sketch)."""
    hashes = (
        df.filter(F.col(col).isNotNull())  # NULL is not a value; it would
        # also sort FIRST in Spark and LAST in a SQL oracle, displacing the
        # k-th minimum differently in each engine
        .select(hash60_col(F.col(col).cast("string")).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )
    agg = hashes.agg(
        F.count("*").alias("n_kept"), F.max("h").alias("kth")
    )
    domain = float(1 << HASH_BITS)
    return agg.select(
        F.when(
            F.col("n_kept") < k, F.col("n_kept").cast("double")
        ).otherwise(
            F.round(F.lit(float(k - 1)) * F.lit(domain) / F.col("kth"), 2)
        ).alias("distinct_estimate"),
        F.col("n_kept"),
    )

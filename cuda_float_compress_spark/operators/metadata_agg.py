"""Metadata-only aggregation over encoded tables.

Every chunk already carries exact per-column statistics in the blocks
metadata — ``n``, ``n_nulls``, ``vmin``/``vmax`` (exact VALUES for
int-family columns), and (round 6) ``vsum`` for int32/int64. A full-table
``count / sum / min / max`` therefore needs only the metadata rows: at
100 TB that is MBs of stats instead of decoding every payload — the same
move as answering ``SELECT count(*)`` from parquet row-group footers.

Correctness gates (fall back to a real decode when any is violated):

* merge-on-read tombstones exist (deleted rows are inside the chunk
  stats but must not be inside the answer);
* any chunk of the column lacks ``vsum`` when a sum is requested
  (pre-r6 layout, or a chunk whose sum left the int64 domain);
* the column's ptype is outside the int family (string/float zone maps
  are prefixes/total-order keys — not exact values).

The fallback is the normal distributed decode-aggregate, so the operator
is always correct and merely FAST when the metadata allows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["agg_int_column"]

_INT_PTYPES = ("int64", "int32")


def agg_int_column(spark: SparkSession, out_dir: str, col: str) -> DataFrame:
    """One-row DataFrame ``(n_rows, n_nulls, sum, min, max)`` for an
    int-family column of an encoded table. Metadata-only when safe (see
    module docstring); transparently decodes otherwise."""
    from cuda_float_compress_spark.operators.decode import committed_blocks
    from cuda_float_compress_spark.operators.deletes import tombstones_df

    blocks = committed_blocks(spark, out_dir)
    stats = blocks.filter(F.col("col") == col).select(
        "ptype", "n", "n_nulls", "vmin", "vmax",
        *(["vsum"] if "vsum" in blocks.columns else []),
    )
    first = stats.limit(1).collect()
    if not first:
        raise ValueError(f"column {col!r} not present in {out_dir}")
    ptype = first[0]["ptype"]
    meta_ok = (
        ptype in _INT_PTYPES
        and "vsum" in blocks.columns
        and tombstones_df(spark, out_dir) is None
    )
    if meta_ok:
        # a chunk with real values but no vsum (overflowed / legacy run)
        # poisons the metadata sum — detect in the same aggregate pass
        row = stats.agg(
            F.sum("n").alias("n_rows"),
            F.sum("n_nulls").alias("n_nulls"),
            F.sum("vsum").alias("sum"),
            F.min("vmin").alias("min"),
            F.max("vmax").alias("max"),
            F.sum(
                F.when(
                    F.col("vsum").isNull() & (F.col("n") > F.col("n_nulls")),
                    1,
                ).otherwise(0)
            ).alias("_missing_sums"),
        ).collect()[0]
        if row["_missing_sums"] == 0:
            return spark.createDataFrame(
                [(row["n_rows"], row["n_nulls"], row["sum"],
                  row["min"], row["max"])],
                "n_rows: long, n_nulls: long, sum: long, min: long, max: long",
            )
    # fallback: distributed decode-aggregate (deletes applied, any ptype
    # the decode supports — here still int-family by contract)
    from cuda_float_compress_spark.operators.direct import decode_table_direct

    dec = decode_table_direct(spark, out_dir, columns=[col])
    return dec.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col(col).isNull().cast("long")).alias("n_nulls"),
        F.sum(col).alias("sum"),
        F.min(col).alias("min"),
        F.max(col).alias("max"),
    )

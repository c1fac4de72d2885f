"""Z-order (Morton) clustering for multi-dimensional zone-map pruning.

The encoded table's per-chunk zone maps (``encode.py`` vmin/vmax) prune
1-D ranges well only when rows are sorted by THAT column; a query with
predicates on two columns gets tight chunks on at most one of them. This
module re-expresses the Delta-Lake ``OPTIMIZE ... ZORDER BY`` / Iceberg
sort-order idea Spark-first: quantize each clustering column to ``bits``
bits, interleave the bits into a single Morton key, then
``repartitionByRange`` + sort-within-partitions on that key. Chunks then
cover small axis-aligned boxes in ALL clustered dimensions, so a
conjunctive box predicate prunes on every axis at once.

Parity note: the reference (catid/cuda_float_compress,
src/cuszplus_f32.cu:546-) encodes blocks in whatever order the caller
supplies — clustering is the Spark-side lever the GPU kernel never had.

Scale: the only data movement is one ``repartitionByRange`` shuffle (the
same shuffle any clustering rewrite pays); quantization bounds come from
one metadata-scale ``agg(min,max)``. All per-row math is JVM-side bitwise
expressions inside whole-stage codegen — no Python on the hot path.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["zorder_bounds", "with_zorder_key", "cluster_by_zorder",
           "morton_interleave_ref", "ZKEY_COL"]

ZKEY_COL = "_zkey"

# magic-mask bit spreading for the 2-column fast path: after the final step
# the value's bits sit at even positions (0, 2, 4, ...).  31 bits max per
# column keeps the interleaved result inside a positive int64.
_SPREAD2 = [
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]


def _spread2(c: Column) -> Column:
    for shift, mask in _SPREAD2:
        c = c.bitwiseOR(F.shiftleft(c, shift)).bitwiseAND(F.lit(mask))
    return c


def _to_long(df: DataFrame, col: str) -> Column:
    """Order-preserving int64 view of a clustering column (JVM-side)."""
    dt = df.schema[col].dataType
    if isinstance(dt, T.TimestampType):
        return F.unix_micros(F.col(col))
    if isinstance(dt, T.TimestampNTZType):
        # session-tz cast: a fixed offset is order-preserving, and the key
        # only steers clustering — zone maps store the actual column values
        return F.unix_micros(F.col(col).cast("timestamp"))
    if isinstance(dt, T.DateType):
        return F.datediff(F.col(col), F.lit("1970-01-01")).cast("long")
    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        return F.col(col).cast("long")
    raise ValueError(
        f"zorder: unsupported column type {dt.simpleString()} for {col!r} "
        "(supported: integral, date, timestamp; floats/strings need an "
        "order-preserving int64 view — use a rank column)"
    )


def zorder_bounds(df: DataFrame, cols: list[str]) -> dict[str, tuple[int, int]]:
    """One aggregate over the clustering columns → {col: (vmin, vmax)} as
    int64.  Metadata-scale collect (2 scalars per column)."""
    aggs = []
    for c in cols:
        v = _to_long(df, c)
        aggs += [F.min(v).alias(f"__mn_{c}"), F.max(v).alias(f"__mx_{c}")]
    row = df.agg(*aggs).collect()[0]
    out = {}
    for c in cols:
        mn, mx = row[f"__mn_{c}"], row[f"__mx_{c}"]
        if mn is None:  # all-null column: degenerate, everything maps to 0
            mn = mx = 0
        out[c] = (int(mn), int(mx))
    return out


def with_zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = 16,
    bounds: dict[str, tuple[int, int]] | None = None,
) -> DataFrame:
    """Add ``_zkey``: the Morton interleave of each column quantized to
    ``bits`` bits.  Quantization is an overflow-safe right shift of
    ``v - vmin`` by ``max(0, range_bits - bits)`` — exact (no float math),
    monotone per column.  Nulls map to the column minimum so they cluster
    together at the low end.  ``bounds`` (from :func:`zorder_bounds`) lets a
    resumed run reuse the first run's quantization grid."""
    n = len(cols)
    if n < 2:
        raise ValueError("zorder needs >= 2 columns (1 column is a sort)")
    if n * bits > 62:
        raise ValueError(f"n_cols*bits = {n * bits} > 62 overflows int64")
    bounds = bounds or zorder_bounds(df, cols)
    quantized: list[Column] = []
    for c in cols:
        mn, mx = bounds[c]
        shift = max(0, int(mx - mn).bit_length() - bits)
        v = F.coalesce(_to_long(df, c), F.lit(mn))
        # clamp so rows outside a reused grid still land in [0, 2^bits)
        v = F.least(F.greatest(v, F.lit(mn)), F.lit(mx))
        quantized.append(F.shiftright(v - F.lit(mn), shift))
    if n == 2:
        zkey = _spread2(quantized[0]).bitwiseOR(
            F.shiftleft(_spread2(quantized[1]), 1)
        )
    else:
        zkey = F.lit(0).cast("long")
        for i, q in enumerate(quantized):
            for b in range(bits):
                zkey = zkey.bitwiseOR(
                    F.shiftleft(
                        F.shiftright(q, b).bitwiseAND(F.lit(1)), b * n + i
                    )
                )
    return df.withColumn(ZKEY_COL, zkey)


def cluster_by_zorder(
    df: DataFrame,
    cols: list[str],
    n_parts: int = 32,
    bits: int = 16,
    bounds: dict[str, tuple[int, int]] | None = None,
) -> DataFrame:
    """Range-partition ``df`` on the Morton key and label each physical
    partition with ``part_id`` — ready for
    ``encode_table(..., pre_partitioned=True, sort_keys=[ZKEY_COL])``.
    Partition boundaries come from Spark's range-partitioning sampler, so
    skewed key regions still split evenly (same mechanism as
    ``plan_partitions(mode='range')``)."""
    keyed = with_zorder_key(df, cols, bits=bits, bounds=bounds)
    out = keyed.repartitionByRange(n_parts, ZKEY_COL)
    return out.withColumn("part_id", F.spark_partition_id().cast("int"))


def morton_interleave_ref(vals: list[int], bits: int) -> int:
    """Pure-Python reference twin for tests: interleave ``vals`` (already
    quantized to ``bits`` bits) with vals[0] at bit 0, vals[1] at bit 1..."""
    n = len(vals)
    out = 0
    for i, v in enumerate(vals):
        for b in range(bits):
            out |= ((v >> b) & 1) << (b * n + i)
    return out

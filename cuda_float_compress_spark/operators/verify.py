"""Round-trip verification: decoded ⋈ original ON key, per-column equality.

The Spark analog of the reference's round-trip asserts
(`original == decompressed`, cpu_compress_test/cpu_compress_test.cpp:914-919;
`torch.equal`-style checks in examples/). Equality is null-safe and exact —
for strings/binary this is byte identity (the north rule's "byte-identical
extracted text per url").

The join shuffles both sides on the key once; at 100 TB this is the only
full-data shuffle of the verification path and exists purely for audit runs
(production decode doesn't join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def verify_roundtrip(
    original: DataFrame, decoded: DataFrame, key_col: str = "url"
) -> DataFrame:
    """-> one row per column: (column, n_rows, n_match, ok)."""
    cols = [c for c in original.columns if c in set(decoded.columns)]
    o = original.select([F.col(c).alias(f"o_{c}") for c in cols])
    d = decoded.select([F.col(c).alias(f"d_{c}") for c in cols])
    joined = o.join(d, o[f"o_{key_col}"] == d[f"d_{key_col}"], "full_outer")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(
            F.sum(F.col(f"o_{c}").eqNullSafe(F.col(f"d_{c}")).cast("long")).alias(
                f"match_{c}"
            )
        )
    wide = joined.agg(*aggs)
    stack_expr = ", ".join(f"'{c}', match_{c}" for c in cols)
    return wide.selectExpr(
        "n_rows", f"stack({len(cols)}, {stack_expr}) as (column, n_match)"
    ).select(
        "column",
        "n_rows",
        "n_match",
        (F.col("n_match") == F.col("n_rows")).alias("ok"),
    )

"""Two-level pruning: manifest part-level zone-map rollups drop whole
parts before the chunk-metadata scan; legacy manifests (no rollup
columns) skip level 1 gracefully."""
from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest

from cuda_float_compress_spark.operators.decode import (
    decode_table,
    qualifying_parts,
)
from cuda_float_compress_spark.operators.direct import decode_table_direct
from cuda_float_compress_spark.operators.encode import encode_table


@pytest.fixture()
def two_range_table(spark, tmp_path):
    """Two append runs with DISJOINT v ranges: run1 parts hold v in
    [0,1000), run2 parts v in [1000,2000)."""
    out = str(tmp_path / "enc2l")
    r1 = spark.createDataFrame(
        [(i, f"doc://a/{i}", i) for i in range(1000)],
        "doc_id: long, url: string, v: long",
    )
    encode_table(spark, r1, out, n_parts=2, resume=False,
                 sort_keys=["v"], chunk_rows=100)
    r2 = spark.createDataFrame(
        [(i, f"doc://b/{i}", 1000 + i) for i in range(1000)],
        "doc_id: long, url: string, v: long",
    )
    encode_table(spark, r2, out, n_parts=2, resume=False,
                 sort_keys=["v"], chunk_rows=100, part_offset=100)
    return out


def test_part_level_pruning_drops_whole_parts(spark, two_range_table):
    out = two_range_table
    parts = qualifying_parts(spark, out, [("v", ">=", 1500)])
    assert parts is not None
    assert set(parts) <= {100, 101}, parts  # run1's parts 0,1 pruned
    # both decode paths stay exact through the two-level prune
    got_d = sorted(
        r["v"] for r in decode_table_direct(
            spark, out, columns=["v"], predicates=[("v", ">=", 1500)]
        ).collect()
    )
    got_s = sorted(
        r["v"] for r in decode_table(
            spark, out, columns=["v"], predicates=[("v", ">=", 1500)]
        ).collect()
    )
    assert got_d == got_s == list(range(1500, 2000))


def test_legacy_manifest_without_rollups(spark, two_range_table):
    """Strip the rollup columns from the manifest (pre-r6 layout): level 1
    returns None and decode answers from chunk-level pruning alone."""
    out = two_range_table
    # rewrite under NEW file names: Spark caches parquet footers by path,
    # so an in-place rewrite would keep serving the old schema (test-only
    # concern — production never rewrites manifests in place)
    for f in glob.glob(os.path.join(out, "manifest", "*.parquet")):
        tbl = pq.read_table(f).drop_columns(["vmin", "vmax"])
        # drop_columns keeps the footer's embedded Spark row-metadata JSON
        # (which still lists vmin/vmax) and Spark trusts IT over the
        # physical columns — strip it so the file reads as truly legacy
        tbl = tbl.replace_schema_metadata(None)
        pq.write_table(tbl, f[:-8] + "-legacy.parquet")
        os.remove(f)
    for crc in glob.glob(os.path.join(out, "manifest", ".*.crc")):
        os.remove(crc)
    assert qualifying_parts(spark, out, [("v", ">=", 1500)]) is None
    got = sorted(
        r["v"] for r in decode_table_direct(
            spark, out, columns=["v"], predicates=[("v", ">=", 1500)]
        ).collect()
    )
    assert got == list(range(1500, 2000))


def test_equality_and_in_part_pruning(spark, two_range_table):
    out = two_range_table
    assert set(qualifying_parts(spark, out, [("v", "==", 42)])) <= {0, 1}
    both = set(qualifying_parts(spark, out, [("v", "in", [42, 1999])]))
    assert both <= {0, 1, 100, 101}
    assert both & {0, 1} and both & {100, 101}  # a part from each range
    none = qualifying_parts(spark, out, [("v", ">=", 5000)])
    assert none == []

"""Z-order clustering: Morton key correctness vs a pure-Python twin, and
the actual point of the operator — a 2-D box predicate prunes MORE chunks
on a z-ordered encode than on a 1-D sorted encode, with identical decoded
results either way."""
from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from cuda_float_compress_spark.operators.zorder import (
    ZKEY_COL,
    cluster_by_zorder,
    morton_interleave_ref,
    with_zorder_key,
    zorder_bounds,
)


def test_morton_key_matches_reference_2col(spark):
    rows = [(x, y) for x in range(0, 64, 7) for y in range(0, 64, 5)]
    df = spark.createDataFrame(rows, "x: long, y: long")
    bounds = {"x": (0, 63), "y": (0, 63)}
    got = {
        (r["x"], r["y"]): r[ZKEY_COL]
        for r in with_zorder_key(df, ["x", "y"], bits=6,
                                 bounds=bounds).collect()
    }
    for (x, y), z in got.items():
        assert z == morton_interleave_ref([x, y], 6), (x, y)


def test_morton_key_matches_reference_3col(spark):
    rows = [(x, y, w) for x in range(8) for y in range(8) for w in range(8)]
    df = spark.createDataFrame(rows, "x: long, y: long, w: long")
    bounds = {c: (0, 7) for c in ("x", "y", "w")}
    for r in with_zorder_key(df, ["x", "y", "w"], bits=3,
                             bounds=bounds).collect():
        assert r[ZKEY_COL] == morton_interleave_ref(
            [r["x"], r["y"], r["w"]], 3
        )


def test_quantization_shift_and_nulls(spark):
    # range 0..1023 at bits=4 → shift 6; nulls land on vmin (key 0 on x-axis)
    df = spark.createDataFrame(
        [(0, 0), (1023, 0), (None, 0), (512, 0)], "x: long, y: long"
    )
    bounds = {"x": (0, 1023), "y": (0, 3)}
    got = {r["x"]: r[ZKEY_COL]
           for r in with_zorder_key(df, ["x", "y"], bits=4,
                                    bounds=bounds).collect()}
    assert got[0] == 0 and got[None] == 0
    assert got[1023] == morton_interleave_ref([15, 0], 4)
    assert got[512] == morton_interleave_ref([8, 0], 4)


def test_bounds_and_validation(spark):
    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 2))], "a: long, t: timestamp"
    )
    b = zorder_bounds(df, ["a", "t"])
    assert b["a"] == (1, 1)
    assert b["t"][0] == int(dt.datetime(2024, 1, 2).timestamp() * 1e6)
    with pytest.raises(ValueError):
        with_zorder_key(df, ["a"])
    with pytest.raises(ValueError):
        with_zorder_key(df, ["a", "t"], bits=32)
    with pytest.raises(ValueError):
        with_zorder_key(df.withColumn("s", F.lit("x")), ["a", "s"])


def _grid(spark, n_side=256):
    rows = [(x, y, x * n_side + y) for x in range(n_side)
            for y in range(n_side)]
    df = spark.createDataFrame(rows, "x: long, y: long, payload: long")
    return df.withColumn(
        "url", F.concat(F.lit("grid://r/"), F.col("payload"))
    )


def test_zorder_prunes_more_chunks_than_1d_sort(spark, scratch):
    from cuda_float_compress_spark.operators.decode import (
        committed_blocks,
        qualifying_chunks,
    )
    from cuda_float_compress_spark.operators.direct import decode_table_direct
    from cuda_float_compress_spark.operators.encode import encode_table

    df = _grid(spark)  # 65,536 rows over a 256x256 grid
    # 32-aligned 32x32 box: exactly one contiguous 1024-code z-run, so the
    # z-ordered encode touches at most 2 chunks per straddled partition
    # (<=4 total) while the 1-D sort keeps >=2 chunks per partition (the
    # 2048-row x band in each of 4 hash partitions)
    preds = [("x", ">=", 64), ("x", "<=", 95),
             ("y", ">=", 64), ("y", "<=", 95)]

    out_lin = f"{scratch}/lin"
    encode_table(spark, df, out_lin, n_parts=4, resume=False,
                 sort_keys=["x", "y"], chunk_rows=1024)
    out_z = f"{scratch}/z"
    clustered = cluster_by_zorder(df, ["x", "y"], n_parts=4, bits=8)
    encode_table(spark, clustered, out_z, n_parts=4, resume=False,
                 pre_partitioned=True, sort_keys=[ZKEY_COL],
                 chunk_rows=1024)

    counts = {}
    for name, out in (("lin", out_lin), ("z", out_z)):
        blocks = committed_blocks(spark, out)
        total = blocks.select("part_id", "chunk_id").distinct().count()
        kept = qualifying_chunks(blocks, preds).count()
        counts[name] = (kept, total)
    # z prunes on BOTH axes: at least 2x fewer chunks than the 1-D sort
    assert counts["z"][0] * 2 <= counts["lin"][0], counts
    assert counts["z"][0] <= 4, counts

    expect = sorted(
        (r["x"], r["y"], r["payload"])
        for r in df.filter(
            (F.col("x").between(64, 95)) & (F.col("y").between(64, 95))
        ).collect()
    )
    for out in (out_lin, out_z):
        got = sorted(
            (r["x"], r["y"], r["payload"])
            for r in decode_table_direct(
                spark, out, columns=["x", "y", "payload"], predicates=preds
            ).collect()
        )
        assert got == expect


def test_cluster_roundtrip_events_shape(spark, scratch):
    """Timestamp axis end-to-end: cluster on (user_id, ts), encode,
    decode unfiltered — the full row set survives bit-identical."""
    from cuda_float_compress_spark.operators.direct import decode_table_direct
    from cuda_float_compress_spark.operators.encode import encode_table

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, i % 23, base + dt.timedelta(minutes=17 * i), f"u{i % 23}/{i}")
        for i in range(3000)
    ]
    df = spark.createDataFrame(
        rows, "event_id: long, user_id: long, ts: timestamp, url: string"
    )
    clustered = cluster_by_zorder(df, ["user_id", "ts"], n_parts=4, bits=12)
    encode_table(spark, clustered, scratch, n_parts=4, resume=False,
                 pre_partitioned=True, sort_keys=[ZKEY_COL])
    got = sorted(
        (r["event_id"], r["user_id"], r["ts"])
        for r in decode_table_direct(
            spark, scratch, columns=["event_id", "user_id", "ts"]
        ).collect()
    )
    assert got == sorted((r[0], r[1], r[2]) for r in rows)

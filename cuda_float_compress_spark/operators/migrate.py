"""Archive migration: reference-format blobs -> native blobs, fanned out
over Spark.

The reference wire format (magic 0x00010203, refformat.py) decodes at
~15-30 MB/s/core through the byte-granularity 2-bit permutation — far too
slow for single-process migration of a TB-scale archive. Blobs are fully
independent, so the migration is embarrassingly parallel: one Spark task per
batch of blobs, each task reading, decoding (decompress_ref), re-encoding
natively, and writing its outputs. No shuffle anywhere — the only thing that
moves through Spark is the per-file report row.

Fidelity: the reference format is lossy (eps-grid quantization), so the
DECODED values are the archive's ground truth. mode='lossless' (default)
re-encodes them bit-exactly (compress_lossless_f32); mode='lossy' re-runs
the native lossy path at each blob's own max_error read from its header
(smaller output, values re-quantized onto the native grid).
"""

from __future__ import annotations

import fnmatch
import os

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession

MIGRATE_REPORT_SCHEMA = (
    "name string, n_floats long, ref_bytes long, native_bytes long, "
    "max_error double, ok boolean, error string"
)


def migrate_ref_dir(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    pattern: str = "*",
    mode: str = "lossless",
    suffix: str = ".czn",
    tasks: int | None = None,
) -> DataFrame:
    """Migrate every reference-format blob in ``src_dir`` to a native blob
    ``dst_dir/<name><suffix>``. Returns the per-file report DataFrame
    (collect it to drive the job). Writes are atomic per file (tmp +
    rename), so a crashed migration just re-runs; ``ok`` is a full
    decode-back verification of the written native blob against the
    reference decode (bit-identical for mode='lossless')."""
    if mode not in ("lossless", "lossy"):
        raise ValueError(f"unknown mode: {mode}")
    names = sorted(
        f
        for f in os.listdir(src_dir)
        if fnmatch.fnmatch(f, pattern) and os.path.isfile(os.path.join(src_dir, f))
    )
    os.makedirs(dst_dir, exist_ok=True)
    if not names:
        return spark.createDataFrame([], MIGRATE_REPORT_SCHEMA)
    n_tasks = tasks or min(
        len(names), spark.sparkContext.defaultParallelism * 2
    )
    df = spark.createDataFrame([(n,) for n in names], "name string").repartition(
        n_tasks
    )

    def work(batches):
        import struct as _struct

        import numpy as np

        from cuda_float_compress_spark.compat import (
            compress_lossless_f32,
            cuszplus_compress,
            cuszplus_decompress,
        )
        from cuda_float_compress_spark.refformat import decompress_ref, probe_ref

        for batch in batches:
            rows = {k: [] for k in
                    ("name", "n_floats", "ref_bytes", "native_bytes",
                     "max_error", "ok", "error")}
            for name in batch.column("name").to_pylist():
                blob = b""
                try:
                    # the read sits INSIDE the try: a file deleted or made
                    # unreadable between the driver's listing and this task
                    # is a report row, not a job failure
                    blob = open(os.path.join(src_dir, name), "rb").read()
                    n, eps = probe_ref(blob)  # header epsilon = 2*max_error
                    max_error = eps / 2.0
                    vals = decompress_ref(blob)
                    if mode == "lossless":
                        out = compress_lossless_f32(vals)
                    else:
                        out = cuszplus_compress(vals, max_error=max_error)
                    dst = os.path.join(dst_dir, name + suffix)
                    tmp = dst + ".tmp"
                    with open(tmp, "wb") as fh:
                        fh.write(out)
                    os.replace(tmp, dst)  # atomic publish
                    back = cuszplus_decompress(open(dst, "rb").read())
                    if mode == "lossless":
                        ok = bool(
                            np.array_equal(
                                back.view(np.uint32), vals.view(np.uint32)
                            )
                        )  # bit-identical incl. NaN payloads
                    else:
                        # 1 ulp of slack: the bound itself is a f32 product
                        ok = bool(
                            np.nanmax(np.abs(back - vals), initial=0.0)
                            <= max_error * (1 + 1e-6)
                        )
                    rows["n_floats"].append(int(n))
                    rows["native_bytes"].append(len(out))
                    rows["max_error"].append(float(max_error))
                    rows["ok"].append(ok)
                    rows["error"].append(None)
                except (ValueError, _struct.error, OSError) as e:
                    # (pyarrow's ArrowInvalid subclasses ValueError)
                    # corrupt blob (bad magic, truncated zstd frame, short
                    # header): report the file, don't kill the whole task —
                    # an archive sweep must survive individual bad files
                    rows["n_floats"].append(None)
                    rows["native_bytes"].append(None)
                    rows["max_error"].append(None)
                    rows["ok"].append(False)
                    rows["error"].append(f"{type(e).__name__}: {e}")
                rows["name"].append(name)
                rows["ref_bytes"].append(len(blob))
            yield pa.RecordBatch.from_pydict(
                rows, schema=pa.schema(
                    [
                        ("name", pa.string()),
                        ("n_floats", pa.int64()),
                        ("ref_bytes", pa.int64()),
                        ("native_bytes", pa.int64()),
                        ("max_error", pa.float64()),
                        ("ok", pa.bool_()),
                        ("error", pa.string()),
                    ]
                ),
            )

    return df.mapInArrow(work, MIGRATE_REPORT_SCHEMA)

"""Per-stage metrics: Spark accumulators incremented inside the Arrow UDF
workers + driver-side wall-clock per stage.

Accumulator values feed the engine's metrics snapshots, lineage, and bench
output. In the Spark UI, observability comes from (a) the SQL tab's native
metrics on every exchange/scan/write of the encode plan, and (b)
``pyspark.sql.Observation`` metrics on operators that declare them (the LSH
bucket-cap drop counts in operators/dedup.py) — Python accumulators
themselves are driver-side only (the Scala named-accumulator UI surface has
no PySpark registration API). Mirrors the reference's per-stage timing
harness (interleave_test/interleave_test.cu:424-517, median-of-N reporting).
"""

from __future__ import annotations

import time
from contextlib import contextmanager


class EngineMetrics:
    NAMES = ("rows", "chunks", "raw_bytes", "enc_bytes", "null_values")

    def __init__(self, spark):
        sc = spark.sparkContext
        self.acc = {name: sc.accumulator(0) for name in self.NAMES}
        self.timings: dict[str, float] = {}

    @contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.timings[name] = self.timings.get(name, 0.0) + (
                time.perf_counter() - t0
            )

    def snapshot(self) -> dict:
        out = {k: v.value for k, v in self.acc.items()}
        out["timings_sec"] = dict(self.timings)
        if out["raw_bytes"] and out["enc_bytes"]:
            out["ratio"] = out["raw_bytes"] / out["enc_bytes"]
        return out

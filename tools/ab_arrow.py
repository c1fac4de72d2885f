"""Subprocess-isolated A/B of JVM/arrow configs for the Arrow transfer path.
Each invocation = one fresh JVM = one timing line. Used to pin down the
host's >8-thread first-touch page-fault pathology."""

import json
import statistics
import subprocess
import sys
import time

CHILD = """
import sys, time, statistics; sys.path.insert(0,'/root/repo')
import pyarrow as pa
import pyspark.sql.functions as F
from pyspark.sql import SparkSession
name, cores, opts = sys.argv[1], sys.argv[2], sys.argv[3]
def ident2(batches):
    for bb in batches:
        yield pa.RecordBatch.from_pydict({'n':[bb.num_rows]}, schema=pa.schema([('n', pa.int64())]))
b = (SparkSession.builder.master(f"local[{cores}]").appName(name)
    .config("spark.driver.memory","12g")
    .config("spark.sql.execution.arrow.maxRecordsPerBatch","8192")
    .config("spark.sql.execution.arrow.maxBytesPerBatch",str(4*1024*1024))
    .config("spark.ui.enabled","false"))
if opts:
    b = b.config("spark.driver.extraJavaOptions", opts)
spark = b.getOrCreate(); spark.sparkContext.setLogLevel("ERROR")
d = spark.read.parquet('/root/repo/.scratch/webpages_480000')
d.mapInArrow(ident2, schema="n long").agg(F.sum("n")).collect()
ts=[]
for _ in range(3):
    t0=time.perf_counter()
    d.mapInArrow(ident2, schema="n long").agg(F.sum("n")).collect()
    ts.append(time.perf_counter()-t0)
print("RESULT", statistics.median(ts), min(ts))
spark.stop()
"""

CONFIGS = [
    ("g1", "32", ""),
    ("pretouch", "32", "-Xms12g -XX:+AlwaysPreTouch"),
    ("g1_8c", "8", ""),
]

results = {name: [] for name, _, _ in CONFIGS}
for rep in range(int(sys.argv[1]) if len(sys.argv) > 1 else 2):
    for name, cores, opts in CONFIGS:
        p = subprocess.run(
            [sys.executable, "-c", CHILD, name, cores, opts],
            capture_output=True, text=True, timeout=600,
        )
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("RESULT")]
        if line:
            med, mn = map(float, line[0].split()[1:3])
            results[name].append((med, mn))
            print(f"rep{rep} {name:10s} med={med:.2f} min={mn:.2f}", flush=True)
        else:
            print(f"rep{rep} {name}: FAILED\n{p.stderr[-400:]}", flush=True)
for name, rs in results.items():
    if rs:
        print(f"{name:10s} med-of-meds={statistics.median([r[0] for r in rs]):.2f} best-min={min(r[1] for r in rs):.2f}")

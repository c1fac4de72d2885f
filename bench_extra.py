"""Extra benchmarks for the optimization round (bench.py is FROZEN for
measurement; this file isolates per-query timings and captures plans).

Usage:
  python bench_extra.py --queries dup_span_counts simhash_pairs   # subset
  python bench_extra.py --all                                     # all bench queries
  python bench_extra.py --all --plans plans/r07 --suffix before   # dump plans
  python bench_extra.py --runs 3                                  # median-of-N

Times each query with the noop sink (guide §1.4: computes every column of
every row, no driver collect) after one warm-up run, and optionally writes
``<plans>/<query>_<suffix>.txt`` with the ``.explain("formatted")`` output.
Reads $SPARK_GRAFT_SF_DIR / $SPARK_GRAFT_CPUS like bench.py.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", nargs="*", default=None)
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--plans", type=str, default=None,
                    help="directory to write <query>_<suffix>.txt plans")
    ap.add_argument("--suffix", type=str, default="plan")
    ap.add_argument("--collect", action="store_true",
                    help="time .collect() like bench.py instead of noop sink")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from bench import BENCH_QUERIES

    from cuda_float_compress_spark.session import get_spark

    names = BENCH_QUERIES if (args.all or not args.queries) else args.queries
    spark = get_spark(app="bench_extra", cores=CPUS,
                      shuffle_partitions=max(CPUS, 8))
    qs = entrymod.queries()
    out: dict[str, dict] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        times = []
        for r in range(args.runs + 1):  # +1 warm-up
            t0 = time.perf_counter()
            df = qs[name](spark, SF_DIR)
            if args.collect:
                df.collect()
            else:
                df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            if r > 0:
                times.append(dt)
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                qs[name](spark, SF_DIR).explain("formatted")
            with open(os.path.join(args.plans,
                                   f"{name}_{args.suffix}.txt"), "w") as fh:
                fh.write(buf.getvalue())
        out[name] = {
            "median_sec": round(statistics.median(times), 3),
            "times_sec": [round(t, 3) for t in times],
        }
        print(f"{name}: {out[name]['median_sec']}s {out[name]['times_sec']}",
              file=sys.stderr)
    spark.sparkContext.setJobDescription(None)
    spark.stop()
    print(json.dumps({"sf_dir": SF_DIR, "cpus": CPUS, "runs": args.runs,
                      "mode": "collect" if args.collect else "noop",
                      "queries": out}))


if __name__ == "__main__":
    main()

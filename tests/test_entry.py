"""Contract tests for __spark_entry__ (the driver's smoke + correctness gate)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod


def test_entry_returns_all_ok(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert all(r["ok"] for r in rows)
    assert all(r["ratio"] > 1.0 for r in rows if r["column"] == "text")


def test_every_oracle_key_has_a_query():
    qs = entrymod.queries()
    for name in entrymod.oracle_sql():
        assert name in qs, name


def test_queries_run_at_sf0001(spark):
    # smoke every query at the smallest sf (fast); row counts only
    qs = entrymod.queries()
    for name, fn in qs.items():
        df = fn(spark, "/root/testdata/sf0.001")
        assert df.count() >= 0, name


def test_pyfiles_package_imports_cleanly(tmp_path):
    """The spark-submit --py-files artifact is self-contained: a fresh
    interpreter with ONLY the zip on sys.path can import the package and run
    a codec round-trip (what an executor does after unpacking --py-files)."""
    import subprocess
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.package_pyfiles import build

    dest = str(tmp_path / "pkg.zip")
    build(dest)
    code = (
        "import sys; sys.path.insert(0, %r); "
        "import numpy as np; "
        "from cuda_float_compress_spark.codecs import core; "
        "v = np.arange(1000, dtype=np.int64); "
        "p, prm = core.int_delta_encode(v); "
        "assert (core.int_delta_decode(p, prm, 1000) == v).all(); "
        "from cuda_float_compress_spark import compat; "
        "x = np.ones(100, dtype=np.float32); "
        "assert len(compat.cuszplus_decompress(compat.cuszplus_compress(x))) == 100; "
        "print('PKG_OK')" % dest
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        cwd=str(tmp_path), timeout=120,
    )
    assert out.returncode == 0 and "PKG_OK" in out.stdout, out.stderr[-2000:]

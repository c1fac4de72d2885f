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

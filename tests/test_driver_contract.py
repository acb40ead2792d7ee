"""The driver contract must never regress again: entry() runs, every
queries() key has a callable, and oracle coverage is explicit."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402


def test_registry_loads():
    from kinesis_vcr_spark.queries import all_queries

    qs = all_queries()
    assert len(qs) >= 11
    for name, spec in qs.items():
        assert callable(spec.spark_fn), name


def test_queries_and_oracles_align():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    # every oracle is a non-empty SQL string
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in oracles.values())


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns

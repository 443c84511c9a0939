"""Smoke tests for the driver contract surface."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    cols = set(df.columns)
    assert {"c_custkey", "total_orders", "total_spent", "customer_value_tier"} <= cols


def test_queries_and_oracles_consistent():
    from medallion_data_lake_spark.queries import DRIVER_QUERY_CAP

    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert len(q) >= 20
    # the driver's correctness gate records at most 50 queries (round 1:
    # entries past #50 were silently dropped) — never exceed it
    assert len(q) <= DRIVER_QUERY_CAP
    assert set(o) <= set(q)
    # every oracle is non-empty SQL text
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in o.values())

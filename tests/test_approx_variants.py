"""Approx scale variants track their exact twins within sketch bounds."""

from __future__ import annotations

from medallion_data_lake_spark.queries import load_all_extra

REGISTRY = load_all_extra()


def test_approx_percentile_within_2pct_of_exact(spark, sf_dir):
    exact = {
        r["l_returnflag"]: (r["p50_price"], r["p90_price"])
        for r in REGISTRY["price_distribution_stats"].build(spark, sf_dir).collect()
    }
    approx = {
        r["l_returnflag"]: (r["p50_price"], r["p90_price"])
        for r in REGISTRY["price_distribution_approx"].build(spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for flag, (p50, p90) in exact.items():
        a50, a90 = approx[flag]
        assert abs(a50 - p50) / p50 < 0.02
        assert abs(a90 - p90) / p90 < 0.02


def test_approx_count_distinct_within_rsd_of_exact(spark, sf_dir):
    exact = {
        r["o_orderpriority"]: r["unique_customers"]
        for r in REGISTRY["order_priority_stats"].build(spark, sf_dir).collect()
    }
    approx = {
        r["o_orderpriority"]: r["approx_unique_customers"]
        for r in REGISTRY["order_priority_stats_approx"].build(spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for prio, n in exact.items():
        # rsd=0.05 -> generous 4-sigma acceptance band
        assert abs(approx[prio] - n) / n < 0.20

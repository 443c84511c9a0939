"""bench.py plan fingerprints: the normalization must make the digest
a function of the PLAN alone — stable across scale-factor paths and
expression-id renumbering — so a round-over-round fingerprint match
proves a timing swing is machine weather (the r6 lesson)."""

from __future__ import annotations

from bench import plan_fingerprint
from medallion_data_lake_spark.queries import load_all_extra

REG = load_all_extra()


def test_fingerprint_stable_across_sf_dirs(spark):
    a = plan_fingerprint(REG["pricing_summary"].build(
        spark, "/root/testdata/sf0.001"))
    b = plan_fingerprint(REG["pricing_summary"].build(
        spark, "/root/testdata/sf0.01"))
    assert a == b  # data path stripped: same plan, same fp


def test_fingerprint_stable_across_rebuilds(spark):
    # rebuilding the same query renumbers expression IDs (#123) —
    # normalization must erase that
    a = plan_fingerprint(REG["regional_revenue"].build(
        spark, "/root/testdata/sf0.001"))
    b = plan_fingerprint(REG["regional_revenue"].build(
        spark, "/root/testdata/sf0.001"))
    assert a == b


def test_fingerprint_distinguishes_plans(spark):
    fps = {
        plan_fingerprint(REG[n].build(spark, "/root/testdata/sf0.001"))
        for n in ("pricing_summary", "regional_revenue", "top_revenue_parts")
    }
    assert len(fps) == 3  # different plans, different digests

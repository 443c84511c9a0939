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


def test_fingerprint_stable_across_lambda_counter(spark):
    """REGRESSION (r8): Spark names higher-order-function lambda
    variables with a SESSION-GLOBAL counter (x_1, x_3, ...), so the
    same HOF-bearing plan renders differently depending on how many
    lambda plans the session built before it. The normalization must
    erase that, or every documents/embeddings query's fingerprint
    depends on test execution order."""
    a = plan_fingerprint(REG["doc_lang_id"].build(
        spark, "/root/testdata/sf0.001"))
    # burn lambda counters with OTHER HOF-bearing plans
    for n in ("doc_quality_score", "knn_bruteforce_cosine"):
        REG[n].build(spark, "/root/testdata/sf0.001")
    b = plan_fingerprint(REG["doc_lang_id"].build(
        spark, "/root/testdata/sf0.001"))
    assert a == b


def test_fingerprint_distinguishes_plans(spark):
    fps = {
        plan_fingerprint(REG[n].build(spark, "/root/testdata/sf0.001"))
        for n in ("pricing_summary", "regional_revenue", "top_revenue_parts")
    }
    assert len(fps) == 3  # different plans, different digests

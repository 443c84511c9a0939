"""Model-tier quality classifier: train on weak labels, score JVM-side.

Asserted properties:
- weak labeling keeps only margin-separated docs with 0/1 labels;
- the trained model separates held-out weakly-labeled docs (accuracy
  well above chance — the model learned the signal, not memorized ids);
- scoring annotates every row with a [0,1] probability and is
  deterministic for a fixed fitted model;
- the scoring plan contains no Python workers (JVM-only inference).
"""

from __future__ import annotations

import pytest

from medallion_data_lake_spark.catalog import load_star_table_spread
from medallion_data_lake_spark.operators.classifier import (
    score_quality,
    train_quality_classifier,
    weak_quality_labels,
)
from medallion_data_lake_spark.plans import explain_str

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return load_star_table_spread(spark, SF, "documents", "doc_id").cache()


@pytest.fixture(scope="module")
def labeled(docs):
    return weak_quality_labels(docs).cache()


@pytest.fixture(scope="module")
def model(labeled):
    train = labeled.filter("doc_id % 5 != 0")
    return train_quality_classifier(train)


def test_weak_labels_are_margin_separated(docs, labeled):
    n_docs = docs.count()
    rows = labeled.select("label").groupBy("label").count().collect()
    by = {r.label: r["count"] for r in rows}
    assert set(by) == {0.0, 1.0}
    # the middle band is dropped
    assert sum(by.values()) < n_docs


def test_model_separates_holdout(labeled, model):
    holdout = labeled.filter("doc_id % 5 = 0")
    scored = score_quality(model, holdout)
    agree = scored.filter(
        "(model_quality >= 0.5) = (label = 1.0)"
    ).count()
    total = holdout.count()
    assert total > 20
    assert agree / total >= 0.85, f"holdout accuracy {agree}/{total}"


def test_scores_every_row_in_unit_interval(docs, model):
    scored = score_quality(model, docs)
    assert scored.count() == docs.count()
    bad = scored.filter("model_quality < 0 OR model_quality > 1").count()
    assert bad == 0


def test_scoring_plan_is_jvm_only(docs, model):
    scored = score_quality(model, docs)
    plan = explain_str(scored)
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, marker


def test_weak_labels_match_rule_tier_score(spark, docs, labeled):
    """The bootstrap labels must come from the SAME score as the
    oracle-checked doc_quality_score query (shared quality_score_expr):
    every label-1 doc scores >= every label-0 doc."""
    from pyspark.sql import functions as F

    from medallion_data_lake_spark.queries.text import quality_score_expr

    scored = docs.select(
        "doc_id", quality_score_expr(F.col("text")).alias("q")
    )
    j = labeled.select("doc_id", "label").join(scored, "doc_id")
    max0 = j.filter("label = 0.0").agg(F.max("q")).first()[0]
    min1 = j.filter("label = 1.0").agg(F.min("q")).first()[0]
    assert max0 <= min1, (max0, min1)


def test_weak_labels_empty_input_raises(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError, match="empty input"):
        weak_quality_labels(empty)


def test_weak_labels_degenerate_distribution_raises(spark):
    same = spark.createDataFrame(
        [(i, "identical text every time") for i in range(50)],
        "doc_id long, text string",
    )
    with pytest.raises(ValueError, match="degenerate"):
        weak_quality_labels(same)

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

"""Trainable document-quality classifier — the model tier, Spark-first.

The heuristic quality score (``queries/text.py:doc_quality_score``) is
the rule tier of a training-data pipeline; production pipelines follow
it with a learned filter (fastText-style linear model over hashed
bag-of-words — the CCNet / LLaMA-data recipe). On Spark the idiomatic
form is NOT a Python UDF calling a model per row: MLlib's
HashingTF → (IDF) → LogisticRegression is the same hashed-linear model
family, trains distributed, and SCORES entirely JVM-side (the fitted
pipeline's transform is codegen'd expressions + a broadcast coefficient
vector) — zero Python workers in the 100 TB scoring path.

Bootstrapping: with no human labels in the fixtures, training uses weak
labels from the rule tier (top/bottom quantiles of the heuristic score —
standard self-training bootstrap; swap in real labels by passing any
0/1 ``label`` column). The model then generalizes beyond the rules it
was seeded with.

Scale notes: featurization + scoring are map-side (hashing trick, fixed
``dim`` — no vocabulary shuffle, no OOV state); training cost is
per-iteration treeAggregate over gradient partials (L-BFGS), bounded by
``max_iter``; inference is a broadcast of one dim-sized dense vector.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_DIM = 4096


def weak_quality_labels(
    df: DataFrame,
    text_col: str = "text",
    lo: float = 0.3,
    hi: float = 0.7,
) -> DataFrame:
    """Rule-tier bootstrap labels: 1 for documents in the top quantile of
    the rule-tier score (the SAME ``quality_score`` expression as the
    oracle-checked ``queries/text.py:doc_quality_score`` — shared via
    ``quality_score_expr`` so the tiers cannot drift), 0 for the bottom,
    rows between dropped (standard weak-supervision margin). Quantile
    cuts via approx_percentile — one pass, no global sort.

    Raises ``ValueError`` on an empty input or a degenerate score
    distribution (lo/hi quantile cuts equal — e.g. all-identical
    documents), where top/bottom quantiles don't separate classes and
    training on them would be meaningless.
    """
    from ..queries.text import quality_score_expr

    scored = df.withColumn("_h", quality_score_expr(F.col(text_col)))
    row = scored.select(
        F.percentile_approx("_h", F.array(F.lit(lo), F.lit(hi))).alias("c")
    ).first()
    cuts = row["c"] if row is not None else None
    if not cuts or cuts[0] is None:
        raise ValueError("weak_quality_labels: empty input, nothing to label")
    if not cuts[0] < cuts[1]:
        raise ValueError(
            f"weak_quality_labels: degenerate score distribution "
            f"(quantile cuts {cuts[0]} == {cuts[1]}); the rule tier cannot "
            "separate high/low quality here — provide real labels instead"
        )
    return (
        scored.filter((F.col("_h") <= cuts[0]) | (F.col("_h") >= cuts[1]))
        .withColumn("label", (F.col("_h") >= cuts[1]).cast("double"))
        .drop("_h")
    )


def train_quality_classifier(
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    dim: int = DEFAULT_DIM,
    max_iter: int = 20,
    reg_param: float = 1e-3,
):
    """Fit the hashed-linear quality model; returns a fitted PipelineModel
    whose ``transform`` adds ``probability``/``prediction`` JVM-side.

    The fitted LR's training summary is STRIPPED before returning: the
    summary object holds a SparkSession reference, and the model ships
    inside every scoring task's closure (MLlib's transform captures the
    model in its UDF) — a session in a task closure is both a
    serialization landmine (non-serializable session internals, e.g. the
    ObservationManager once any ``observe`` ran) and dead broadcast
    weight. Scoring needs only the coefficient vector.
    """
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, RegexTokenizer

    tok = RegexTokenizer(
        inputCol=text_col, outputCol="_toks", pattern=r"\s+", minTokenLength=1
    )
    tf = HashingTF(inputCol="_toks", outputCol="_feat", numFeatures=dim)
    lr = LogisticRegression(
        featuresCol="_feat",
        labelCol=label_col,
        maxIter=max_iter,
        regParam=reg_param,
        standardization=False,
    )
    model = Pipeline(stages=[tok, tf, lr]).fit(labeled)
    try:
        jvm = labeled.sparkSession._jvm
        scala_none = getattr(getattr(jvm.scala, "None$"), "MODULE$")
        model.stages[-1]._java_obj.setSummary(scala_none)
    except Exception:
        pass  # best-effort (e.g. Connect, where closures don't apply)
    return model


def score_quality(
    model,
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "model_quality",
) -> DataFrame:
    """Score a corpus: P(high quality) per document, all JVM-side."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(df)
    return scored.withColumn(
        out_col, F.round(vector_to_array(F.col("probability"))[1], 6)
    ).drop("_toks", "_feat", "rawPrediction", "probability", "prediction")

"""Count-based language-model scoring for corpus quality filtering.

The production pattern (CCNet, Gopher/MassiveText, RefinedWeb): score
every document by perplexity under a language model trained on a
trusted reference corpus; drop (or bucket) the tail. The heavy lifting
is relational — token counting, probability lookup, per-document
averaging — and belongs on the cluster; the model itself is a TABLE
(term → log-prob), which is exactly what Spark distributes well.

This module ships the full shape with an honest model tier: an add-k
smoothed UNIGRAM model (a real-if-weak signal — it catches gibberish,
encoding noise, wrong-language text). A KenLM-style n-gram or neural
scorer drops into the same plumbing by replacing the vocab table /
scoring join; nothing else changes.

Scale shape:
- training = one explode + one two-stage count aggregation over the
  reference shard (identical plan to ``corpus_vocab_topk``), top-V cut
  via TakeOrderedAndProject — never a global sort;
- scoring = explode + join tokens→vocab. The vocab is top-V (bounded
  by construction), so the join side is broadcast — scoring is a pure
  map-side pass plus ONE shuffle for the per-doc average;
- out-of-vocabulary tokens take the smoothed OOV mass via coalesce
  after a LEFT join — absent terms cost nothing extra.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..queries.text import tokens


@dataclass(frozen=True)
class UnigramLM:
    """The trained model: a bounded (term, logp) table + scalar stats.

    ``vocab`` has exactly ``min(V, vocab_size)`` rows; ``oov_logp`` is
    the add-k mass for unseen terms, so every possible token has a
    finite log-probability and scoring never divides by zero.
    """

    vocab: DataFrame  # (term string, logp double)
    oov_logp: float
    n_tokens: int
    n_vocab: int


def train_unigram_lm(
    reference: DataFrame,
    text_col: str = "text",
    vocab_size: int = 50_000,
    add_k: float = 0.5,
) -> UnigramLM:
    """Fit the smoothed unigram model on a reference corpus.

    p(t) = (count(t) + k) / (N + k·(V+1)); the +1 reserves one
    pseudo-type for OOV. Vocabulary cut is deterministic
    (count desc, term asc). Two Spark jobs: the scalar totals and the
    top-V collect-free limit.
    """
    counts = (
        reference.select(F.explode(tokens(F.col(text_col))).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    totals = counts.agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("v")
    ).first()
    n_tokens = int(totals["n"] or 0)
    n_vocab = int(totals["v"] or 0)
    denom = n_tokens + add_k * (n_vocab + 1)
    vocab = (
        counts.orderBy(F.desc("c"), F.asc("term"))
        .limit(vocab_size)
        .select(
            "term",
            F.log((F.col("c") + F.lit(add_k)) / F.lit(denom)).alias("logp"),
        )
    )
    return UnigramLM(
        vocab=vocab,
        oov_logp=math.log(add_k / denom) if denom > 0 else float("-inf"),
        n_tokens=n_tokens,
        n_vocab=n_vocab,
    )


def score_documents(
    docs: DataFrame,
    lm: UnigramLM,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document LM score: avg token log-prob and perplexity.

    Returns ``docs`` columns + (n_tokens, avg_logp, perplexity). Plan:
    explode → LEFT broadcast-join to the bounded vocab → coalesce OOV →
    one groupBy(id) average. Empty/whitespace-only docs score as pure
    OOV (one pseudo-token) rather than NULL, so downstream threshold
    filters treat them as worst-case instead of silently passing.
    """
    toks = docs.select(
        F.col(id_col),
        F.explode_outer(
            # empty docs explode to one NULL token = one OOV pseudo-token
            F.filter(tokens(F.col(text_col)), lambda t: t != "")
        ).alias("term"),
    )
    scored = (
        toks.join(F.broadcast(lm.vocab), "term", "left")
        .groupBy(id_col)
        .agg(
            F.sum(F.lit(1)).alias("n_tokens"),
            F.avg(F.coalesce(F.col("logp"), F.lit(lm.oov_logp))).alias("avg_logp"),
        )
        .withColumn("perplexity", F.exp(-F.col("avg_logp")))
    )
    return docs.join(scored, id_col, "left")


def perplexity_filter(
    docs: DataFrame,
    lm: UnigramLM,
    max_perplexity: float,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Keep documents under the perplexity ceiling (the CCNet "head"
    cut). Score columns stay attached for auditability."""
    return score_documents(docs, lm, id_col, text_col).filter(
        F.col("perplexity") <= max_perplexity
    )

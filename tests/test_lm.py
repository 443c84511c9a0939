"""Unigram LM scoring: model math against hand-computed values, the
scale-shape claims against the executed plan, and the registry query
against its DuckDB oracle (the extra-registry parity sweep also covers
it; the direct test here keeps failures local)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from medallion_data_lake_spark.operators.lm import (
    perplexity_filter,
    score_documents,
    train_unigram_lm,
)

ADD_K = 0.5


@pytest.fixture(scope="module")
def tiny(spark):
    return spark.createDataFrame(
        [
            (1, "a a b"),
            (2, "a b c"),
            (3, "zz zz zz"),   # all-OOV once vocab is cut to 2
            (4, "   "),        # whitespace-only -> one OOV pseudo-token
        ],
        "doc_id long, text string",
    )


def test_model_math_by_hand(tiny, spark):
    lm = train_unigram_lm(tiny, vocab_size=2, add_k=ADD_K)
    # corpus tokens: a×3, b×2, c×1, zz×3  -> N=9, V=4
    assert lm.n_tokens == 9 and lm.n_vocab == 4
    denom = 9 + ADD_K * 5
    assert lm.oov_logp == pytest.approx(math.log(ADD_K / denom))
    vocab = {r["term"]: r["logp"] for r in lm.vocab.collect()}
    # top-2 cut by (count desc, term asc): a(3), zz(3) tie-broken vs b(2)
    assert set(vocab) == {"a", "zz"}
    assert vocab["a"] == pytest.approx(math.log((3 + ADD_K) / denom))


def test_scores_and_oov_floor(tiny):
    lm = train_unigram_lm(tiny, vocab_size=2, add_k=ADD_K)
    out = {r["doc_id"]: r for r in score_documents(tiny, lm).collect()}
    denom = 9 + ADD_K * 5
    lp_a, lp_oov = math.log(3.5 / denom), math.log(0.5 / denom)
    # doc1 = (2·lp_a + lp_oov)/3   (b is OOV after the cut)
    assert out[1]["avg_logp"] == pytest.approx((2 * lp_a + lp_oov) / 3)
    assert out[1]["n_tokens"] == 3
    # doc3 is pure in-vocab zz; doc4 is the empty-doc pseudo-token case
    assert out[3]["avg_logp"] == pytest.approx(lp_a)  # zz count == a count
    assert out[4]["n_tokens"] == 1
    assert out[4]["avg_logp"] == pytest.approx(lp_oov)
    assert out[4]["perplexity"] == pytest.approx(math.exp(-lp_oov))


def test_filter_drops_gibberish_keeps_head(tiny):
    lm = train_unigram_lm(tiny, vocab_size=2, add_k=ADD_K)
    scores = score_documents(tiny, lm)
    cut = scores.filter(F.col("doc_id").isin(1, 3)).agg(
        F.max("perplexity")
    ).first()[0]
    kept = perplexity_filter(tiny, lm, max_perplexity=cut + 1e-9)
    ids = {r["doc_id"] for r in kept.collect()}
    assert 4 not in ids          # the all-OOV doc scores worst
    assert {1, 3} <= ids


def test_scoring_plan_broadcasts_vocab(tiny):
    lm = train_unigram_lm(tiny, vocab_size=2, add_k=ADD_K)
    plan = (
        score_documents(tiny, lm)._jdf.queryExecution().executedPlan().toString()
    )
    # the tokens->vocab lookup must be a broadcast hash join (vocab is
    # bounded top-V by construction); the docs<-scores reattach may
    # legitimately be whatever AQE picks
    assert "BroadcastHashJoin" in plan, plan


def test_registry_query_matches_oracle(spark):
    from tests.test_oracle_parity import compare

    compare(spark, "doc_unigram_logprob", "/root/testdata/sf0.001")


def test_lm_stage_in_curate_corpus(spark):
    from medallion_data_lake_spark.catalog import load_star_table
    from medallion_data_lake_spark.operators.curation_pipeline import (
        CurationConfig,
        curate_corpus,
    )

    docs = load_star_table(spark, "/root/testdata/sf0.001", "documents")
    lm = train_unigram_lm(docs, vocab_size=20)
    # median perplexity as the cut: roughly half the corpus survives
    med = (
        score_documents(docs, lm)
        .agg(F.expr("approx_percentile(perplexity, 0.5)"))
        .first()[0]
    )
    stages = curate_corpus(
        docs, config=CurationConfig(max_perplexity=float(med)), lm=lm
    )
    assert "lm_filtered" in stages
    n_in = stages["near_deduped"].count()
    n_lm = stages["lm_filtered"].count()
    assert 0 < n_lm < n_in
    assert stages["lm_filtered"].columns == docs.columns  # score cols dropped
    assert stages["curated"].count() == n_lm  # no later stage configured

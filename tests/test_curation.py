"""Behavioral + plan properties of the training-data curation operators.

Oracle parity (tests/test_oracle_parity.py) proves the values; these
tests pin the properties parity can't see: plan shape (broadcast, no
extra scans), determinism of the hash-gated sample, and conservation
laws of the packing plan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from medallion_data_lake_spark.plans import explain_str, has_broadcast_join
from medallion_data_lake_spark.queries import load_all_extra
from medallion_data_lake_spark.queries.curation import (
    BENCH_SOURCE,
    PACK_TOKEN_BUDGET,
    SAMPLE_RATES_PER_MILLE,
)

REG = load_all_extra()
SF = "/root/testdata/sf0.001"


def test_decontaminate_broadcasts_benchmark_side(spark):
    df = REG["decontaminate_ngram_overlap"].build(spark, SF)
    assert has_broadcast_join(df)
    assert "CartesianProduct" not in explain_str(df)


def test_decontaminate_excludes_benchmark_and_bounds_ratio(spark):
    df = REG["decontaminate_ngram_overlap"].build(spark, SF)
    rows = df.collect()
    assert rows, "fixture corpus shares vocabulary; expect contamination hits"
    bench_ids = {
        r.doc_id
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("source") == BENCH_SOURCE)
        .select("doc_id")
        .collect()
    }
    for r in rows:
        assert r.doc_id not in bench_ids
        assert 1 <= r.n_shared_ngrams <= r.n_doc_ngrams
        assert 0.0 < r.contamination_ratio <= 1.0


def test_stratified_sample_is_deterministic_and_bounded(spark):
    a = {r.lang: r for r in REG["stratified_sample_audit"].build(spark, SF).collect()}
    b = {r.lang: r for r in REG["stratified_sample_audit"].build(spark, SF).collect()}
    assert a.keys() == b.keys()
    for lang, r in a.items():
        # hash-gated membership: bit-identical across runs (the property
        # rand()-based sampleBy does not have)
        assert (r.n_sampled, r.sampled_id_sum) == (
            b[lang].n_sampled,
            b[lang].sampled_id_sum,
        )
        assert 0 <= r.n_sampled <= r.n_total
        assert r.rate_per_mille == SAMPLE_RATES_PER_MILLE.get(lang, 500)


def test_blocklist_scrub_invariants(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", F.length("text").alias("char_len")
    )
    out = REG["blocklist_scrub_stats"].build(spark, SF).join(docs, "doc_id")
    bad = out.filter(
        (F.col("scrubbed_len") > F.col("char_len"))
        | (F.col("keep") != (F.col("hit_ratio") <= 0.09))
        | (F.col("n_hits") < 0)
    )
    assert bad.count() == 0
    # both classes occur at the chosen threshold (non-degenerate flag)
    kept = out.filter("keep").count()
    assert 0 < kept < out.count()


def test_sequence_packing_conserves_docs_and_tokens(spark):
    out = REG["sequence_packing_plan"].build(spark, SF)
    totals = out.agg(
        F.sum("n_docs").alias("docs"), F.sum("seq_tokens").alias("toks")
    ).collect()[0]
    src = spark.read.parquet(f"{SF}/documents.parquet")
    n_docs = src.count()
    n_toks = src.select(
        F.sum(F.size(F.split(F.trim("text"), r"\s+"))).alias("t")
    ).collect()[0].t
    assert totals.docs == n_docs
    assert totals.toks == n_toks
    # sequence ids are dense per shard: 0..max with no gaps, and every
    # sequence's preceding cumulative load fits the budget definition
    per_src = (
        out.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_seq"),
            F.max("seq_id").alias("max_seq"),
            F.min("seq_id").alias("min_seq"),
        )
        .collect()
    )
    for r in per_src:
        assert r.min_seq == 0
        assert r.n_seq == r.max_seq + 1
    # bin-boundary law: bin k+1 opens only once the cumulative token
    # count has crossed (k+1)*budget, so the prefix sum through every
    # non-final bin is >= (bin_index+1) * budget
    w_rows = out.orderBy("source", "seq_id").collect()
    by_src: dict[str, list] = {}
    for r in w_rows:
        by_src.setdefault(r.source, []).append(r)
    for rows in by_src.values():
        prefix = 0
        for r in rows[:-1]:
            prefix += r.seq_tokens
            assert prefix >= (r.seq_id + 1) * PACK_TOKEN_BUDGET

"""Materialized semantic-dedup verdict table
(operators/semantic_verdict.py): the r14 amortization of the
per-curation semantic recompute.

Contract under test:
- initial materialization equals batch semantic_dedup under the same
  pinned codebook, row for row;
- the curation pipeline's verdict-table route equals the in-pipeline
  semantic stage when upstream stages drop nothing (same population);
- increments are append-monotone: existing rows never change, new
  near-dups of existing docs join the existing group as non-keepers,
  new-new duplicate batches collapse with min-id keepers;
- provenance/coverage guards refuse a missing sidecar, mismatched
  params, and uncovered docs.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from medallion_data_lake_spark.operators.ann import (
    fit_semantic_codebook,
    semantic_dedup,
)
from medallion_data_lake_spark.operators.semantic_verdict import (
    materialize_semantic_verdict,
    read_verdict_sidecar,
)
from medallion_data_lake_spark.operators.versioned import read_table

DIM = 16


def _vecs(spark, n=60, dup_pairs=((0, 50), (1, 51)), seed=5):
    """n well-separated vectors; listed (orig, dup) pairs share a
    near-identical vector (cosine ~0.999)."""
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n, DIM))
    for orig, dup in dup_pairs:
        base[dup] = base[orig] + 0.01 * rng.standard_normal(DIM)
    return spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(n)],
        "vec_id long, embedding array<double>")


def _docs_of(emb):
    return emb.select(
        F.col("vec_id").alias("doc_id"),
        F.concat(F.lit("doc "), F.col("vec_id")).alias("text"),
        F.lit("en").alias("lang"), F.lit("web").alias("source"))


def test_initial_materialization_equals_batch(spark, tmp_path):
    emb = _vecs(spark)
    docs = _docs_of(emb)
    cb = str(tmp_path / "cb")
    fit_semantic_codebook(emb, cb, cluster_size=16)
    table = str(tmp_path / "verdict")
    rep = materialize_semantic_verdict(
        spark, docs, emb, table, cb, threshold=0.9, cluster_size=16)
    assert rep["mode"] == "initial" and rep["n_total"] == 60
    assert read_verdict_sidecar(table)["threshold"] == 0.9

    from medallion_data_lake_spark.operators.ann import (
        load_semantic_codebook,
    )

    batch = semantic_dedup(
        emb.withColumnRenamed("vec_id", "doc_id"), id_col="doc_id",
        threshold=0.9, cluster_size=16, dim=DIM,
        model=load_semantic_codebook(cb),
        keep_base_cell=True)  # r16: the table persists the base cell
    got = sorted(tuple(r) for r in read_table(spark, table).collect())
    want = sorted(tuple(r) for r in batch.collect())
    assert got == want


def test_increment_append_monotone(spark, tmp_path):
    emb = _vecs(spark)
    docs = _docs_of(emb)
    cb = str(tmp_path / "cb")
    fit_semantic_codebook(emb, cb, cluster_size=16)
    table = str(tmp_path / "verdict")
    materialize_semantic_verdict(spark, docs, emb, table, cb,
                                 threshold=0.9, cluster_size=16)
    before = {r["doc_id"]: (r["group_id"], r["is_kept"])
              for r in read_table(spark, table).collect()}

    # append: 100 = near-dup of existing 0; 101/102 = near-dups of each
    # other (new-new); 103 = unique
    rng = np.random.default_rng(5)
    base = rng.standard_normal((60, DIM))  # same seed → same base[0]
    v0 = base[0]
    fresh = np.random.default_rng(99).standard_normal((2, DIM))
    new_emb = spark.createDataFrame(
        [(100, [float(x) for x in v0 + 0.012 * fresh[0] * 0.1]),
         (101, [float(x) for x in fresh[0]]),
         (102, [float(x) for x in fresh[0] + 0.01 * fresh[1]]),
         (103, [float(x) for x in fresh[1]])],
        "vec_id long, embedding array<double>")
    all_emb = emb.unionByName(new_emb)
    all_docs = _docs_of(all_emb)
    rep = materialize_semantic_verdict(spark, all_docs, all_emb, table, cb,
                                       threshold=0.9, cluster_size=16)
    assert rep["mode"] == "incremental" and rep["n_new"] == 4
    assert rep["n_total"] == 64

    after = {r["doc_id"]: (r["group_id"], r["is_kept"])
             for r in read_table(spark, table).collect()}
    # append-monotone: every pre-existing verdict is unchanged
    assert all(after[d] == v for d, v in before.items())
    # 100 joined 0's existing group as a non-keeper
    assert after[100] == (before[0][0], False)
    # 101/102 collapse with min-id keeper; 103 is its own keeper
    assert after[101] == (101, True)
    assert after[102] == (101, False)
    assert after[103] == (103, True)

    # idempotent re-run: nothing new
    rep2 = materialize_semantic_verdict(spark, all_docs, all_emb, table, cb,
                                        threshold=0.9, cluster_size=16)
    assert rep2["mode"] == "noop"


def test_curation_verdict_route_equals_inpipeline(spark, tmp_path):
    """curate_corpus(semantic_verdict_table=...) == the in-pipeline
    semantic stage on the same population (upstream stages neutral)."""
    from medallion_data_lake_spark.operators.curation_pipeline import (
        CurationConfig,
        curate_corpus,
    )

    emb = _vecs(spark)
    docs = _docs_of(emb)
    cb = str(tmp_path / "cb")
    fit_semantic_codebook(emb, cb, cluster_size=16)
    table = str(tmp_path / "verdict")
    materialize_semantic_verdict(spark, docs, emb, table, cb,
                                 threshold=0.9, cluster_size=16)

    neutral = dict(min_est_jaccard=1.01)  # MinHash stage drops nothing
    inline = curate_corpus(
        docs, embeddings=emb,
        config=CurationConfig(semantic_codebook_path=cb,
                              semantic_cluster_size=16, **neutral),
    )["curated"]
    via_table = curate_corpus(
        docs,
        config=CurationConfig(semantic_verdict_table=table,
                              semantic_cluster_size=16, **neutral),
    )["curated"]
    assert sorted(r["doc_id"] for r in inline.collect()) == \
        sorted(r["doc_id"] for r in via_table.collect())


def test_verdict_guards(spark, tmp_path):
    from medallion_data_lake_spark.operators.curation_pipeline import (
        CurationConfig,
        curate_corpus,
    )

    emb = _vecs(spark)
    docs = _docs_of(emb)
    cb = str(tmp_path / "cb")
    fit_semantic_codebook(emb, cb, cluster_size=16)
    table = str(tmp_path / "verdict")
    materialize_semantic_verdict(spark, docs, emb, table, cb,
                                 threshold=0.9, cluster_size=16)

    # threshold mismatch between sidecar and config refuses
    with pytest.raises(ValueError, match="threshold"):
        curate_corpus(docs, config=CurationConfig(
            semantic_verdict_table=table, semantic_threshold=0.8))

    # cluster-size drift refuses (as verdict-defining as the cutoff)
    with pytest.raises(ValueError, match="cluster_size"):
        curate_corpus(docs, config=CurationConfig(
            semantic_verdict_table=table))  # default 64 vs table's 16

    # uncovered docs refuse
    extra = docs.sparkSession.createDataFrame(
        [(999, "uncovered doc", "en", "web")],
        "doc_id long, text string, lang string, source string")
    with pytest.raises(ValueError, match="missing verdicts for 1"):
        curate_corpus(docs.unionByName(extra), config=CurationConfig(
            semantic_verdict_table=table, semantic_cluster_size=16))

    # a configured codebook that is NOT the table's refuses
    cb2 = str(tmp_path / "cb_other")
    fit_semantic_codebook(_vecs(spark, seed=99), cb2, cluster_size=16)
    with pytest.raises(ValueError, match="DIFFERENT codebook"):
        curate_corpus(docs, config=CurationConfig(
            semantic_verdict_table=table, semantic_cluster_size=16,
            semantic_codebook_path=cb2))
    # ...while the SAME codebook cross-checks clean
    curate_corpus(docs, config=CurationConfig(
        semantic_verdict_table=table, semantic_cluster_size=16,
        semantic_codebook_path=cb))["curated"].collect()

    # ambiguous config refuses
    with pytest.raises(ValueError, match="both configured"):
        curate_corpus(docs, embeddings=emb, config=CurationConfig(
            semantic_verdict_table=table, semantic_cluster_size=16))

    # parameter drift on increment refuses
    with pytest.raises(ValueError, match="must not mix"):
        materialize_semantic_verdict(spark, docs, emb, table, cb,
                                     threshold=0.8, cluster_size=16)


def test_increment_with_only_the_new_drop(spark, tmp_path):
    """Materializing just the new drop (docs = the drop, not the full
    corpus) must still attach new near-dups to EXISTING groups — the
    existing side comes from the verdict table, not the caller's docs
    frame. Requires embeddings to cover the union (guarded)."""
    import pytest

    emb = _vecs(spark)
    docs = _docs_of(emb)
    cb = str(tmp_path / "cb")
    fit_semantic_codebook(emb, cb, cluster_size=16)
    table = str(tmp_path / "verdict")
    materialize_semantic_verdict(spark, docs, emb, table, cb,
                                 threshold=0.9, cluster_size=16)
    before = {r["doc_id"]: (r["group_id"], r["is_kept"])
              for r in read_table(spark, table).collect()}

    rng = np.random.default_rng(5)
    base = rng.standard_normal((60, DIM))
    new_emb = spark.createDataFrame(
        [(200, [float(x) for x in base[2] + 0.001 * base[3]])],
        "vec_id long, embedding array<double>")
    new_docs = _docs_of(new_emb)
    all_emb = emb.unionByName(new_emb)

    # embeddings must cover the EXISTING table too, or refuse
    with pytest.raises(ValueError, match="no embedding row"):
        materialize_semantic_verdict(spark, new_docs, new_emb, table, cb,
                                     threshold=0.9, cluster_size=16)

    rep = materialize_semantic_verdict(spark, new_docs, all_emb, table, cb,
                                       threshold=0.9, cluster_size=16)
    assert rep["mode"] == "incremental" and rep["n_new"] == 1
    after = {r["doc_id"]: (r["group_id"], r["is_kept"])
             for r in read_table(spark, table).collect()}
    assert after[200] == (before[2][0], False)   # attached to 2's group
    assert all(after[d] == v for d, v in before.items())


def test_increment_fast_path_equals_legacy_reassignment(spark, tmp_path):
    """r16 (r15 verdict #4): the increment's O(delta) existing side —
    hot-cell pruning via the STORED base_cell column — must produce
    byte-identical verdicts to the legacy path that re-assigns the full
    corpus per increment. A legacy-schema table (no base_cell, built
    the way pre-r16 initials were: batch semantic_dedup without the
    column) exercises the fallback; the r16 table exercises the fast
    path; same inputs, same appended verdicts."""
    import json
    import os

    from medallion_data_lake_spark.operators.ann import (
        load_semantic_codebook,
    )
    from medallion_data_lake_spark.operators.semantic_verdict import (
        VERDICT_SIDECAR,
        codebook_fingerprint,
    )
    from medallion_data_lake_spark.operators.versioned import commit

    emb = _vecs(spark)
    docs = _docs_of(emb)
    cb = str(tmp_path / "cb")
    fit_semantic_codebook(emb, cb, cluster_size=16)
    model = load_semantic_codebook(cb, expect_dim=DIM)

    # table A: current initial path (stores base_cell)
    t_fast = str(tmp_path / "v_fast")
    materialize_semantic_verdict(spark, docs, emb, t_fast, cb,
                                 threshold=0.9, cluster_size=16)
    assert "base_cell" in read_table(spark, t_fast).columns

    # table B: legacy schema — initial rows WITHOUT base_cell, exactly
    # what a pre-r16 materialization committed
    t_legacy = str(tmp_path / "v_legacy")
    os.makedirs(t_legacy, exist_ok=True)
    params = {"codebook_fingerprint": codebook_fingerprint(model),
              "dim": DIM, "threshold": 0.9, "cluster_size": 16}
    with open(os.path.join(t_legacy, VERDICT_SIDECAR), "w") as fh:
        json.dump(params, fh)
    legacy_initial = semantic_dedup(
        emb.withColumnRenamed("vec_id", "doc_id"), id_col="doc_id",
        threshold=0.9, cluster_size=16, dim=DIM, model=model)
    commit(legacy_initial, t_legacy, mode="append",
           stats_cols=("doc_id",), bloom_cols=("doc_id",))
    assert "base_cell" not in read_table(spark, t_legacy).columns

    # same append against both tables: one near-dup of existing doc 0,
    # one new-new pair, one unique
    rng = np.random.default_rng(5)
    base = rng.standard_normal((60, DIM))
    fresh = np.random.default_rng(99).standard_normal((2, DIM))
    new_emb = spark.createDataFrame(
        [(100, [float(x) for x in base[0] + 0.0012 * fresh[0]]),
         (101, [float(x) for x in fresh[0]]),
         (102, [float(x) for x in fresh[0] + 0.01 * fresh[1]]),
         (103, [float(x) for x in fresh[1]])],
        "vec_id long, embedding array<double>")
    all_emb = emb.unionByName(new_emb)
    all_docs = _docs_of(all_emb)

    rep_f = materialize_semantic_verdict(spark, all_docs, all_emb, t_fast,
                                         cb, threshold=0.9, cluster_size=16)
    rep_l = materialize_semantic_verdict(spark, all_docs, all_emb, t_legacy,
                                         cb, threshold=0.9, cluster_size=16)
    assert rep_f["mode"] == rep_l["mode"] == "incremental"
    assert rep_f["n_new"] == rep_l["n_new"] == 4

    fast = {r["doc_id"]: (r["cluster_id"], r["group_id"], r["is_kept"])
            for r in read_table(spark, t_fast).collect()}
    legacy = {r["doc_id"]: (r["cluster_id"], r["group_id"], r["is_kept"])
              for r in read_table(spark, t_legacy).collect()}
    assert fast == legacy
    # fast-path appended rows carry their base cell (== increment cell)
    got = {r["doc_id"]: r["base_cell"]
           for r in read_table(spark, t_fast)
           .filter(F.col("doc_id") >= 100).collect()}
    want = {r["doc_id"]: r["cluster_id"]
            for r in read_table(spark, t_fast)
            .filter(F.col("doc_id") >= 100).collect()}
    assert got == want

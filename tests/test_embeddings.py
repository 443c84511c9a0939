"""Embedding stage: deterministic, unit-normed, similarity-preserving,
plan-clean — and the output feeds every downstream vector consumer
(index build → probe round trip) unchanged."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from medallion_data_lake_spark.catalog import load_star_table
from medallion_data_lake_spark.operators.embeddings import (
    DEFAULT_DIM,
    embed_documents,
)

SF_DIR = "/root/testdata/sf0.001"


def test_embed_documents_shape_and_determinism(spark):
    docs = load_star_table(spark, SF_DIR, "documents").limit(50)
    a = {r["vec_id"]: r["embedding"]
         for r in embed_documents(docs).collect()}
    b = {r["vec_id"]: r["embedding"]
         for r in embed_documents(docs).collect()}
    assert a == b                                   # deterministic
    assert all(len(v) == DEFAULT_DIM for v in a.values())
    for v in a.values():                            # unit-normed
        n = math.sqrt(sum(x * x for x in v))
        assert abs(n - 1.0) < 1e-9 or n == 0.0


def test_embedding_similarity_orders_correctly(spark):
    """Near-identical texts must embed closer than unrelated texts —
    the property semantic dedup relies on, model-free."""
    docs = spark.createDataFrame(
        [
            (1, "spark joins shuffle data across the cluster nodes"),
            (2, "spark joins shuffle data across the cluster machines"),
            (3, "bananas ripen faster inside a warm paper bag"),
        ],
        "doc_id long, text string",
    )
    vecs = {r["vec_id"]: r["embedding"]
            for r in embed_documents(docs).collect()}

    def cos(u, v):
        return sum(a * b for a, b in zip(u, v))  # unit vectors

    assert cos(vecs[1], vecs[2]) > 0.7
    assert cos(vecs[1], vecs[2]) > cos(vecs[1], vecs[3]) + 0.3


def test_embedding_stage_is_single_arrow_map_pass(spark):
    from medallion_data_lake_spark.plans import count_shuffles, explain_str

    docs = load_star_table(spark, SF_DIR, "documents")
    df = embed_documents(docs)
    assert count_shuffles(df) == 0
    plan = explain_str(df)
    assert "ArrowEvalPython" in plan            # vectorized, not per-row
    assert "BatchEvalPython" not in plan


def test_embeddings_feed_index_build_and_probe(spark, tmp_path):
    """End-to-end text → embed → persisted index → probe: the top hit
    for a document's own vector must be its near-duplicate twin."""
    from medallion_data_lake_spark.operators.ann import (
        build_ivf_index,
        search_ivf_index,
    )

    rows = [(i, f"the quick brown fox number {i} jumps over the lazy dog")
            for i in range(40)]
    rows += [(100, "completely different text about quantum chromodynamics"),
             (101, "completely different text about quantum chromodynamics!")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    emb = embed_documents(docs)

    path = str(tmp_path / "emb_idx")
    build_ivf_index(emb, path)
    q = emb.filter(F.col("vec_id") == 100)
    hits = search_ivf_index(spark, path, q, n_probes=8, k=1).collect()
    assert hits and hits[0]["cand_id"] == 101


def test_semantic_dedup_from_text_only_corpus(spark):
    """curate_corpus(semantic_from_text=True): a text-only corpus gets
    in-pipeline embeddings and semantic dedup drops the planted
    near-identical pair member; unrelated docs survive."""
    from medallion_data_lake_spark.operators.curation_pipeline import (
        CurationConfig,
        curate_corpus,
    )

    rows = [
        (1, "spark joins shuffle data across the cluster nodes today", "en", "web"),
        (2, "spark joins shuffle data across the cluster nodes now", "en", "web"),
        (3, "bananas ripen faster inside a warm paper bag overnight", "en", "web"),
        (4, "quantum chromodynamics binds quarks with gluon exchange", "en", "web"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    cfg = CurationConfig(
        semantic_from_text=True,
        semantic_threshold=0.8,
        semantic_cluster_size=2,
        min_est_jaccard=1.01,  # neutralize MinHash stage; isolate semantic
    )
    stages = curate_corpus(docs, config=cfg)
    assert "semantic_deduped" in stages
    kept = {r["doc_id"] for r in stages["curated"].collect()}
    assert len(kept & {1, 2}) == 1        # one of the pair dropped
    assert {3, 4} <= kept                  # unrelated docs survive

"""Streaming ANN index maintenance (operators/ann.py streaming trio):
exactly-once appends, search parity with a batch-built index."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from medallion_data_lake_spark.catalog import load_star_table
from medallion_data_lake_spark.operators.ann import (
    MIN_BITS,
    build_ivf_index,
    init_streaming_ivf_index,
    run_index_append_stream,
    search_ivf_index,
)

SF = "/root/testdata/sf0.001"


def test_streamed_index_matches_batch_built_and_survives_replay(spark, tmp_path):
    emb = load_star_table(spark, SF, "embeddings")
    src = str(tmp_path / "src")
    # two drops, served as separate availableNow runs (distinct batches)
    emb.filter(F.col("vec_id") % 2 == 0).write.parquet(f"{src}/d0")
    emb.filter(F.col("vec_id") % 2 == 1).write.parquet(f"{src}/d1")

    idx = str(tmp_path / "idx")
    ck = str(tmp_path / "ck")
    init_streaming_ivf_index(idx, n_bits=MIN_BITS)

    def run():
        stream = (
            spark.readStream.schema(emb.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{src}/d*")
        )
        run_index_append_stream(spark, stream, idx, ck)

    run()
    n = emb.count()
    assert spark.read.parquet(idx).count() == n

    # replay after checkpoint loss: partitions rewrite, never duplicate
    shutil.rmtree(ck)
    run()
    assert spark.read.parquet(idx).count() == n

    # search parity with a batch-built index over the same vectors
    batch_idx = str(tmp_path / "bidx")
    build_ivf_index(emb, batch_idx, n_bits=MIN_BITS)
    queries = emb.filter(F.col("vec_id") < 5)

    def answers(path):
        return {
            (r["query_id"], r["rank"]): r["cand_id"]
            for r in search_ivf_index(
                spark, path, queries, n_probes=4, k=3
            ).collect()
        }

    assert answers(idx) == answers(batch_idx)
    # the streamed layout keeps bucket partition dirs (pruning intact)
    assert any("bucket=" in d for _, dirs, _ in os.walk(idx) for d in dirs)


def test_stream_persists_health_telemetry(spark, tmp_path):
    """r6 verdict item 10: health_every_batches=N re-measures recall
    after every Nth landed batch and persists the verdict in the meta
    sidecar — rebuild_recommended surfaces as ONE top-level flag."""
    import json

    emb = load_star_table(spark, SF, "embeddings")
    src = str(tmp_path / "src")
    emb.filter(F.col("vec_id") % 2 == 0).write.parquet(f"{src}/d0")
    emb.filter(F.col("vec_id") % 2 == 1).write.parquet(f"{src}/d1")

    idx = str(tmp_path / "idx")
    init_streaming_ivf_index(idx, n_bits=MIN_BITS)
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/d*")
    )
    run_index_append_stream(
        spark, stream, idx, str(tmp_path / "ck"),
        health_every_batches=2, health_sample_n=20,
    )

    meta = json.load(open(os.path.join(idx, "_ivf_meta.json")))
    assert "health" in meta, meta  # 2 batches landed -> one measurement
    h = meta["health"]
    assert 0.0 <= h["recall"] <= 1.0
    assert isinstance(h["rebuild_recommended"], bool)
    assert meta["rebuild_recommended"] == h["rebuild_recommended"]
    assert h["sample_n"] > 0
    # layout untouched by telemetry: counts and bits unchanged
    assert meta["n_bits"] == MIN_BITS
    assert spark.read.parquet(idx).count() == emb.count()

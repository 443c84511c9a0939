"""Curation build floor with the persisted embedding column (r12
verdict item 5).

r12 amortized the KMeans codebook fit (per-run-fit build 56.9s ->
codebook-reuse 31.5s at the clone); the remaining cost was the eager
assignment checkpoint, which still RE-EMBEDS the corpus every run.
Embedding is a pure function of (text, embedder), so r13 persists it
once as a versioned table (`embeddings.materialize_corpus_embeddings`,
incremental by id, provenance sidecar) and `CurationConfig.
embeddings_table` routes the semantic stage through the column.

This script measures, on the clone corpus with the SAME config as
`measure_curation_pipeline.py` (one persisted codebook for both
paths):

- codebook fit (paid once, r12 lever; timed for context)
- materialize_corpus_embeddings: first call (embeds everything) and a
  second call (incremental no-op — the steady-state re-curation cost)
- build wall A: semantic_from_text=True  (r12 path: re-embed per run)
- build wall B: embeddings_table=...     (r13 path: read the column)
- funnel equality between the two paths (amortization, not semantics)

"build wall" = curate_corpus() plan construction + the one-pass
curated count (the same protocol as the r12 numbers).

Usage: python scripts/measure_curation_build_floor.py [clone_dir] [work_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from medallion_data_lake_spark.operators.ann import (  # noqa: E402
    fit_semantic_codebook,
)
from medallion_data_lake_spark.operators.curation_pipeline import (  # noqa: E402
    CurationConfig,
    curate_corpus,
)
from medallion_data_lake_spark.operators.embeddings import (  # noqa: E402
    HASHING_EMBEDDER_FINGERPRINT,
    embed_documents,
    materialize_corpus_embeddings,
)
from medallion_data_lake_spark.session import get_spark  # noqa: E402


def build_wall(docs, bench, cfg) -> tuple[float, int, dict]:
    obs: dict = {}
    t0 = time.time()
    stages = curate_corpus(docs, bench=bench, config=cfg, observations=obs)
    n = stages["curated"].count()
    wall = round(time.time() - t0, 2)
    funnel = {k: o.get["n"] for k, o in obs.items()}
    return wall, n, funnel


def main() -> None:
    clone = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mdls_scale/sf1.0"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/mdls_scale/buildfloor"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="curation-build-floor", master=f"local[{cpus}]",
        extra_conf={"spark.sql.shuffle.partitions": cpus},
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(clone, "documents.parquet")) \
        .select("doc_id", "text", "lang", "source")
    bench = (
        docs.filter(F.col("doc_id") % 1000 == 7)
        .select((F.col("doc_id") + 10_000_000_000).alias("doc_id"), "text")
        .limit(500)
        .localCheckpoint(eager=True)
    )
    out = {"n_docs": docs.count()}

    # one codebook for both paths (the r12 lever, held constant here)
    codebook = os.path.join(work, "codebook")
    t0 = time.time()
    fit_semantic_codebook(
        embed_documents(docs), path=codebook,
        embedder=HASHING_EMBEDDER_FINGERPRINT,
    )
    out["codebook_fit_s"] = round(time.time() - t0, 1)

    # the persisted column: first materialization embeds everything;
    # the second is the steady-state re-curation cost (anti-join finds
    # nothing new -> no embed, no commit)
    table = os.path.join(work, "emb")
    t0 = time.time()
    rep = materialize_corpus_embeddings(spark, docs, table)
    out["materialize_first_s"] = round(time.time() - t0, 1)
    out["materialize_rows"] = rep["n_embedded"]
    t0 = time.time()
    rep2 = materialize_corpus_embeddings(spark, docs, table)
    out["materialize_noop_s"] = round(time.time() - t0, 1)
    assert rep2["n_embedded"] == 0, rep2

    base = dict(
        production_hash=True,
        max_contamination=0.5,   # clone-vocab artifact, see e2e script
        fuzzy_decontaminate=True,
        mix_alpha=0.5,
        mix_token_budget=3_000_000,
        default_rate_per_mille=800,
        blocklist=("casino", "lottery", "jackpot"),
        redact_pii=True,
        max_pii_hits=8,
        semantic_codebook_path=codebook,
    )
    wall_a, n_a, funnel_a = build_wall(
        docs, bench, CurationConfig(**base, semantic_from_text=True))
    out["build_reembed_s"] = wall_a
    wall_b, n_b, funnel_b = build_wall(
        docs, bench, CurationConfig(**base, embeddings_table=table))
    out["build_from_column_s"] = wall_b
    out["curated_rows"] = n_a
    assert n_a == n_b, (n_a, n_b)
    assert funnel_a == funnel_b, (funnel_a, funnel_b)
    out["funnel_equal"] = True
    print(json.dumps({"curation_build_floor": out}))


if __name__ == "__main__":
    main()

"""Non-semantic funnel floor + the r14 amortization levers (r13
verdict item 5): decompose the ~17-27s-at-50k curation floor and
measure what the two new persisted artifacts buy, paired same-JVM:

- S0: funnel with NO semantic stage and NO bench (the base floor the
  r13 decomposition named);
- A : r13 best config — persisted embedding column + pinned codebook,
  raw bench frame, fuzzy decon on (the paired baseline);
- B : A with the semantic stage replaced by the MATERIALIZED verdict
  table (one slim anti-join; operators/semantic_verdict.py);
- C : B with the bench side replaced by the PERSISTED decon artifacts
  (n-gram set + banded signatures; materialize_benchmark_decon).

Artifact build costs (paid once, amortized across runs) are timed
separately: codebook fit, embedding column, verdict initial +
incremental after a 0.1% append, bench-decon materialization.

Population-semantics note (documented in CurationConfig): the verdict
table was materialized over the FULL corpus, so B/C may drop a few
more docs than A when upstream stages removed a group's keeper —
reported as curated_rows_delta, not asserted away. B and C must be
EXACTLY equal (same semantic route; the decon-artifact equality has a
unit test).

Protocol: 2 interleaved rounds (A B C A B C), per-config MIN reported
(quiet-machine estimate, same as the r12/r13 build-floor scripts);
wall = curate_corpus() plan build + the one-pass curated count.

Usage: python scripts/measure_funnel_floor.py [clone_dir] [work_dir]
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
    materialize_benchmark_decon,
)
from medallion_data_lake_spark.operators.embeddings import (  # noqa: E402
    HASHING_EMBEDDER_FINGERPRINT,
    embed_documents,
    materialize_corpus_embeddings,
)
from medallion_data_lake_spark.operators.semantic_verdict import (  # noqa: E402
    materialize_semantic_verdict,
)
from medallion_data_lake_spark.operators.versioned import read_table  # noqa: E402
from medallion_data_lake_spark.session import get_spark  # noqa: E402


def build_wall(docs, bench, cfg) -> tuple[float, int]:
    t0 = time.time()
    stages = curate_corpus(docs, bench=bench, config=cfg)
    n = stages["curated"].count()
    return round(time.time() - t0, 2), n


def main() -> None:
    clone = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mdls_scale/sf1.0"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/mdls_scale/funnelfloor"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="funnel-floor", master=f"local[{cpus}]",
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

    # ---- one-time artifacts (amortized), each timed -------------------
    codebook = os.path.join(work, "codebook")
    t0 = time.time()
    fit_semantic_codebook(embed_documents(docs), path=codebook,
                          embedder=HASHING_EMBEDDER_FINGERPRINT)
    out["artifact_codebook_fit_s"] = round(time.time() - t0, 1)

    emb_table = os.path.join(work, "emb")
    t0 = time.time()
    materialize_corpus_embeddings(spark, docs, emb_table)
    out["artifact_embed_column_s"] = round(time.time() - t0, 1)

    verdict = os.path.join(work, "verdict")
    t0 = time.time()
    materialize_semantic_verdict(
        spark, docs, read_table(spark, emb_table), verdict, codebook)
    out["artifact_verdict_initial_s"] = round(time.time() - t0, 1)

    decon = os.path.join(work, "bench_decon")
    t0 = time.time()
    materialize_benchmark_decon(spark, bench, decon, production_hash=True)
    out["artifact_bench_decon_s"] = round(time.time() - t0, 1)

    # r16: the corpus-side decon verdict (per-doc contamination
    # measures keyed on (id, text_fp), pinned to the bench artifacts)
    from medallion_data_lake_spark.operators.curation_pipeline import (
        materialize_decon_verdict,
    )

    decon_vt = os.path.join(work, "decon_verdict")
    t0 = time.time()
    materialize_decon_verdict(spark, docs, decon, decon_vt)
    out["artifact_decon_verdict_initial_s"] = round(time.time() - t0, 1)

    # steady-state increment: 0.1% append -> column + verdict catch up
    new_docs = docs.limit(50).select(
        (F.col("doc_id") + 20_000_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" appended variant")).alias("text"),
        "lang", "source").localCheckpoint(eager=True)
    docs2 = docs.unionByName(new_docs)
    t0 = time.time()
    materialize_corpus_embeddings(spark, docs2, emb_table)
    out["artifact_embed_increment_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    rep = materialize_semantic_verdict(
        spark, docs2, read_table(spark, emb_table), verdict, codebook)
    out["artifact_verdict_increment_s"] = round(time.time() - t0, 1)
    assert rep["mode"] == "incremental" and rep["n_new"] == 50, rep
    t0 = time.time()
    drep = materialize_decon_verdict(spark, docs2, decon, decon_vt)
    out["artifact_decon_verdict_increment_s"] = round(time.time() - t0, 1)
    assert drep["n_new"] == 50, drep

    # ---- paired builds -------------------------------------------------
    base = dict(
        production_hash=True,
        max_contamination=0.5,
        fuzzy_decontaminate=True,
        mix_alpha=0.5,
        mix_token_budget=3_000_000,
        default_rate_per_mille=800,
        blocklist=("casino", "lottery", "jackpot"),
        redact_pii=True,
        max_pii_hits=8,
    )
    cfg_a = CurationConfig(**base, semantic_codebook_path=codebook,
                           embeddings_table=emb_table)
    cfg_b = CurationConfig(**base, semantic_verdict_table=verdict)
    cfg_c = CurationConfig(**base, semantic_verdict_table=verdict,
                           benchmark_decon_table=decon)
    # r16 config D: C with the corpus-side decon recompute replaced by
    # the persisted per-doc verdict table (both decon stages become
    # slim anti-joins; thresholds still applied at read time)
    cfg_d = CurationConfig(**base, semantic_verdict_table=verdict,
                           decon_verdict_table=decon_vt)
    cfg_s0 = CurationConfig(**{k: v for k, v in base.items()
                               if k != "fuzzy_decontaminate"})

    walls: dict[str, list[float]] = {"A": [], "B": [], "C": [], "D": []}
    counts: dict[str, int] = {}
    for _ in range(2):  # interleaved rounds: weather hits all configs
        for name, cfg, b in (("A", cfg_a, bench), ("B", cfg_b, bench),
                             ("C", cfg_c, None), ("D", cfg_d, None)):
            w, n = build_wall(docs2, b, cfg)
            walls[name].append(w)
            counts[name] = n
    for name in walls:
        out[f"build_{name}_s"] = min(walls[name])
        out[f"build_{name}_runs"] = walls[name]
        out[f"curated_rows_{name}"] = counts[name]
    w0, n0 = build_wall(docs2, None, cfg_s0)
    out["build_S0_nosemantic_nobench_s"] = w0
    out["curated_rows_S0"] = n0

    assert counts["B"] == counts["C"], (counts["B"], counts["C"])
    assert counts["C"] == counts["D"], (counts["C"], counts["D"])
    out["curated_rows_delta_A_vs_B"] = counts["A"] - counts["B"]
    out["verdict_lever_saving_s"] = round(
        out["build_A_s"] - out["build_B_s"], 2)
    out["bench_lever_saving_s"] = round(
        out["build_B_s"] - out["build_C_s"], 2)
    out["decon_verdict_lever_saving_s"] = round(
        out["build_C_s"] - out["build_D_s"], 2)
    print(json.dumps({"funnel_floor": out}))


if __name__ == "__main__":
    main()

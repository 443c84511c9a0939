"""End-to-end curation pipeline wall at clone scale (r11 verdict #5):
per-operator costs were measured in earlier rounds; this measures the
COMPOSED `curate_corpus` funnel on the sf1.0 clone's 500k documents —
one-pass wall with the observe() funnel, per-stage-prefix walls (the
cost structure), per-stage shuffle telemetry from the UI REST API, and
the tokenize-share estimate that answers "is fusing the tokenize pass
across stages worth it".

Config exercised: exact + MinHash near-dup (production xxhash shingles)
+ semantic dedup (hashing embedder from text) + exact n-gram AND fuzzy
LSH decontamination against a 500-doc benchmark drawn from the corpus
(guaranteed hits) + temperature mixing + stratified sampling +
blocklist scrub + PII redaction + both shard formers (packing
manifest, chunk windows).

Usage: python scripts/measure_curation_pipeline.py [clone_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from medallion_data_lake_spark.operators.curation_pipeline import (  # noqa: E402
    CurationConfig,
    curate_corpus,
)
from medallion_data_lake_spark.session import get_spark  # noqa: E402


def _rest(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}{path}") as r:
        return json.loads(r.read())


def shuffle_stats(spark, stage_floor: int) -> dict:
    try:
        tot_w = tot_r = peak_w = 0
        for s in _rest(spark, "/stages?status=complete"):
            if s["stageId"] < stage_floor:
                continue
            w, r = s.get("shuffleWriteBytes", 0), s.get("shuffleReadBytes", 0)
            tot_w += w
            tot_r += r
            peak_w = max(peak_w, w)
        mb = 1024 * 1024
        return {"shuffle_write_mb": round(tot_w / mb, 1),
                "shuffle_read_mb": round(tot_r / mb, 1),
                "peak_stage_shuffle_write_mb": round(peak_w / mb, 1)}
    except Exception:
        return {}


def next_stage_id(spark) -> int:
    try:
        return 1 + max((s["stageId"] for s in _rest(spark, "/stages")),
                       default=-1)
    except Exception:
        return 0


def main() -> None:
    clone = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mdls_scale/sf1.0"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="curation-e2e", master=f"local[{cpus}]",
        extra_conf={"spark.sql.shuffle.partitions": cpus,
                    "spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(clone, "documents.parquet")) \
        .select("doc_id", "text", "lang", "source")
    # benchmark = 500 corpus texts (re-keyed) -> guaranteed decon hits
    bench = (
        docs.filter(F.col("doc_id") % 1000 == 7)
        .select((F.col("doc_id") + 10_000_000_000).alias("doc_id"), "text")
        .limit(500)
        .localCheckpoint(eager=True)
    )

    cfg = CurationConfig(
        production_hash=True,
        # the clone's ~31-term vocabulary makes incidental 3-gram overlap
        # ubiquitous; a zero tolerance would count that as contamination
        # and empty the funnel (measured: 47k -> 3k rows) — 0.5 keeps the
        # stage meaningful (drop docs sharing >half their n-grams)
        max_contamination=0.5,
        fuzzy_decontaminate=True,
        semantic_from_text=True,
        mix_alpha=0.5,
        mix_token_budget=3_000_000,
        default_rate_per_mille=800,
        blocklist=("casino", "lottery", "jackpot"),
        redact_pii=True,
        max_pii_hits=8,
    )

    out = {"n_docs": docs.count(), "stages": {}}

    # ---- one-pass funnel wall (the production shape) -------------------
    obs: dict = {}
    floor = next_stage_id(spark)
    t0 = time.time()
    stages = curate_corpus(docs, bench=bench, config=cfg, observations=obs)
    build_s = round(time.time() - t0, 2)  # includes the mixing totals job
    t1 = time.time()
    curated_n = stages["curated"].count()
    out["one_pass_wall_s"] = round(time.time() - t1, 2)
    out["plan_build_s"] = build_s
    out["curated_rows"] = curated_n
    out["funnel"] = {k: o.get["n"] for k, o in obs.items()}
    out.update(shuffle_stats(spark, floor))

    # ---- shard formers (each replays the funnel prefix) ----------------
    for name in ("manifest", "chunks"):
        t0 = time.time()
        n = stages[name].count()
        out[f"{name}_wall_s"] = round(time.time() - t0, 2)
        out[f"{name}_rows"] = n

    # ---- per-stage-prefix walls (cost structure) -----------------------
    # each count replays the shared prefix; the DELTA between successive
    # prefixes approximates the stage's own cost
    obs2: dict = {}
    stages2 = curate_corpus(docs, bench=bench, config=cfg,
                            observations=obs2)
    prev = 0.0
    for name, df in stages2.items():
        if name in ("manifest", "chunks"):
            continue
        t0 = time.time()
        df.count()
        wall = round(time.time() - t0, 2)
        out["stages"][name] = {"prefix_wall_s": wall,
                               "delta_s": round(wall - prev, 2)}
        prev = wall

    # ---- tokenize share (the fusion question) --------------------------
    t0 = time.time()
    docs.select(F.size(F.split("text", r"\s+")).alias("n")) \
        .agg(F.sum("n")).collect()
    out["bare_tokenize_pass_s"] = round(time.time() - t0, 2)

    print(json.dumps({"curation_e2e": out}))


if __name__ == "__main__":
    main()

"""ANN recall in the EXPECTED case vs the adversarial one (r11 verdict
item 2): the r11 recall table was measured on the fixture's random
vectors — IVF's worst case, where neighbors scatter uniformly across
cells. Real-model embeddings are clustered. This script measures both:

- RANDOM: the sf1.0 clone's embeddings (the honest adversarial bound,
  kept from r11).
- CLUSTERED: a seeded mixture-of-Gaussians fixture (100 centers at
  20k vectors / 1000 at 200k, sigma 0.3 vs unit-scale centers — the
  shape model embeddings actually have), generated here determinstically.

For each fixture x scale it sweeps n_probes over the FULL-VECTOR kmeans
search and the r12 RECALL-RECOVERY path (build with pq_m=8:
wide-probe ADC pre-rank from stored codes + exact re-rank of a 50-row
shortlist — search_index(use_pq=True)), reporting recall@5 against
brute-force ground truth and min-of-3 wall.

Usage: python scripts/measure_ann_recall.py [clone_dir] [work_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from medallion_data_lake_spark.functions import dot, l2_norm  # noqa: E402
from medallion_data_lake_spark.operators.ann import (  # noqa: E402
    build_kmeans_ivf_index,
    search_index,
)
from medallion_data_lake_spark.session import get_spark  # noqa: E402

DIM = 64
N_QUERIES = 32
K = 5
PROBES = (1, 2, 4, 8, 16)
SHORTLIST = 50


def timed(fn, n=3):
    walls, out = [], None
    for _ in range(n):
        t0 = time.time()
        out = fn()
        walls.append(time.time() - t0)
    return round(min(walls), 2), out


def make_clustered(spark, n: int, out_path: str, seed: int = 11):
    """Seeded mixture of Gaussians: ~200 vectors per center, centers at
    unit scale x3, within-cluster sigma 0.3 — the clustered shape of
    model embeddings (vs the clone's structureless uniform vectors)."""
    rng = np.random.default_rng(seed)
    n_centers = max(10, n // 200)
    centers = rng.standard_normal((n_centers, DIM)) * 3.0
    assign = rng.integers(0, n_centers, size=n)
    vecs = centers[assign] + rng.standard_normal((n, DIM)) * 0.3
    rows = [
        (int(i), int(assign[i]), [float(x) for x in vecs[i]])
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>"
    ).repartition(32)
    df.write.mode("overwrite").parquet(out_path)
    return spark.read.parquet(out_path)


def brute_topk(emb, queries, k=K):
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        l2_norm(F.col("embedding")).alias("qn"),
    )
    cs = dot(F.col("qv"), F.col("embedding")) / (F.col("qn") * l2_norm(F.col("embedding")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    return (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("cand_id"), cs.alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id")
    )


def recall_against(truth_pairs: set, approx) -> float:
    got = {(r["query_id"], r["cand_id"]) for r in approx.collect()}
    return round(len(truth_pairs & got) / max(len(truth_pairs), 1), 3)


def sweep(spark, emb, queries, index_path: str, label: str) -> dict:
    n = emb.count()
    t0 = time.time()
    meta = build_kmeans_ivf_index(emb, index_path, pq_m=8, pq_k=16)
    build_s = round(time.time() - t0, 1)
    truth = {
        (r["query_id"], r["cand_id"])
        for r in brute_topk(emb, queries).collect()
    }
    out = {"n": n, "cells": meta["k"], "build_s": build_s, "probes": {}}
    for p in PROBES:
        full_w, full_df = timed(
            lambda p=p: search_index(
                spark, index_path, queries, n_probes=p, k=K
            ).select("query_id", "cand_id").collect()
        )
        full_r = round(
            len(truth & {(r["query_id"], r["cand_id"]) for r in full_df})
            / max(len(truth), 1), 3)
        pq_w, pq_df = timed(
            lambda p=p: search_index(
                spark, index_path, queries, n_probes=p, k=K,
                use_pq=True, shortlist=SHORTLIST,
            ).select("query_id", "cand_id").collect()
        )
        pq_r = round(
            len(truth & {(r["query_id"], r["cand_id"]) for r in pq_df})
            / max(len(truth), 1), 3)
        out["probes"][p] = {
            "full_recall": full_r, "full_s": full_w,
            "pq_recall": pq_r, "pq_s": pq_w,
        }
        print(f"  [{label}] n={n} probes={p}: full {full_r}@{full_w}s  "
              f"pq+rerank {pq_r}@{pq_w}s", file=sys.stderr)
    return out


def shortlist_sweep(spark, work: str) -> None:
    """Second pass over indexes a prior full run left in ``work``: the
    W knob. The main sweep showed ADC@shortlist-50 losing recall INSIDE
    tight clusters (the codebook resolves between-cluster structure;
    within a cluster its 16-cell subspaces can't order candidates) —
    this measures how much shortlist buys it back at fixed probes.

    Usage: python scripts/measure_ann_recall.py --shortlist [work_dir]
    """
    out = {}
    for label, probes in (("clustered_20k", 2), ("random_20k", 8)):
        idx = os.path.join(work, label)
        if not os.path.isdir(idx):
            print(f"skip {label}: no index at {idx}", file=sys.stderr)
            continue
        emb = spark.read.parquet(idx).select(
            F.col("vec_id"), F.col("vec").alias("embedding")
        ).localCheckpoint(eager=True)
        n = emb.count()
        stride = max(1, n // N_QUERIES)
        queries = emb.filter(F.col("vec_id") % stride == 0).limit(N_QUERIES)
        truth = {
            (r["query_id"], r["cand_id"])
            for r in brute_topk(emb, queries).collect()
        }
        cell = {}
        for w_ in (50, 200, 800):
            wall, rows = timed(
                lambda w_=w_: search_index(
                    spark, idx, queries, n_probes=probes, k=K,
                    use_pq=True, shortlist=w_,
                ).select("query_id", "cand_id").collect()
            )
            rec = round(
                len(truth & {(r["query_id"], r["cand_id"]) for r in rows})
                / max(len(truth), 1), 3)
            cell[w_] = {"recall": rec, "wall_s": wall}
            print(f"  [{label}] probes={probes} shortlist={w_}: "
                  f"{rec}@{wall}s", file=sys.stderr)
        out[label] = {"probes": probes, "shortlist": cell}
    print(json.dumps({"ann_shortlist": out}))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--shortlist":
        work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/mdls_scale/annrecall"
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        spark = get_spark(
            app_name="ann-shortlist", master=f"local[{cpus}]",
            extra_conf={"spark.sql.shuffle.partitions": cpus},
        )
        spark.sparkContext.setLogLevel("ERROR")
        shortlist_sweep(spark, work)
        return
    clone = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mdls_scale/sf1.0"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/mdls_scale/annrecall"
    shutil.rmtree(work, ignore_errors=True)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="ann-recall", master=f"local[{cpus}]",
        extra_conf={"spark.sql.shuffle.partitions": cpus},
    )
    spark.sparkContext.setLogLevel("ERROR")

    results = {}

    # RANDOM (adversarial bound): clone embeddings at 20k; 10x union
    # with per-copy dimension roll for 200k (same construction as
    # measure_hard_negative_cost.py)
    rand = spark.read.parquet(os.path.join(clone, "embeddings.parquet")) \
        .select("vec_id", "embedding")
    from functools import reduce
    OFF = 100_000_000
    rolled = [rand]
    for i in range(1, 10):
        rolled.append(
            rand.select(
                (F.col("vec_id") + i * OFF).alias("vec_id"),
                F.concat(
                    F.slice("embedding", i + 1, DIM - i),
                    F.slice("embedding", 1, i),
                ).alias("embedding"),
            )
        )
    rand200 = reduce(lambda a, b: a.unionByName(b), rolled)

    for label, emb in (("random_20k", rand), ("random_200k", rand200)):
        emb = emb.localCheckpoint(eager=True)
        queries = emb.filter(F.col("vec_id") < N_QUERIES)
        results[label] = sweep(
            spark, emb, queries, os.path.join(work, label), label)

    # CLUSTERED (expected case)
    for label, n in (("clustered_20k", 20_000), ("clustered_200k", 200_000)):
        emb = make_clustered(
            spark, n, os.path.join(work, f"{label}_data")
        ).select("vec_id", "embedding")
        queries = emb.filter(F.col("vec_id") % (n // N_QUERIES) == 0) \
            .limit(N_QUERIES)
        results[label] = sweep(
            spark, emb, queries, os.path.join(work, label), label)

    print(json.dumps({"ann_recall": results}))


if __name__ == "__main__":
    main()

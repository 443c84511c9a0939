"""PQ tier I/O validation at high dimension (r12 verdict item 2).

r12 measured the PQ tier's RECALL story (ADC collapses inside tight
clusters at small W; W >= ~40x k buys it back) but its raison d'etre —
"full-vector probe I/O dominates at high d, codes are m bytes/row" —
stayed a posture claim. This script measures BYTES SCANNED per search
path on a d=256 clustered fixture (the claimed regime's dimension, at
a scaled-down count), via the Spark UI REST API's per-stage
inputBytes:

- FULL-VECTOR probe at n_probes = 1..16: every probed cell's vec
  column (d x 4B/row) is read;
- PQ wide probe at the same n_probes with shortlist = 40 x k: the
  probed cells contribute only (vec_id, bucket, pq_code) — m+16
  bytes/row, parquet column pruning never touches vec — and the exact
  re-rank reads the vec column ONLY from the cells holding
  shortlisted candidates (partition pruning; r13 change in
  search_kmeans_pq_ivf_index).

Reports bytes + wall + recall@5 per (path, probes) so the crossover —
where the code read + narrow re-rank undercuts the full-vector read at
EQUAL recall — is a table, not a claim.

Usage: python scripts/measure_pq_io.py [work_dir] [n] [dim]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import urllib.request

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from medallion_data_lake_spark.functions import dot, l2_norm  # noqa: E402
from medallion_data_lake_spark.operators.ann import (  # noqa: E402
    build_kmeans_ivf_index,
    search_index,
)
from medallion_data_lake_spark.session import get_spark  # noqa: E402

K = 5
N_QUERIES = 32
PROBES = (1, 2, 4, 8, 16)
PQ_M = 32  # 256 dims / 8-dim subspaces -> 32 bytes of code per vector


def write_clustered(path: str, n: int, dim: int, seed: int = 11) -> None:
    """Seeded mixture of Gaussians at d=dim (same shape as
    measure_ann_recall's clustered fixture), written straight through
    pyarrow — 200k x 256 floats is driver-RAM-trivial as float32."""
    rng = np.random.default_rng(seed)
    n_centers = max(10, n // 200)
    centers = rng.standard_normal((n_centers, dim)).astype(np.float32) * 3.0
    assign = rng.integers(0, n_centers, size=n)
    vecs = (centers[assign]
            + rng.standard_normal((n, dim)).astype(np.float32) * 0.3)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(vecs.reshape(-1), type=pa.float32()), dim
        ).cast(pa.list_(pa.float32())),
    })
    pq.write_table(tbl, path, row_group_size=50_000)


def stage_bytes(spark) -> int:
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app}/stages?status=complete"
    ) as r:
        return sum(s.get("inputBytes", 0) for s in json.loads(r.read()))


def measured(spark, fn):
    """(bytes_scanned, min-of-3 wall, result) for one search path."""
    b0 = stage_bytes(spark)
    out = fn()
    byts = stage_bytes(spark) - b0
    walls = []
    for _ in range(3):
        t0 = time.time()
        out = fn()
        walls.append(time.time() - t0)
    return byts, round(min(walls), 2), out


def brute_topk(emb, queries, k=K):
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        l2_norm(F.col("embedding")).alias("qn"),
    )
    cs = dot(F.col("qv"), F.col("embedding")) / (
        F.col("qn") * l2_norm(F.col("embedding")))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("cand_id"))
    return (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("cand_id"),
                cs.alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id")
    )


def main() -> None:
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mdls_scale/pqio"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    dim = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="pq-io", master=f"local[{cpus}]",
        extra_conf={"spark.sql.shuffle.partitions": cpus,
                    "spark.ui.enabled": "true",
                    # per-stage metrics must survive the whole sweep
                    "spark.ui.retainedStages": "20000"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    data_path = os.path.join(work, "vectors.parquet")
    write_clustered(data_path, n, dim)
    emb = spark.read.parquet(data_path)

    index_path = os.path.join(work, "idx")
    t0 = time.time()
    meta = build_kmeans_ivf_index(emb, index_path, pq_m=PQ_M, pq_k=16)
    build_s = round(time.time() - t0, 1)

    stride = max(1, n // N_QUERIES)
    queries = emb.filter(
        (F.col("vec_id") % stride == 0)
    ).limit(N_QUERIES).localCheckpoint(eager=True)
    truth = {(r["query_id"], r["cand_id"])
             for r in brute_topk(emb, queries).collect()}

    out = {"n": n, "dim": dim, "cells": meta["k"], "pq_m": PQ_M,
           "build_s": build_s, "shortlist": 40 * K, "paths": {}}
    for p in PROBES:
        byts, wall, rows = measured(
            spark,
            lambda p=p: search_index(
                spark, index_path, queries, n_probes=p, k=K
            ).select("query_id", "cand_id").collect(),
        )
        rec = round(len(truth & {(r["query_id"], r["cand_id"])
                                 for r in rows}) / max(len(truth), 1), 3)
        out["paths"][f"full_p{p}"] = {
            "bytes_mb": round(byts / 1e6, 1), "wall_s": wall,
            "recall_at5": rec,
        }
        byts, wall, rows = measured(
            spark,
            lambda p=p: search_index(
                spark, index_path, queries, n_probes=p, k=K,
                use_pq=True, shortlist=40 * K,
            ).select("query_id", "cand_id").collect(),
        )
        rec = round(len(truth & {(r["query_id"], r["cand_id"])
                                 for r in rows}) / max(len(truth), 1), 3)
        out["paths"][f"pq_p{p}"] = {
            "bytes_mb": round(byts / 1e6, 1), "wall_s": wall,
            "recall_at5": rec,
        }
    print(json.dumps({"pq_io": out}))


if __name__ == "__main__":
    main()

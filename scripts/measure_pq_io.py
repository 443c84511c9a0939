"""PQ tier I/O validation at high dimension (r12 verdict item 2).

r12 measured the PQ tier's RECALL story (ADC collapses inside tight
clusters at small W; W >= ~40x k buys it back) but its raison d'etre —
"full-vector probe I/O dominates at high d, codes are m bytes/row" —
stayed a posture claim. This script measures BYTES SCANNED per search
path on a d=256 clustered fixture (the claimed regime's dimension, at
a scaled-down count).

BYTE ACCOUNTING IS ANALYTIC, NOT REST-SAMPLED: the Spark UI REST
`inputBytes` metric under-reports parquet scans on the local
filesystem by >40x (validated: a 199 MB vec-column read reported
4.5 MB; the flat-file read reported 0) — so instead each search path
reports, via `search_index(report=)`, exactly which bucket partitions
its stages touched, and this script sums those partitions' ACTUAL
parquet column-chunk compressed sizes for the columns each stage
reads (pyarrow footer metadata). That is the bytes an object store
would serve a 1000-executor cluster for the same plan:

- FULL-VECTOR probe: (vec_id, vec, nrm) column chunks of every probed
  cell (column pruning drops pq_code; partition pruning drops every
  other cell);
- PQ path: (vec_id, pq_code) chunks of the probed cells (the wide ADC
  stage never touches vec) + (vec_id, vec, nrm) chunks of only the
  cells holding shortlisted candidates (the r13 narrowed re-rank).

Reports bytes + wall (min of 3) + recall@5 per (path, probes) so the
crossover — where the code read + narrow re-rank undercuts the
full-vector read at EQUAL recall — is a table, not a claim.

Usage: python scripts/measure_pq_io.py [work_dir] [n] [dim]
(an existing work_dir with vectors.parquet + idx/ is REUSED — the
533 s index build is paid once per fixture)
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

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

FULL_COLS = ("vec_id", "vec", "nrm")
CODE_COLS = ("vec_id", "pq_code")


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


def column_bytes_index(index_path: str) -> dict[int, dict[str, int]]:
    """bucket -> {top-level column -> compressed parquet bytes}, from
    every file's footer metadata. Leaf paths (vec.list.element) roll up
    to their top-level column."""
    out: dict[int, dict[str, int]] = {}
    for f in glob.glob(os.path.join(index_path, "bucket=*", "*.parquet")):
        bucket = int(f.split("bucket=")[1].split(os.sep)[0])
        per = out.setdefault(bucket, {})
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            for ci in range(g.num_columns):
                c = g.column(ci)
                top = c.path_in_schema.split(".")[0]
                per[top] = per.get(top, 0) + c.total_compressed_size
    return out


def scanned_mb(colbytes: dict, buckets, cols) -> float:
    s = sum(colbytes.get(b, {}).get(c, 0) for b in buckets for c in cols)
    return round(s / 1e6, 2)


def timed3(fn):
    walls, out = [], None
    for _ in range(3):
        t0 = time.time()
        out = fn()
        walls.append(time.time() - t0)
    return round(min(walls), 2), out


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
    os.makedirs(work, exist_ok=True)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="pq-io", master=f"local[{cpus}]",
        extra_conf={"spark.sql.shuffle.partitions": cpus},
    )
    spark.sparkContext.setLogLevel("ERROR")

    data_path = os.path.join(work, "vectors.parquet")
    if not os.path.exists(data_path):
        write_clustered(data_path, n, dim)
    emb = spark.read.parquet(data_path)

    index_path = os.path.join(work, "idx")
    build_s = None
    if not os.path.exists(os.path.join(index_path, "_ivf_meta.json")):
        t0 = time.time()
        build_kmeans_ivf_index(emb, index_path, pq_m=PQ_M, pq_k=16)
        build_s = round(time.time() - t0, 1)
    with open(os.path.join(index_path, "_ivf_meta.json")) as fh:
        meta = json.load(fh)

    colbytes = column_bytes_index(index_path)
    total_vec_mb = round(
        sum(per.get("vec", 0) for per in colbytes.values()) / 1e6, 1)
    total_code_mb = round(
        sum(per.get("pq_code", 0) for per in colbytes.values()) / 1e6, 1)

    stride = max(1, n // N_QUERIES)
    queries = emb.filter(
        (F.col("vec_id") % stride == 0)
    ).limit(N_QUERIES).localCheckpoint(eager=True)
    truth = {(r["query_id"], r["cand_id"])
             for r in brute_topk(emb, queries).collect()}

    out = {"n": n, "dim": dim, "cells": meta["k"], "pq_m": PQ_M,
           "build_s": build_s, "shortlist": 40 * K,
           "index_vec_col_mb": total_vec_mb,
           "index_code_col_mb": total_code_mb, "paths": {}}
    for p in PROBES:
        rep: dict = {}
        wall, rows = timed3(lambda p=p, rep=rep: search_index(
            spark, index_path, queries, n_probes=p, k=K, report=rep,
        ).select("query_id", "cand_id").collect())
        rec = round(len(truth & {(r["query_id"], r["cand_id"])
                                 for r in rows}) / max(len(truth), 1), 3)
        out["paths"][f"full_p{p}"] = {
            "bytes_mb": scanned_mb(colbytes, rep["probe_buckets"],
                                   FULL_COLS),
            "probed_cells": len(rep["probe_buckets"]),
            "wall_s": wall, "recall_at5": rec,
        }
        rep = {}
        wall, rows = timed3(lambda p=p, rep=rep: search_index(
            spark, index_path, queries, n_probes=p, k=K,
            use_pq=True, shortlist=40 * K, report=rep,
        ).select("query_id", "cand_id").collect())
        rec = round(len(truth & {(r["query_id"], r["cand_id"])
                                 for r in rows}) / max(len(truth), 1), 3)
        out["paths"][f"pq_p{p}"] = {
            "bytes_mb": round(
                scanned_mb(colbytes, rep["probe_buckets"], CODE_COLS)
                + scanned_mb(colbytes, rep["rerank_buckets"], FULL_COLS),
                2),
            "probed_cells": len(rep["probe_buckets"]),
            "rerank_cells": len(rep["rerank_buckets"]),
            "wall_s": wall, "recall_at5": rec,
        }
        print(f"  p={p} done", file=sys.stderr)
    print(json.dumps({"pq_io": out}))


if __name__ == "__main__":
    main()

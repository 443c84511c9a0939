"""Measure hard-negative mining: brute-force kNN-join vs the
persisted-index path (`operators/ann.py mine_hard_negatives`) at clone
scale — the vector-side companion to `measure_bm25_search_cost.py`.

Corpora: the sf1.0 clone's 20k embeddings and a 10x union (200k,
per-copy dimension roll + key offset, same construction as
make_scale_clone.py so cross-copy cosine is scrambled). The QUERY SET
is fixed (32 copy-0 vectors) across both scales and each query carries
ONE labeled positive, so the only thing that grows is the corpus —
brute cost must track it linearly while the index probe tracks probed
buckets only. Also reports recall@k of the index path against the
brute ground truth (multi-probe ANN is approximate by design).

Usage: python scripts/measure_hard_negative_cost.py [clone_dir] [work_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from functools import reduce

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from medallion_data_lake_spark.functions import dot, l2_norm  # noqa: E402
from medallion_data_lake_spark.operators.ann import (  # noqa: E402
    build_kmeans_ivf_index,
    mine_hard_negatives,
)
from medallion_data_lake_spark.session import get_spark  # noqa: E402

N_QUERIES = 32
K = 5
COPIES = 10
OFF = 100_000_000  # > every clone vec_id


def timed(fn, n=3):
    walls, out = [], None
    for _ in range(n):
        t0 = time.time()
        out = fn()
        walls.append(time.time() - t0)
    return round(min(walls), 2), out


def brute_negatives(emb, queries, positives, k=K):
    """The gated hard_negatives_topk arithmetic with an explicit
    positive-pair relation: broadcast query side, per-partition partial
    top-k, anti-join on labeled positives."""
    e = emb.withColumn("nrm", l2_norm(F.col("embedding")))
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        l2_norm(F.col("embedding")).alias("qnrm"),
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neg_id"),
            (dot(F.col("qv"), F.col("embedding"))
             / (F.col("qnrm") * F.col("nrm"))).alias("cs"),
        )
        .join(
            positives.select(
                "query_id", F.col("pos_id").alias("neg_id")),
            ["query_id", "neg_id"], "left_anti",
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cs"), F.asc("neg_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neg_id", "rank")
    )


def roll(col, i):
    """Norm-preserving dimension roll by i (make_scale_clone.py's
    embedding treatment, expressed in Spark)."""
    if i == 0:
        return col
    return F.concat(F.slice(col, i + 1, 64 - i), F.slice(col, 1, i))


def main() -> None:
    clone = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mdls_scale/sf1.0"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/mdls_scale/hncost"
    shutil.rmtree(work, ignore_errors=True)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="hn-cost", master=f"local[{cpus}]",
        extra_conf={"spark.sql.shuffle.partitions": cpus},
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet(os.path.join(clone, "embeddings.parquet"))
    big = reduce(
        lambda a, b: a.unionByName(b),
        [
            base.select(
                (F.col("vec_id") + F.lit(i * OFF)).alias("vec_id"),
                roll(F.col("embedding"), i).alias("embedding"),
                "label",
            )
            for i in range(COPIES)
        ],
    )
    big_path = os.path.join(work, "emb_10x")
    big.write.mode("overwrite").parquet(big_path)
    big = spark.read.parquet(big_path)

    queries = base.filter(F.col("vec_id") < N_QUERIES).localCheckpoint(
        eager=True
    )
    positives = queries.select(
        F.col("vec_id").alias("query_id"),
        (F.col("vec_id") + 1).alias("pos_id"),
    ).localCheckpoint(eager=True)

    results = {}
    for tag, emb in (("20k", base), ("200k", big)):
        n = emb.count()
        idx = os.path.join(work, f"idx_{tag}")
        t0 = time.time()
        build_kmeans_ivf_index(emb, idx, k=max(16, int(n ** 0.5)))
        build_s = round(time.time() - t0, 2)

        brute_s, brute_rows = timed(
            lambda e=emb: brute_negatives(e, queries, positives).collect())
        truth = {}
        for r in brute_rows:
            truth.setdefault(r["query_id"], set()).add(r["neg_id"])

        # probe sweep: the fixture's vectors are RANDOM (no cluster
        # structure — IVF's worst case), so recall is bought with
        # probes; report the cost/recall curve, not one point
        probe_curve = {}
        for n_probes in (4, 16, 64):
            mine_s, mine_rows = timed(
                lambda p=idx, np=n_probes: mine_hard_negatives(
                    spark, positives, p, queries, k=K, n_probes=np
                ).collect())
            got = {}
            for r in mine_rows:
                got.setdefault(r["query_id"], set()).add(r["neg_id"])
            hits = sum(len(truth[q] & got.get(q, set())) for q in truth)
            recall = round(hits / sum(len(v) for v in truth.values()), 3)
            probe_curve[n_probes] = {
                "index_mine_s": mine_s, "recall_at_k_vs_brute": recall,
            }

        results[tag] = {
            "corpus": n, "index_build_s": build_s,
            "brute_knn_join_s": brute_s, "probes": probe_curve,
        }
        print(json.dumps({tag: results[tag]}))

    print(json.dumps({"hard_negative_cost": results}))


if __name__ == "__main__":
    main()

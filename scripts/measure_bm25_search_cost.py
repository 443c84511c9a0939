"""Re-measure the BM25 index-vs-scan crossover after the r11 batched
search path (r10 verdict #3): one `term IN (...)` pruned posting read
(single bloom-probe job) + lazy corpus stats, replacing r10's K
per-term reads + driver-side corpus .first(). Records wall (min-of-3),
Spark JOB COUNT per search, and pruning, for the 50k-doc clone corpus
and a 10x union (500k docs) — paste into SCALE.md next to the r10
numbers (2.23s / 2.86s indexed, 1.49s / 4.67s scan).

Usage: python scripts/measure_bm25_search_cost.py [clone_dir] [work_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from medallion_data_lake_spark.operators.inverted_index import (  # noqa: E402
    BM25_B,
    BM25_K1,
    bm25_candidates,
    bm25_idf,
    bm25_search,
    bm25_term_score,
    build_doclens,
    build_postings,
    create_bm25_index,
)
from medallion_data_lake_spark.session import get_spark  # noqa: E402

TERMS = ["dup", "vector", "scan"]  # same query as the r10 measurement
K = 15


def scan_bm25(docs, terms, k):
    """From-scratch BM25 in one plan — the gated bm25_topk_docs shape."""
    dl = build_doclens(docs)
    corpus = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("dl").cast("long").alias("sum_dl"),
    )
    postings = build_postings(docs).filter(F.col("term").isin(*terms))
    df_tbl = postings.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    return (
        postings.join(F.broadcast(df_tbl), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .withColumn(
            "_s",
            bm25_term_score(
                F.col("tf"), F.col("dl"), F.col("sum_dl") / F.col("n"),
                bm25_idf(F.col("n"), F.col("df")), BM25_K1, BM25_B,
            ).cast("decimal(28,12)"),
        )
        .groupBy("doc_id")
        .agg(F.sum("_s").alias("_score"))
        .orderBy(F.desc("_score"), F.asc("doc_id"))
        .limit(k)
    )


def timed(fn, n=3):
    walls = []
    for _ in range(n):
        t0 = time.time()
        fn()
        walls.append(time.time() - t0)
    return round(min(walls), 2)


def jobs_for(spark, label, fn):
    sc = spark.sparkContext
    sc.setJobGroup(label, label)
    try:
        fn()
    finally:
        sc.setJobGroup(None, None)
    return len(sc.statusTracker().getJobIdsForGroup(label))


def main() -> None:
    clone = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mdls_scale/sf1.0"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/mdls_scale/bm25cost"
    shutil.rmtree(work, ignore_errors=True)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="bm25-cost", master=f"local[{cpus}]",
        extra_conf={"spark.sql.shuffle.partitions": cpus},
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet(os.path.join(clone, "documents.parquet"))
    corp = {
        "50k": base,
        "500k": None,  # built below: 10x union with id offsets
    }
    parts = [base]
    for i in range(1, 10):
        parts.append(
            base.select(
                (F.col("doc_id") + F.lit(i * 100_000_000)).alias("doc_id"),
                "text", "lang", "source", "n_chars",
            )
        )
    from functools import reduce

    corp["500k"] = reduce(lambda a, b: a.unionByName(b), parts)

    for name, docs in corp.items():
        root = os.path.join(work, f"idx_{name}")
        t0 = time.time()
        create_bm25_index(spark, docs.select("doc_id", "text"), root,
                          n_files=32)
        build_sec = round(time.time() - t0, 1)

        search = lambda: bm25_search(spark, root, TERMS, k=K).collect()  # noqa: E731
        scan = lambda: scan_bm25(docs, TERMS, K).collect()  # noqa: E731
        idx_sec = timed(search)
        scan_sec = timed(scan)
        njobs = jobs_for(spark, f"search-{name}", search)
        _, report = bm25_candidates(spark, root, TERMS)
        print(json.dumps({
            "corpus": name,
            "build_sec": build_sec,
            "indexed_search_sec_min3": idx_sec,
            "scan_search_sec_min3": scan_sec,
            "jobs_per_indexed_search": njobs,
            "pruning": report,
        }))


if __name__ == "__main__":
    main()

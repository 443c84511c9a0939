"""Serving warm-path latency (r11 verdict item 4): p50/p95 and
Spark-jobs-per-request for the persisted searches, COLD (each request
re-pins the snapshot, folds corpus stats, re-reads index tables — the
r11 state) vs WARM (one WarmSearchSession: snapshot pinned once,
(N, sum_dl) as plan literals, doclens/termstats/embeddings
Spark-cached).

Fixture: the sf1.0 clone's 50k documents (BM25 + bigrams index, docs
committed to a versioned store for scan-free phrase point-reads) and
its 20k embeddings for the hybrid vector branch.

Requests (distinct term sets round-robin so no result is a repeat):
- bm25:   3-term keyword search, k=10
- phrase: 2-token exact phrase (point-read form)
- hybrid: keyword + vector RRF fusion, k=10

Jobs/request via the Spark UI REST /jobs delta.

Usage: python scripts/measure_serving_warm.py [clone_dir] [work_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from medallion_data_lake_spark.operators.hybrid import hybrid_search  # noqa: E402
from medallion_data_lake_spark.operators.inverted_index import (  # noqa: E402
    bm25_search,
    create_bm25_index,
    phrase_search_pointread,
)
from medallion_data_lake_spark.operators.search_session import (  # noqa: E402
    WarmSearchSession,
)
from medallion_data_lake_spark.operators.versioned import commit  # noqa: E402
from medallion_data_lake_spark.session import get_spark  # noqa: E402

TERM_SETS = [
    ["stream", "table", "hash"],
    ["join", "state", "filter"],
    ["scan", "shuffle", "probe"],
    ["window", "batch", "merge"],
]
PHRASES = [["stream", "table"], ["hash", "join"],
           ["state", "store"], ["batch", "merge"]]
N_REQ = 12


def n_jobs(spark) -> int:
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/jobs") as r:
        return len(json.loads(r.read()))


def run_requests(spark, fns) -> dict:
    walls, jobs = [], []
    for i in range(N_REQ):
        j0 = n_jobs(spark)
        t0 = time.time()
        fns[i % len(fns)]()
        walls.append(time.time() - t0)
        jobs.append(n_jobs(spark) - j0)
    walls.sort()
    return {
        "p50_s": round(statistics.median(walls), 3),
        "p95_s": round(walls[max(0, int(0.95 * len(walls)) - 1)], 3),
        "jobs_per_request": round(sum(jobs) / len(jobs), 1),
    }


def main() -> None:
    clone = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mdls_scale/sf1.0"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/mdls_scale/warmserve"
    shutil.rmtree(work, ignore_errors=True)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="warm-serve", master=f"local[{cpus}]",
        extra_conf={"spark.sql.shuffle.partitions": cpus,
                    # the max-task / jobs-per-request telemetry reads
                    # the UI REST API (off by default in get_spark)
                    "spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(clone, "documents.parquet")) \
        .select("doc_id", "text")
    emb = spark.read.parquet(os.path.join(clone, "embeddings.parquet")) \
        .select("vec_id", "embedding")

    root = os.path.join(work, "bm25")
    create_bm25_index(spark, docs, root, n_files=32, bigrams=True)
    store = os.path.join(work, "docstore")
    commit(docs.repartition(32), store,
           stats_cols=("doc_id",), bloom_cols=("doc_id",))

    out = {}

    def cold_fns():
        return [
            lambda i=i: bm25_search(
                spark, root, TERM_SETS[i % 4], k=10).collect()
            for i in range(4)
        ] + [
            lambda i=i: phrase_search_pointread(
                spark, root, store, PHRASES[i % 4])[0].collect()
            for i in range(4)
        ] + [
            lambda i=i: hybrid_search(
                spark, root, emb, TERM_SETS[i % 4], (i % 4) + 1, k=10
            ).collect()
            for i in range(4)
        ]

    fns = cold_fns()
    out["cold_bm25"] = run_requests(spark, fns[:4])
    out["cold_phrase"] = run_requests(spark, fns[4:8])
    out["cold_hybrid"] = run_requests(spark, fns[8:])

    t0 = time.time()
    session = WarmSearchSession(
        spark, root, embeddings=emb, docs_table=store)
    # materialize the caches once (first request pays it otherwise) —
    # including the r13 tokenized-doc projection the phrase warm path
    # semi-joins against
    session.bm25(TERM_SETS[0], k=10).collect()
    session.phrase(PHRASES[0])[0].collect()
    out["warm_open_s"] = round(time.time() - t0, 2)

    wfns = [
        lambda i=i: session.bm25(TERM_SETS[i % 4], k=10).collect()
        for i in range(4)
    ]
    out["warm_bm25"] = run_requests(spark, wfns)
    pfns = [
        lambda i=i: session.phrase(PHRASES[i % 4])[0].collect()
        for i in range(4)
    ]
    out["warm_phrase"] = run_requests(spark, pfns)
    hfns = [
        lambda i=i: session.hybrid(
            TERM_SETS[i % 4], (i % 4) + 1, k=10).collect()
        for i in range(4)
    ]
    out["warm_hybrid"] = run_requests(spark, hfns)
    session.close()

    print(json.dumps({"serving_warm": out}))


if __name__ == "__main__":
    main()

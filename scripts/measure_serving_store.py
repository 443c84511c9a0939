"""Serving-store latency (r12 verdict item 1): the measured answer to
the ~1s warm-Spark serving floor.

SCALE.md round 12 showed the warm session buys bm25 p50 1.66s→0.97s
but floors there — every request is still a Spark job. The claimed fix
was "serve from the exported store (the JDBC gold path, S10), not a
Spark job per request"; this script makes that claim a number:

- build the BM25 index over the sf1.0 clone's 50k documents;
- export the serving projection to embedded Derby through the
  distributed JDBC sink (serving_store.export_search_store), plus a
  50k-row gold table with an indexed key;
- measure p50/p95 and Spark-jobs-per-request for:
  warm-Spark bm25 (the r12 baseline, re-measured in-session) vs
  store bm25 (same queries, same k), store gold point lookup,
  store gold top-k;
- assert inline that every measured store result equals the lake's
  at the exported snapshot (ids exact, scores to 1e-9).

Usage: python scripts/measure_serving_store.py [clone_dir] [work_dir]
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

from pyspark.sql import functions as F  # noqa: E402

from medallion_data_lake_spark.operators.inverted_index import (  # noqa: E402
    bm25_search,
    committed_index_snapshot,
    create_bm25_index,
)
from medallion_data_lake_spark.operators.search_session import (  # noqa: E402
    WarmSearchSession,
)
from medallion_data_lake_spark.serving_store import (  # noqa: E402
    ServingStore,
    export_gold_store,
    export_search_store,
)
from medallion_data_lake_spark.session import get_spark  # noqa: E402

TERM_SETS = [
    ["stream", "table", "hash"],
    ["join", "state", "filter"],
    ["scan", "shuffle", "probe"],
    ["window", "batch", "merge"],
]
N_REQ_SPARK = 12
N_REQ_STORE = 60  # store requests are ms-level; more samples


def n_jobs(spark) -> int:
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/jobs") as r:
        return len(json.loads(r.read()))


def run_requests(spark, fns, n_req) -> dict:
    walls, jobs = [], []
    for i in range(n_req):
        j0 = n_jobs(spark)
        t0 = time.time()
        fns[i % len(fns)]()
        walls.append(time.time() - t0)
        jobs.append(n_jobs(spark) - j0)
    walls.sort()
    return {
        "p50_s": round(statistics.median(walls), 4),
        "p95_s": round(walls[max(0, int(0.95 * len(walls)) - 1)], 4),
        "jobs_per_request": round(sum(jobs) / len(jobs), 2),
    }


def main() -> None:
    clone = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mdls_scale/sf1.0"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/mdls_scale/storeserve"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="store-serve", master=f"local[{cpus}]",
        extra_conf={"spark.sql.shuffle.partitions": cpus,
                    "spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark._jvm.java.lang.System.setProperty("derby.system.home", work)

    docs = spark.read.parquet(os.path.join(clone, "documents.parquet")) \
        .select("doc_id", "text")

    root = os.path.join(work, "bm25")
    create_bm25_index(spark, docs, root, n_files=32)
    url = f"jdbc:derby:{work}/servingdb;create=true"

    out = {}

    # -- export cost (one distributed JDBC write per table) -------------
    t0 = time.time()
    pins = export_search_store(spark, root, url)
    out["export_search_s"] = round(time.time() - t0, 2)

    gold = docs.select(
        "doc_id",
        F.size(F.split("text", r"\s+")).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars"),
    )
    t0 = time.time()
    export_gold_store(spark, {"gold_doc_stats": gold}, url,
                      indexes={"gold_doc_stats": "doc_id"})
    out["export_gold_s"] = round(time.time() - t0, 2)

    # -- warm-Spark baseline (the r12 serving floor, re-measured) -------
    session = WarmSearchSession(spark, root)
    session.bm25(TERM_SETS[0], k=10).collect()  # materialize caches
    out["warm_spark_bm25"] = run_requests(
        spark,
        [lambda i=i: session.bm25(TERM_SETS[i % 4], k=10).collect()
         for i in range(4)],
        N_REQ_SPARK,
    )

    # -- store tier ------------------------------------------------------
    store = ServingStore(spark, url)
    # sanity: every measured query equals the lake at the pinned snapshot
    for terms in TERM_SETS:
        lake = [(r["doc_id"], r["n_terms_matched"], r["score"])
                for r in bm25_search(spark, root, terms, k=10,
                                     pins=pins).collect()]
        got = [tuple(r) for r in store.bm25(terms, k=10)["rows"]]
        assert [g[:2] for g in got] == [l[:2] for l in lake], terms
        assert all(abs(g[2] - l[2]) < 1e-9 for g, l in zip(got, lake))
    out["store_bm25"] = run_requests(
        spark,
        [lambda i=i: store.bm25(TERM_SETS[i % 4], k=10) for i in range(4)],
        N_REQ_STORE,
    )
    # per-request cost tracks CANDIDATE POSTING COUNT, not corpus size —
    # the fixture's tiny vocabulary makes posting lists pathologically
    # long (3 common terms cover ~10% of ALL postings), so record the
    # candidate counts and a 1-term point for the selectivity curve
    def _cands(terms):
        marks = ", ".join("?" for _ in terms)
        return store.query(
            'SELECT COUNT(*) FROM mdls_postings p '
            f'WHERE p."term" IN ({marks})', list(terms))["rows"][0][0]

    rare = store.query(
        'SELECT "term", "df" FROM mdls_termstats '
        'ORDER BY "df" ASC FETCH FIRST 1 ROWS ONLY')["rows"][0]
    out["candidates_3term"] = _cands(TERM_SETS[0])
    out["rare_term_df"] = rare[1]
    out["postings_total"] = store.query(
        "SELECT COUNT(*) FROM mdls_postings")["rows"][0][0]
    out["store_bm25_rare_term"] = run_requests(
        spark, [lambda: store.bm25([rare[0]], k=10)], N_REQ_STORE)
    ids = [r["doc_id"] for r in docs.select("doc_id").limit(64).collect()]
    out["store_gold_point"] = run_requests(
        spark,
        [lambda i=i: store.gold_point("gold_doc_stats", "doc_id",
                                      ids[i % len(ids)])
         for i in range(8)],
        N_REQ_STORE,
    )
    out["store_gold_topk"] = run_requests(
        spark,
        [lambda: store.gold_topk("gold_doc_stats", "n_tokens", k=10)],
        N_REQ_STORE,
    )
    out["speedup_p50"] = round(
        out["warm_spark_bm25"]["p50_s"] / out["store_bm25"]["p50_s"], 1)
    store.close()
    session.close()
    assert committed_index_snapshot(root) == pins
    print(json.dumps({"serving_store": out}))


if __name__ == "__main__":
    main()

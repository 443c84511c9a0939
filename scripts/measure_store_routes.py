"""Measure the r14 serving-store extensions at the 50k clone (the r13
verdict's two remaining serving items):

(a) store p50 / Spark-jobs-per-request for /phrase, /similar and
    /hybrid against the warm-Spark session answering the SAME requests
    — extending the r13 "zero-job sub-second tier" table from bm25 to
    every hot shape, with inline store≡lake equality assertions;
(b) incremental vs full export after a 50-doc (0.1%) append — the
    steady-state operating cost the r13 verdict flagged (29.6s full
    re-export per append at this clone), with the ε-drift and
    affected-vocabulary numbers that bound what the increment serves
    stale.

Usage: python scripts/measure_store_routes.py [clone_dir] [work_dir]
(defaults /tmp/mdls_scale/sf1.0, /tmp/mdls_scale/storeroutes; build the
clone first with scripts/make_scale_clone.py).
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

from medallion_data_lake_spark.operators.ann import build_ivf_index  # noqa: E402
from medallion_data_lake_spark.operators.hybrid import hybrid_search  # noqa: E402
from medallion_data_lake_spark.operators.inverted_index import (  # noqa: E402
    append_bm25_index,
    clean_tokens,
    create_bm25_index,
    phrase_search,
)
from medallion_data_lake_spark.operators.search_session import (  # noqa: E402
    WarmSearchSession,
)
from medallion_data_lake_spark.serving_store import (  # noqa: E402
    ServingStore,
    export_search_store,
    export_search_store_incremental,
    export_vector_store,
)
from medallion_data_lake_spark.session import get_spark  # noqa: E402

N_REQ_SPARK = 12
N_REQ_STORE = 60
N_PROBES = 4


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
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/mdls_scale/storeroutes"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="store-routes", master=f"local[{cpus}]",
        extra_conf={"spark.sql.shuffle.partitions": cpus,
                    "spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark._jvm.java.lang.System.setProperty("derby.system.home", work)

    docs = spark.read.parquet(os.path.join(clone, "documents.parquet")) \
        .select("doc_id", "text")
    emb = spark.read.parquet(os.path.join(clone, "embeddings.parquet")) \
        .select("vec_id", "embedding")

    out = {"n_docs": docs.count(), "n_vectors": emb.count()}

    # request material: 4 real 3-token phrases + 4 query ids
    sample = (
        docs.select("doc_id", clean_tokens(F.col("text")).alias("t"))
        .filter(F.size("t") >= 3).limit(4).collect()
    )
    phrases = [list(r["t"][:3]) for r in sample]
    vec_ids = [r["vec_id"] for r in emb.select("vec_id").limit(4).collect()]
    term_sets = [p[:2] for p in phrases]

    root = os.path.join(work, "bm25")
    create_bm25_index(spark, docs, root, n_files=32, bigrams=True)
    vec_idx = os.path.join(work, "ivf")
    build_ivf_index(emb, vec_idx)
    url = f"jdbc:derby:{work}/servingdb;create=true"

    # -- export costs ------------------------------------------------------
    t0 = time.time()
    pins = export_search_store(spark, root, url, docs=docs)
    out["export_full_with_bigrams_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    export_vector_store(spark, url, vec_index=vec_idx, k_max=20,
                        n_probes=N_PROBES)
    out["export_vector_ivf_s"] = round(time.time() - t0, 2)

    # -- warm-Spark baseline on the same requests --------------------------
    session = WarmSearchSession(spark, root, embeddings=emb,
                                vec_index=vec_idx, docs=docs)
    session.phrase(phrases[0])[0].collect()  # materialize caches
    session.similar(vec_ids[0], k=10).collect()
    out["warm_phrase"] = run_requests(
        spark,
        [lambda i=i: session.phrase(phrases[i])[0].collect()
         for i in range(4)],
        N_REQ_SPARK)
    out["warm_similar"] = run_requests(
        spark,
        [lambda i=i: session.similar(vec_ids[i], k=10,
                                     n_probes=N_PROBES).collect()
         for i in range(4)],
        N_REQ_SPARK)
    out["warm_hybrid"] = run_requests(
        spark,
        [lambda i=i: session.hybrid(term_sets[i], vec_ids[i],
                                    k=10).collect()
         for i in range(4)],
        N_REQ_SPARK)

    # -- store tier, equality asserted before timing ------------------------
    store = ServingStore(spark, url)
    for p in phrases:
        lake, _ = phrase_search(spark, root, docs, p, pins=pins)
        got = {tuple(r) for r in store.phrase(p)["rows"]}
        assert got == {(r["doc_id"], r["n_matches"])
                       for r in lake.collect()}, p
    for q in vec_ids:
        lake = [(r["vec_id"], r["rank"])
                for r in session.similar(q, k=10,
                                         n_probes=N_PROBES).collect()]
        got = [tuple(r) for r in store.similar(q, k=10)["rows"]]
        assert got == sorted(lake, key=lambda t: t[1]), q
    for terms, q in zip(term_sets, vec_ids):
        lake = [(r["doc_id"], r["kw_rank"], r["vec_rank"])
                for r in hybrid_search(spark, root, emb, terms, q, k=10,
                                       vec_index=vec_idx,
                                       n_probes=N_PROBES,
                                       pins=pins).collect()]
        got = [tuple(r)[:3]
               for r in store.hybrid(terms, q, k=10)["rows"]]
        assert got == lake, (terms, q)
    out["equality"] = "store == lake asserted for all measured requests"

    out["store_phrase"] = run_requests(
        spark, [lambda i=i: store.phrase(phrases[i]) for i in range(4)],
        N_REQ_STORE)
    out["store_similar"] = run_requests(
        spark, [lambda i=i: store.similar(vec_ids[i], k=10)
                for i in range(4)],
        N_REQ_STORE)
    out["store_hybrid"] = run_requests(
        spark, [lambda i=i: store.hybrid(term_sets[i], vec_ids[i], k=10)
                for i in range(4)],
        N_REQ_STORE)
    for route in ("phrase", "similar", "hybrid"):
        out[f"speedup_{route}_p50"] = round(
            out[f"warm_{route}"]["p50_s"] / out[f"store_{route}"]["p50_s"], 1)
    store.close()
    session.close()

    # -- incremental vs full export after a 0.1% append ---------------------
    vocab = [r["t"] for r in
             docs.select(F.explode(clean_tokens(F.col("text")))
                         .alias("t")).distinct().limit(40).collect()]
    # ids far above every clone key (copy offsets reach ~9e7)
    new_rows = [(900_000_000 + i,
                 " ".join(vocab[(i + j) % len(vocab)] for j in range(200)))
                for i in range(50)]
    new_docs = spark.createDataFrame(new_rows, "doc_id long, text string")
    append_bm25_index(spark, new_docs, root)
    docs2 = docs.unionByName(new_docs)

    t0 = time.time()
    # allow_stale_vectors: this leg measures the BM25 increment alone;
    # the r15 staleness guard otherwise (correctly) refuses to advance
    # a store that also carries the kNN graph. The vector side's own
    # increment is measured by scripts/measure_index_maintenance.py.
    rep = export_search_store_incremental(spark, root, url, docs=docs2,
                                          allow_stale_vectors=True)
    out["incremental_export_s"] = round(time.time() - t0, 2)
    out["incremental_mode"] = rep["mode"]
    out["incremental_drift"] = round(rep["drift"], 5)
    out["incremental_affected_terms"] = rep["affected_terms"]

    url2 = f"jdbc:derby:{work}/servingdb2;create=true"
    t0 = time.time()
    export_search_store(spark, root, url2, docs=docs2)
    out["full_reexport_s"] = round(time.time() - t0, 2)
    out["incremental_speedup"] = round(
        out["full_reexport_s"] / out["incremental_export_s"], 1)

    # post-increment checks, matching the per-term ε contract exactly:
    # a drifted/recomputed term is EXACT vs the lake; a df-stable common
    # term keeps exact MEMBERSHIP with per-doc score drift bounded by
    # the ε rule (its existing rows intentionally keep the old idf).
    from medallion_data_lake_spark.operators.inverted_index import (
        bm25_search,
        committed_index_snapshot,
    )

    pins2 = committed_index_snapshot(root)
    with ServingStore(spark, url) as store2:
        stable = vocab[0]
        lake_all = {
            r["doc_id"]: r["score"]
            for r in bm25_search(spark, root, [stable], k=10_000,
                                 pins=pins2).collect()
        }
        got_all = {r[0]: r[2]
                   for r in store2.bm25([stable], k=10_000)["rows"]}
        assert set(got_all) == set(lake_all)  # membership exact
        max_rel = max(
            abs(got_all[d] - lake_all[d]) / abs(lake_all[d])
            for d in lake_all
        )
        out["stable_term_max_score_drift"] = round(max_rel, 5)
        assert max_rel < 0.05, max_rel  # ε-bounded staleness
    print(json.dumps({"store_routes": out}))


if __name__ == "__main__":
    main()

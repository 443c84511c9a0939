"""Measure the cost of the `allowed=` pre-rank filter on the persisted
retrieval paths (r11 filtered-search additions): BM25 keyword search
and IVF vector search, filtered vs unfiltered, at clone scale — plus a
runtime check that AQE really broadcasts a small allow-list (the
docstrings' claim for why the semi-join is unhinted).

Usage: python scripts/measure_filtered_search_cost.py [clone_dir] [work_dir]
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
    build_kmeans_ivf_index,
    search_index,
)
from medallion_data_lake_spark.operators.inverted_index import (  # noqa: E402
    bm25_search,
    create_bm25_index,
)
from medallion_data_lake_spark.session import get_spark  # noqa: E402

TERMS = ["stream", "table", "hash"]


def timed(fn, n=3):
    walls, out = [], None
    for _ in range(n):
        t0 = time.time()
        out = fn()
        walls.append(time.time() - t0)
    return round(min(walls), 2), out


def main() -> None:
    clone = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mdls_scale/sf1.0"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/mdls_scale/fscost"
    shutil.rmtree(work, ignore_errors=True)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="filtered-cost", master=f"local[{cpus}]",
        extra_conf={"spark.sql.shuffle.partitions": cpus},
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(os.path.join(clone, "documents.parquet")) \
        .select("doc_id", "text")
    emb = spark.read.parquet(os.path.join(clone, "embeddings.parquet"))

    kw_root = os.path.join(work, "bm25")
    create_bm25_index(spark, docs, kw_root, n_files=32)
    ivf = os.path.join(work, "ivf")
    build_kmeans_ivf_index(emb, ivf, k=141)

    # allow-lists: SMALL (1k ids — must broadcast under AQE) and LARGE
    # (half the corpus — must not die, may shuffle)
    small = docs.select("doc_id").filter(F.col("doc_id") % 50 == 0)
    large = docs.select("doc_id").filter(F.col("doc_id") % 2 == 0)
    queries = emb.filter(F.col("vec_id") < 32)

    out = {}
    out["bm25_unfiltered_s"], _ = timed(
        lambda: bm25_search(spark, kw_root, TERMS, k=10).collect())
    out["bm25_small_allow_s"], _ = timed(
        lambda: bm25_search(spark, kw_root, TERMS, k=10,
                            allowed=small).collect())
    out["bm25_large_allow_s"], _ = timed(
        lambda: bm25_search(spark, kw_root, TERMS, k=10,
                            allowed=large).collect())

    out["ivf_unfiltered_s"], _ = timed(
        lambda: search_index(spark, ivf, queries, n_probes=4, k=5).collect())
    out["ivf_small_allow_s"], _ = timed(
        lambda: search_index(spark, ivf, queries, n_probes=4, k=5,
                             allowed=small.withColumnRenamed(
                                 "doc_id", "vec_id")).collect())
    out["ivf_large_allow_s"], _ = timed(
        lambda: search_index(spark, ivf, queries, n_probes=4, k=5,
                             allowed=large.withColumnRenamed(
                                 "doc_id", "vec_id")).collect())

    # AQE-broadcast check: the allow-list semi-join SPECIFICALLY must be
    # broadcast, not merely "some broadcast exists" — the unfiltered
    # bm25_search plan already carries broadcasts (corpus-stats / query
    # joins), so compare LeftSemi-broadcast node counts against it.
    def _semi_broadcasts(frame) -> int:
        frame.collect()
        plan = frame._jdf.queryExecution().executedPlan().toString()
        return sum(
            1
            for line in plan.splitlines()
            if "BroadcastHashJoin" in line and "LeftSemi" in line
        )

    base = _semi_broadcasts(bm25_search(spark, kw_root, TERMS, k=10))
    filt = _semi_broadcasts(
        bm25_search(spark, kw_root, TERMS, k=10, allowed=small))
    out["semi_broadcast_joins_unfiltered"] = base
    out["semi_broadcast_joins_small_allow"] = filt
    out["small_allow_broadcast_in_plan"] = filt > base

    print(json.dumps({"filtered_search_cost": out}))


if __name__ == "__main__":
    main()

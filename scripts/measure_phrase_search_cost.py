"""Measure indexed phrase retrieval vs a full scan at clone scale —
the bigram-table companion to `measure_bm25_search_cost.py`. Builds a
bigram-enabled index over the 50k-doc clone corpus and a 10x union
(500k docs), then times `phrase_search` (bloom-pruned bigram
intersection + candidate-bounded exact residual) against the scan path
(`phrase_position_hits` over the whole corpus), min-of-3, with the
bigram pruning report.

Usage: python scripts/measure_phrase_search_cost.py [clone_dir] [work_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from functools import reduce

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from medallion_data_lake_spark.operators.inverted_index import (  # noqa: E402
    clean_tokens,
    create_bm25_index,
    phrase_candidates,
    phrase_position_hits,
    phrase_search,
    phrase_search_pointread,
)
from medallion_data_lake_spark.operators.versioned import commit  # noqa: E402
from medallion_data_lake_spark.session import get_spark  # noqa: E402

PHRASE = ["stream", "table", "hash"]  # df 11 in the clone's copy-0 docs


def timed(fn, n=3):
    walls = []
    out = None
    for _ in range(n):
        t0 = time.time()
        out = fn()
        walls.append(time.time() - t0)
    return round(min(walls), 2), out


def main() -> None:
    clone = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mdls_scale/sf1.0"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/mdls_scale/phrasecost"
    shutil.rmtree(work, ignore_errors=True)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="phrase-cost", master=f"local[{cpus}]",
        extra_conf={"spark.sql.shuffle.partitions": cpus},
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet(os.path.join(clone, "documents.parquet")) \
        .select("doc_id", "text")
    parts = [base] + [
        base.select(
            (F.col("doc_id") + F.lit(i * 100_000_000)).alias("doc_id"),
            "text",
        )
        for i in range(1, 10)
    ]
    corpora = {
        "50k": base,
        "500k": reduce(lambda a, b: a.unionByName(b), parts),
    }

    for name, docs in corpora.items():
        root = os.path.join(work, f"idx_{name}")
        t0 = time.time()
        create_bm25_index(spark, docs, root, n_files=32, bigrams=True)
        build_sec = round(time.time() - t0, 1)

        indexed = lambda: phrase_search(spark, root, docs, PHRASE)[0].collect()  # noqa: E731

        def scan():
            toks = docs.select(
                "doc_id", clean_tokens(F.col("text")).alias("_toks")
            )
            return phrase_position_hits(toks, PHRASE).collect()

        idx_sec, rows = timed(indexed)
        scan_sec, scan_rows = timed(scan)
        assert sorted(map(tuple, rows)) == sorted(map(tuple, scan_rows))
        _, report = phrase_candidates(spark, root, PHRASE)

        # the SCAN-FREE serving path: candidates point-read from a
        # versioned doc store with doc_id stats+bloom
        store = os.path.join(work, f"store_{name}")
        commit(docs, store, stats_cols=("doc_id",),
               bloom_cols=("doc_id",))
        pr = lambda: phrase_search_pointread(spark, root, store, PHRASE)  # noqa: E731
        pr_sec, _ = timed(lambda: pr()[0].collect())
        pr_df, pr_report = pr()
        assert sorted(map(tuple, pr_df.collect())) == \
            sorted(map(tuple, scan_rows))
        print(json.dumps({
            "corpus": name,
            "build_sec_with_bigrams": build_sec,
            "indexed_phrase_sec_min3": idx_sec,
            "scan_phrase_sec_min3": scan_sec,
            "pointread_phrase_sec_min3": pr_sec,
            "matches": len(rows),
            "bigram_pruning": report,
            "pointread_report": pr_report,
        }))


if __name__ == "__main__":
    main()

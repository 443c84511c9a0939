"""Cross-batch NEAR-dup admission: LSH band ledger + signature verify.

Asserts the three contract points: a near-identical re-delivery in a
LATER drop is refused without re-reading the historical corpus text, a
genuinely new document passes, and a replayed batch rewrites its own
partitions instead of duplicating (idempotence)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from medallion_data_lake_spark.streaming.corpus import (
    run_incremental_corpus_ingest_near,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while seventeen "
    "green turtles carry ancient maps across the quiet river delta "
    "under a pale morning sky full of slow clouds and distant birds"
)
NEAR = BASE.replace("distant birds", "distant kites")  # tail edit: near-dup
UNIQUE = (
    "completely different subject matter entirely about compilers "
    "register allocation graph coloring spill heuristics and the "
    "linear scan tradeoffs in just in time code generation pipelines"
)


def _doc(i, text, lang="en", source="crawl"):
    return json.dumps({"doc_id": i, "text": text, "lang": lang, "source": source})


@pytest.fixture()
def dirs(tmp_path):
    d = {
        k: str(tmp_path / k)
        for k in ("input", "corpus", "ledger", "bands", "ck")
    }
    import os

    os.makedirs(d["input"])
    return d


def _run(spark, d):
    q = run_incremental_corpus_ingest_near(
        spark, d["input"], d["corpus"], d["ledger"], d["bands"], d["ck"]
    )
    q.awaitTermination()


def test_near_dup_refused_across_batches(spark, dirs):
    import os

    # drop 1: the original + an in-batch near-dup of it (min id wins)
    with open(os.path.join(dirs["input"], "drop1.json"), "w") as f:
        f.write("\n".join([_doc(10, BASE), _doc(11, NEAR), _doc(12, UNIQUE)]))
    _run(spark, dirs)
    corpus = spark.read.parquet(dirs["corpus"])
    ids = {r["doc_id"] for r in corpus.collect()}
    assert ids == {10, 12}  # 11 lost in-batch to the smaller id 10

    # drop 2: a near-dup re-delivery of BASE under a new id + a new doc
    with open(os.path.join(dirs["input"], "drop2.json"), "w") as f:
        f.write("\n".join([
            _doc(20, BASE.replace("pale morning", "grey morning")),
            _doc(21, "fresh unrelated content about tidal energy turbines "
                     "estuary placement maintenance corrosion and grid "
                     "integration economics across northern coastal sites"),
        ]))
    _run(spark, dirs)
    ids2 = {r["doc_id"] for r in spark.read.parquet(dirs["corpus"]).collect()}
    assert 20 not in ids2          # refused by the band ledger + verify
    assert ids2 == {10, 12, 21}

    # ledger holds band rows only for ADMITTED docs
    bands = spark.read.parquet(dirs["bands"])
    assert set(r["doc_id"] for r in bands.select("doc_id").distinct().collect()) == {10, 12, 21}


def test_replay_is_idempotent(spark, dirs):
    import os
    import shutil

    with open(os.path.join(dirs["input"], "drop1.json"), "w") as f:
        f.write("\n".join([_doc(1, BASE), _doc(2, UNIQUE)]))
    _run(spark, dirs)
    n1 = spark.read.parquet(dirs["corpus"]).count()
    # lose the checkpoint -> the same files replay as a new batch 0;
    # dynamic overwrite of the batch partition must not duplicate
    shutil.rmtree(dirs["ck"])
    _run(spark, dirs)
    corpus = spark.read.parquet(dirs["corpus"])
    assert corpus.count() == n1 == 2
    assert corpus.select("doc_id").distinct().count() == 2
    bands = spark.read.parquet(dirs["bands"])
    assert bands.groupBy("doc_id", "band").count().filter(
        F.col("count") > 1
    ).count() == 0

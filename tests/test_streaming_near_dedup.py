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


# ---------------------------------------------------------------------------
# Two-tier band ledger (compact_band_ledger_base)
# ---------------------------------------------------------------------------


def _docs_df(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "crawl") for i, t in rows],
        "doc_id long, text string, lang string, source string",
    )


def test_band_base_refuses_near_dups_from_compacted_history(spark, tmp_path):
    from medallion_data_lake_spark.streaming.corpus import (
        admit_batch_near,
        compact_band_ledger_base,
    )

    corpus = str(tmp_path / "corpus")
    ledger = str(tmp_path / "ledger")
    bands = str(tmp_path / "bands")
    base = "band_base_t1"
    try:
        admit_batch_near(_docs_df(spark, [(1, BASE), (2, UNIQUE)]), 0,
                         corpus, ledger, bands, band_base_table=base)
        compact_band_ledger_base(spark, bands, base, n_buckets=4)
        # near-dup of BASE arrives AFTER compaction: only the bucketed
        # base knows batch 0 — the tail above the watermark is empty
        admit_batch_near(
            _docs_df(spark, [(10, NEAR), (11, "fresh totally novel words "
                                              "about gardening and soil")]),
            1, corpus, ledger, bands, band_base_table=base,
        )
        got = {r.doc_id for r in spark.read.parquet(corpus).collect()}
        assert got == {1, 2, 11}          # 10 refused via the base tier
        # a near-dup of a TAIL-era doc (batch 1, post-compaction) is
        # still refused through the parquet tail
        admit_batch_near(
            _docs_df(spark, [(20, "fresh totally novel words about "
                                  "gardening and dirt")]),
            2, corpus, ledger, bands, band_base_table=base,
        )
        assert 20 not in {
            r.doc_id for r in spark.read.parquet(corpus).collect()}
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {base}")


def test_band_base_probe_never_shuffles_history(spark, tmp_path):
    from medallion_data_lake_spark.plans import count_shuffles, explain_str
    from medallion_data_lake_spark.streaming.corpus import (
        _band_key64,
        _signature_bands,
        admit_batch_near,
        compact_band_ledger_base,
    )

    corpus = str(tmp_path / "corpus")
    ledger = str(tmp_path / "ledger")
    bands = str(tmp_path / "bands")
    base = "band_base_t2"
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold")
    try:
        admit_batch_near(
            _docs_df(spark, [(i, f"{BASE} variation {i}") for i in range(8)]),
            0, corpus, ledger, bands,
        )
        compact_band_ledger_base(spark, bands, base, n_buckets=4)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        probe = _signature_bands(_docs_df(spark, [(100, NEAR)])).withColumn(
            "band_key", _band_key64(F.col("band"), F.col("bkey"))
        )
        hit = probe.join(
            spark.table(base).select("band_key", F.col("sig").alias("h_sig")),
            "band_key",
        )
        plan = explain_str(hit)
        # history side: scanned in bucket layout, no Exchange above it;
        # the probe (batch) side shuffles into the buckets
        assert count_shuffles(hit) == 1, plan
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", prev_aqe)
        spark.sql(f"DROP TABLE IF EXISTS {base}")

"""Incremental corpus ingestion with cross-batch dedup (streaming/corpus.py)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from medallion_data_lake_spark.streaming.corpus import (
    admit_batch,
    run_incremental_corpus_ingest,
)


def _write_drop(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _dirs(tmp_path):
    return (
        str(tmp_path / "in"), str(tmp_path / "corpus"),
        str(tmp_path / "ledger"), str(tmp_path / "ckpt"),
    )


def test_cross_batch_dedup(spark, tmp_path):
    in_dir, corpus, ledger, ckpt = _dirs(tmp_path)
    _write_drop(f"{in_dir}/drop1.json", [
        {"doc_id": 1, "text": "alpha beta gamma", "lang": "en", "source": "a"},
        {"doc_id": 2, "text": "delta epsilon", "lang": "en", "source": "a"},
        {"doc_id": 3, "text": "ALPHA  BETA GAMMA", "lang": "en", "source": "a"},
    ])
    q = run_incremental_corpus_ingest(spark, in_dir, corpus, ledger, ckpt)
    q.awaitTermination(60)
    got = spark.read.parquet(corpus)
    # within-batch dedup: doc 3 is a normalized dup of doc 1
    assert {r.doc_id for r in got.collect()} == {1, 2}

    # second drop: one historical dup, one new doc
    _write_drop(f"{in_dir}/drop2.json", [
        {"doc_id": 10, "text": "alpha beta gamma", "lang": "en", "source": "b"},
        {"doc_id": 11, "text": "zeta eta theta", "lang": "de", "source": "b"},
    ])
    q = run_incremental_corpus_ingest(spark, in_dir, corpus, ledger, ckpt)
    q.awaitTermination(60)
    got = {r.doc_id for r in spark.read.parquet(corpus).collect()}
    assert got == {1, 2, 11}  # 10 rejected: content already in corpus
    # ledger holds one row per admitted doc
    assert spark.read.parquet(ledger).count() == 3


def test_batch_replay_is_idempotent(spark, tmp_path):
    _, corpus, ledger, _ = _dirs(tmp_path)
    rows = [
        (1, "one two three", "en", "a"),
        (2, "four five six", "en", "a"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    admit_batch(df, 0, corpus, ledger)
    first = sorted(r.doc_id for r in spark.read.parquet(corpus).collect())
    # replay of the SAME batch id (failure recovery) must not drop rows
    # against its own ledger write, nor duplicate them
    admit_batch(df, 0, corpus, ledger)
    again = sorted(r.doc_id for r in spark.read.parquet(corpus).collect())
    assert first == again == [1, 2]
    assert spark.read.parquet(ledger).count() == 2


def test_corpus_columns_preserved(spark, tmp_path):
    _, corpus, ledger, _ = _dirs(tmp_path)
    df = spark.createDataFrame(
        [(1, "text body", "fr", "src9")],
        "doc_id long, text string, lang string, source string",
    )
    admit_batch(df, 5, corpus, ledger)
    row = spark.read.parquet(corpus).collect()[0]
    assert (row.doc_id, row.text, row.lang, row.source) == (1, "text body", "fr", "src9")
    assert row._batch_id == 5


def test_incremental_chunks_follow_admission(spark, tmp_path):
    in_dir, corpus, ledger, ckpt = _dirs(tmp_path)
    chunks = str(tmp_path / "chunks")
    long_text = " ".join(f"t{i}" for i in range(100))
    _write_drop(f"{in_dir}/drop1.json", [
        {"doc_id": 1, "text": long_text, "lang": "en", "source": "a"},
        {"doc_id": 2, "text": "short doc", "lang": "en", "source": "a"},
    ])
    q = run_incremental_corpus_ingest(spark, in_dir, corpus, ledger, ckpt,
                                      chunks_dir=chunks)
    q.awaitTermination(60)
    got = spark.read.parquet(chunks)
    # 100 tokens @ stride 48 -> 3 chunks; 2 tokens -> 1 chunk
    per_doc = {r.doc_id: r.n for r in
               got.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    assert per_doc == {1: 3, 2: 1}

    # a later drop with one dup: only the NEW doc gains chunk rows
    _write_drop(f"{in_dir}/drop2.json", [
        {"doc_id": 10, "text": long_text, "lang": "en", "source": "b"},  # dup
        {"doc_id": 11, "text": "fresh words here", "lang": "de", "source": "b"},
    ])
    q = run_incremental_corpus_ingest(spark, in_dir, corpus, ledger, ckpt,
                                      chunks_dir=chunks)
    q.awaitTermination(60)
    got = spark.read.parquet(chunks)
    assert {r.doc_id for r in got.select("doc_id").distinct().collect()} == {1, 2, 11}
    # replaying batch 0 directly must rewrite, not duplicate, its chunks
    df = spark.createDataFrame(
        [(1, long_text, "en", "a"), (2, "short doc", "en", "a")],
        "doc_id long, text string, lang string, source string",
    )
    admit_batch(df, 0, corpus, ledger, chunks_dir=chunks)
    n_after = spark.read.parquet(chunks).filter("doc_id in (1, 2)").count()
    assert n_after == 4


# ---------------------------------------------------------------------------
# Two-tier ledger: bucketed base + hot tail (compact_ledger_base)
# ---------------------------------------------------------------------------


def _doc_rows(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "s") for i, t in rows],
        "doc_id long, text string, lang string, source string",
    )


def test_two_tier_ledger_dedups_across_base_and_tail(spark, tmp_path):
    from medallion_data_lake_spark.streaming.corpus import compact_ledger_base

    corpus = str(tmp_path / "corpus")
    ledger = str(tmp_path / "ledger")
    base = "ledger_base_t1"
    try:
        # batches 0-1 land pre-compaction
        admit_batch(_doc_rows(spark, [(1, "aa bb"), (2, "cc dd")]), 0,
                    corpus, ledger, ledger_base_table=base)
        admit_batch(_doc_rows(spark, [(3, "ee ff")]), 1,
                    corpus, ledger, ledger_base_table=base)
        compact_ledger_base(spark, ledger, base, n_buckets=4)
        # batch 2: rides the tail (post-watermark) — nothing there yet
        admit_batch(_doc_rows(spark, [(4, "gg hh")]), 2,
                    corpus, ledger, ledger_base_table=base)
        # batch 3 carries dups from the BASE era (batch 0), the TAIL era
        # (batch 2), and one new doc — both tiers must reject theirs
        admit_batch(
            _doc_rows(spark, [(10, "aa  BB"), (11, "GG hh"), (12, "new one")]),
            3, corpus, ledger, ledger_base_table=base,
        )
        got = {r.doc_id for r in spark.read.parquet(corpus).collect()}
        assert got == {1, 2, 3, 4, 12}
        # replay of batch 3 with the base in place: still idempotent
        admit_batch(
            _doc_rows(spark, [(10, "aa  BB"), (11, "GG hh"), (12, "new one")]),
            3, corpus, ledger, ledger_base_table=base,
        )
        assert {r.doc_id for r in spark.read.parquet(corpus).collect()} == got
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {base}")


def test_base_anti_join_never_shuffles_the_ledger(spark, tmp_path):
    """The property the bucketed base exists for: the history side of
    the admission anti-join is scanned in its bucket layout, ZERO
    Exchange above it — only the (small) batch side shuffles."""
    from medallion_data_lake_spark.plans import count_shuffles, explain_str
    from medallion_data_lake_spark.streaming.corpus import (
        compact_ledger_base,
        content_fingerprint,
    )

    corpus = str(tmp_path / "corpus")
    ledger = str(tmp_path / "ledger")
    base = "ledger_base_t2"
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold")
    try:
        admit_batch(
            _doc_rows(spark, [(i, f"text {i}") for i in range(50)]), 0,
            corpus, ledger,
        )
        compact_ledger_base(spark, ledger, base, n_buckets=4)
        # forbid broadcast so the join must take the bucketed SMJ path
        # (at corpus scale the base is never broadcastable anyway)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        batch = _doc_rows(spark, [(100, "text 7"), (101, "fresh")]).withColumn(
            "fingerprint", content_fingerprint()
        )
        anti = batch.join(
            spark.table(base).select("fingerprint"), "fingerprint", "left_anti"
        )
        plan = explain_str(anti)
        assert count_shuffles(anti) == 1, plan    # batch side only
        assert "SortMergeJoin" in plan and "LeftAnti" in plan
        assert {r.doc_id for r in anti.collect()} == {101}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", prev_aqe)
        spark.sql(f"DROP TABLE IF EXISTS {base}")


def test_runner_auto_compacts_completed_epochs_only(spark, tmp_path):
    from medallion_data_lake_spark.streaming.corpus import (
        _ledger_watermark,
        run_incremental_corpus_ingest,
    )

    in_dir, corpus, ledger, ckpt = _dirs(tmp_path)
    base = "ledger_base_t3"
    try:
        # one drop per RUN so each lands as its own micro-batch id
        for b in range(4):
            _write_drop(f"{in_dir}/d{b}.json", [
                {"doc_id": b * 10 + i, "text": f"doc {b} {i}",
                 "lang": "en", "source": "s"}
                for i in range(2)
            ])
            q = run_incremental_corpus_ingest(
                spark, in_dir, corpus, ledger, ckpt,
                ledger_base_table=base, compact_base_every=2,
            )
            q.awaitTermination(120)
        assert spark.catalog.tableExists(base)
        # the base only ever mirrors epochs whose checkpoint commit
        # PRECEDED the compaction — strictly below the last batch id
        wm = _ledger_watermark(spark, base)
        max_bid = (
            spark.read.parquet(ledger).agg(F.max("_batch_id")).first()[0]
        )
        assert wm < max_bid
        assert spark.read.parquet(corpus).count() == 8
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {base}")


def _doc(i, text):
    return {"doc_id": i, "text": text, "lang": "en", "source": "a"}


def test_cross_batch_segment_scrub(spark, tmp_path):
    """Streaming CCNet line dedup: a boilerplate line crossing the
    min_docs threshold ACROSS batches is scrubbed from the batch where
    it crosses and every batch after; earlier batches keep it
    (documented non-retroactivity). Unique lines always survive."""
    from medallion_data_lake_spark.streaming.corpus import (
        run_incremental_segment_scrub,
    )

    in_dir = str(tmp_path / "in")
    out = str(tmp_path / "clean")
    ledger = str(tmp_path / "segledger")
    ckpt = str(tmp_path / "ckpt")
    boiler = "subscribe to our newsletter"

    # drop 1: 3 docs with the boilerplate (below min_docs=5)
    _write_drop(f"{in_dir}/d1.json",
                [_doc(i, f"own line {i}\n{boiler}") for i in range(3)])
    q = run_incremental_segment_scrub(spark, in_dir, out, ledger, ckpt,
                                      min_docs=5)
    q.awaitTermination(60)
    got = {r["doc_id"]: r["text"] for r in spark.read.parquet(out).collect()}
    assert all(boiler in t for t in got.values())  # not frequent yet

    # drop 2: 3 more docs -> history(3) + batch(3) >= 5: scrubbed NOW
    _write_drop(f"{in_dir}/d2.json",
                [_doc(10 + i, f"own line {10 + i}\n{boiler}") for i in range(3)])
    q = run_incremental_segment_scrub(spark, in_dir, out, ledger, ckpt,
                                      min_docs=5)
    q.awaitTermination(60)
    got = {r["doc_id"]: r["text"] for r in spark.read.parquet(out).collect()}
    assert len(got) == 6
    for i in range(3):            # batch 1 keeps it (non-retroactive)
        assert boiler in got[i]
    for i in range(10, 13):       # batch 2 scrubbed, unique line kept
        assert got[i] == f"own line {i}"

    # drop 3: the ledger remembers — scrubbed immediately
    _write_drop(f"{in_dir}/d3.json", [_doc(20, f"fresh line\n{boiler}")])
    q = run_incremental_segment_scrub(spark, in_dir, out, ledger, ckpt,
                                      min_docs=5)
    q.awaitTermination(60)
    got = {r["doc_id"]: r["text"] for r in spark.read.parquet(out).collect()}
    assert got[20] == "fresh line"


def test_segment_scrub_replay_idempotent(spark, tmp_path):
    """A replayed batch (same batch id) must not double-count its own
    prior ledger partition — rerunning scrub_batch_segments for batch 0
    leaves counts and output identical."""
    from medallion_data_lake_spark.streaming.corpus import (
        scrub_batch_segments,
    )

    out = str(tmp_path / "clean")
    ledger = str(tmp_path / "segledger")
    docs = spark.createDataFrame(
        [(i, f"own {i}\nshared line", "en", "a") for i in range(3)],
        "doc_id long, text string, lang string, source string",
    )
    scrub_batch_segments(docs, 0, out, ledger, min_docs=3)
    first = {r["doc_id"]: r["text"] for r in spark.read.parquet(out).collect()}
    # min_docs=3 met WITHIN the batch: scrubbed already
    assert all(t == f"own {i}" for i, t in first.items())

    scrub_batch_segments(docs, 0, out, ledger, min_docs=3)  # replay
    again = {r["doc_id"]: r["text"] for r in spark.read.parquet(out).collect()}
    assert again == first
    ledger_counts = {
        r["_k"]: r["_nd"]
        for r in spark.read.parquet(ledger).groupBy("_k")
        .agg(F.sum("_nd").alias("_nd")).collect()
    }
    assert max(ledger_counts.values()) == 3  # not 6 — no double count


def test_segment_scrub_two_tier_base(spark, tmp_path):
    """Two-tier segment ledger: after compaction, history counts come
    from the bucketed base (batch keys broadcast, base scanned in
    place) + the post-watermark tail; results equal the flat form and
    a replayed batch still does not meet its own counts."""
    from medallion_data_lake_spark.streaming.corpus import (
        compact_segment_ledger_base,
        scrub_batch_segments,
    )

    out = str(tmp_path / "clean")
    ledger = str(tmp_path / "segledger")
    base = "seg_base_t5"
    boiler = "shared boilerplate line"

    def docs(ids):
        return spark.createDataFrame(
            [(i, f"own {i}\n{boiler}", "en", "a") for i in ids],
            "doc_id long, text string, lang string, source string",
        )

    try:
        scrub_batch_segments(docs(range(3)), 0, out, ledger, min_docs=5)
        compact_segment_ledger_base(spark, ledger, base)  # wm = 0
        # batch 1: base(3) + batch(3) >= 5 -> scrubbed via the base path
        scrub_batch_segments(docs(range(10, 13)), 1, out, ledger,
                             min_docs=5, seg_base_table=base)
        got = {r["doc_id"]: r["text"]
               for r in spark.read.parquet(out).collect()}
        for i in range(10, 13):
            assert got[i] == f"own {i}"
        for i in range(3):
            assert boiler in got[i]  # batch 0 predates the threshold

        # replay batch 1 with the base: counts must not double
        scrub_batch_segments(docs(range(10, 13)), 1, out, ledger,
                             min_docs=5, seg_base_table=base)
        again = {r["doc_id"]: r["text"]
                 for r in spark.read.parquet(out).collect()}
        assert again == got
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {base}")


def test_streaming_fuzzy_decon_screens_near_benchmark_docs(spark, tmp_path):
    """r7: each micro-batch is screened against the static benchmark's
    LSH bands — a near-copy of a benchmark doc is dropped, unrelated
    docs land; checkpoint-loss replay rewrites the batch's own
    partition without duplicating."""
    import shutil

    from medallion_data_lake_spark.streaming.corpus import (
        run_streaming_fuzzy_decon,
    )

    in_dir = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near = base.rsplit(" ", 1)[0] + " OMEGA"  # one word changed
    bench = spark.createDataFrame([(base,)], "text string")

    _write_drop(f"{in_dir}/drop1.json", [
        {"doc_id": 1, "text": near, "lang": "en", "source": "a"},
        {"doc_id": 2, "text": "completely different words nothing shared here",
         "lang": "en", "source": "a"},
    ])
    _write_drop(f"{in_dir}/drop2.json", [
        {"doc_id": 3, "text": base, "lang": "en", "source": "b"},  # verbatim
        {"doc_id": 4, "text": "more unrelated content entirely fresh",
         "lang": "en", "source": "b"},
    ])
    q = run_streaming_fuzzy_decon(spark, in_dir, bench, out, ckpt)
    q.awaitTermination(120)
    got = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert got == {2, 4}  # both benchmark-similar docs screened out

    # checkpoint loss → full replay: same result, no duplicates
    shutil.rmtree(ckpt)
    q = run_streaming_fuzzy_decon(spark, in_dir, bench, out, ckpt)
    q.awaitTermination(120)
    rows = spark.read.parquet(out).collect()
    assert {r.doc_id for r in rows} == {2, 4} and len(rows) == 2


def test_streaming_maintained_embedding_column(spark, tmp_path):
    """embeddings_table= on the ingester maintains the persisted
    embedding column per batch (r14 verdict #6): column complete for
    exactly the admitted docs after every drop, vectors equal to the
    batch embedder's, provenance sidecar enforced, and a stream-built
    corpus passes the curation coverage guard with no separate
    materialize step."""
    import pytest

    from medallion_data_lake_spark.operators.curation_pipeline import (
        CurationConfig,
        curate_corpus,
    )
    from medallion_data_lake_spark.operators.embeddings import (
        embed_documents,
        materialize_corpus_embeddings,
        read_embedder_sidecar,
    )
    from medallion_data_lake_spark.operators.versioned import read_table

    in_dir, corpus, ledger, ckpt = _dirs(tmp_path)
    emb_table = str(tmp_path / "emb")
    _write_drop(f"{in_dir}/drop1.json", [
        {"doc_id": 1, "text": "alpha beta gamma", "lang": "en", "source": "a"},
        {"doc_id": 2, "text": "delta epsilon", "lang": "en", "source": "a"},
        {"doc_id": 3, "text": "ALPHA  BETA GAMMA", "lang": "en", "source": "a"},
    ])
    q = run_incremental_corpus_ingest(
        spark, in_dir, corpus, ledger, ckpt, embeddings_table=emb_table)
    q.awaitTermination(60)
    col = read_table(spark, emb_table)
    assert {r.vec_id for r in col.collect()} == {1, 2}  # admitted only

    _write_drop(f"{in_dir}/drop2.json", [
        {"doc_id": 10, "text": "alpha beta gamma", "lang": "en", "source": "b"},
        {"doc_id": 11, "text": "zeta eta theta", "lang": "de", "source": "b"},
    ])
    q = run_incremental_corpus_ingest(
        spark, in_dir, corpus, ledger, ckpt, embeddings_table=emb_table)
    q.awaitTermination(60)
    col = read_table(spark, emb_table)
    assert {r.vec_id for r in col.collect()} == {1, 2, 11}

    # vectors are the embedder's, not placeholders
    doc11 = spark.read.parquet(corpus).filter(F.col("doc_id") == 11)
    want = embed_documents(doc11.select("doc_id", "text")).first()["embedding"]
    got = col.filter(F.col("vec_id") == 11).first()["embedding"]
    assert got == want

    # provenance: the sidecar exists and a mismatched dim refuses
    assert read_embedder_sidecar(emb_table)["dim"] == 64
    with pytest.raises(ValueError, match="mixed embedding spaces"):
        materialize_corpus_embeddings(
            spark, doc11.select("doc_id", "text"), emb_table, dim=16)

    # the stream-built corpus curates straight off the maintained column
    docs = spark.read.parquet(corpus).select("doc_id", "text", "lang",
                                             "source")
    out = curate_corpus(docs, config=CurationConfig(
        embeddings_table=emb_table))["curated"]
    assert out.count() == 3  # coverage guard passed; nothing semantic-dropped

"""Inverted index + BM25 (operators/inverted_index.py): build/search
parity against from-scratch BM25, incremental appends (atomic across the
four index tables), bloom/stats pruning on posting point-reads, stats
folding, and exactly-once streaming maintenance with crash/replay."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from medallion_data_lake_spark.operators import inverted_index as II
from medallion_data_lake_spark.operators.inverted_index import (
    append_bm25_index,
    bm25_candidates,
    bm25_search,
    compact_bm25_stats,
    corpus_stats,
    create_bm25_index,
    run_postings_append_stream,
    term_stats,
)
from medallion_data_lake_spark.operators.versioned import read_table

DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the dog barked at the cat"),
    (3, "quantum flux capacitor hums"),
    (4, "cat cat cat cat"),
    (5, "dog dog quantum"),
    (6, "mat on the floor by the door"),
    (7, "flux and more flux for the capacitor"),
    (8, "completely unrelated words here"),
]


def _docs(spark, rows=None):
    return spark.createDataFrame(rows or DOCS, "doc_id long, text string")


def _bm25_scratch(spark, docs, terms, k):
    """BM25 computed directly from the docs frame — the oracle for the
    persisted-index path (same shared expressions, no index)."""
    from medallion_data_lake_spark.operators.inverted_index import (
        BM25_B,
        BM25_K1,
        bm25_idf,
        bm25_term_score,
        build_doclens,
        build_postings,
    )

    dl = build_doclens(docs)
    row = dl.agg(F.count(F.lit(1)).alias("n"), F.sum("dl").alias("s")).first()
    n, avgdl = int(row["n"]), float(row["s"]) / int(row["n"])
    postings = build_postings(docs).filter(F.col("term").isin(*terms))
    df_tbl = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    return (
        postings.join(df_tbl, "term")
        .join(dl, "doc_id")
        .withColumn(
            "_s",
            bm25_term_score(
                F.col("tf"), F.col("dl"), F.lit(avgdl),
                bm25_idf(F.lit(n), F.col("df")), BM25_K1, BM25_B,
            ).cast("decimal(28,12)"),
        )
        .groupBy("doc_id")
        .agg(F.sum("_s").alias("_score"))
        .orderBy(F.desc("_score"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id", F.col("_score").cast("double").alias("score"))
    )


def test_search_matches_from_scratch_bm25(spark, tmp_path):
    root = str(tmp_path / "idx")
    create_bm25_index(spark, _docs(spark), root, n_files=4)
    terms = ["cat", "quantum", "flux"]
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_search(spark, root, terms, k=8).collect()
    }
    want = {
        r["doc_id"]: r["score"]
        for r in _bm25_scratch(spark, _docs(spark), terms, 8).collect()
    }
    assert got == want  # exact: same shared expressions, decimal sums


def test_incremental_append_equals_full_build(spark, tmp_path):
    full = str(tmp_path / "full")
    inc = str(tmp_path / "inc")
    create_bm25_index(spark, _docs(spark), full, n_files=2)
    create_bm25_index(spark, _docs(spark, DOCS[:4]), inc, n_files=2)
    append_bm25_index(spark, _docs(spark, DOCS[4:]), inc, n_files=2)

    assert corpus_stats(spark, full) == corpus_stats(spark, inc)
    ts = lambda r: {  # noqa: E731
        x["term"]: (x["df"], x["cf"], x["idf"])
        for x in term_stats(spark, r).collect()
    }
    assert ts(full) == ts(inc)
    for terms in (["cat"], ["quantum", "mat"], ["flux", "dog", "cat"]):
        a = [tuple(r) for r in bm25_search(spark, full, terms, k=8).collect()]
        b = [tuple(r) for r in bm25_search(spark, inc, terms, k=8).collect()]
        assert a == b, terms


def test_posting_reads_prune_files(spark, tmp_path):
    root = str(tmp_path / "idx")
    create_bm25_index(spark, _docs(spark), root, n_files=4)
    append_bm25_index(spark, _docs(spark, [(10, "zebra yak"), (11, "zebra")]),
                      root, n_files=4)
    _, report = bm25_candidates(spark, root, ["zebra"])
    # the sorted+bloomed layout must skip most files for a point term
    assert report["files_skipped"] > report["files_read"] > 0


def test_create_refuses_existing_index(spark, tmp_path):
    root = str(tmp_path / "idx")
    create_bm25_index(spark, _docs(spark), root, n_files=2)
    with pytest.raises(ValueError, match="already exists"):
        create_bm25_index(spark, _docs(spark), root)


def test_append_is_atomic_across_tables(spark, tmp_path, monkeypatch):
    """A crash between table legs must never publish postings whose
    corpus stats are missing: recovery rolls the txn forward."""
    from medallion_data_lake_spark.operators import txn as T
    from medallion_data_lake_spark.operators.txn import recover_txns

    root = str(tmp_path / "idx")
    create_bm25_index(spark, _docs(spark, DOCS[:4]), root, n_files=2)
    before = corpus_stats(spark, root)

    real = T.publish_staged
    calls = {"n": 0}

    def crash_after_first(spark_, table, sid):
        if calls["n"] >= 1:
            raise RuntimeError("crash between legs")
        calls["n"] += 1
        return real(spark_, table, sid)

    monkeypatch.setattr(T, "publish_staged", crash_after_first)
    with pytest.raises(RuntimeError, match="crash between legs"):
        append_bm25_index(spark, _docs(spark, DOCS[4:]), root, n_files=2)
    monkeypatch.undo()

    # prepared txn: repair forward, then the index is fully consistent
    acted = recover_txns(spark, os.path.join(root, "_txn"))
    assert [m["status"] for m in acted] == ["committed"]
    n, avgdl = corpus_stats(spark, root)
    assert n == len(DOCS) and n > before[0]
    got = [tuple(r) for r in bm25_search(spark, root, ["quantum"], k=8).collect()]
    want = [
        tuple(r)
        for r in _bm25_scratch(spark, _docs(spark), ["quantum"], 8).collect()
    ]
    assert [(d, s) for d, _, s in got] == want


def test_append_replay_is_exactly_once(spark, tmp_path):
    root = str(tmp_path / "idx")
    m1 = append_bm25_index(
        spark, _docs(spark), root, n_files=2, txn_app_id="app", txn_version=0
    )
    assert m1["status"] == "committed"
    stats1 = corpus_stats(spark, root)
    m2 = append_bm25_index(  # replayed batch: nothing stages, nothing lands
        spark, _docs(spark), root, n_files=2, txn_app_id="app", txn_version=0
    )
    assert m2["status"] == "duplicate_skip"
    assert corpus_stats(spark, root) == stats1


def test_compact_stats_is_invisible_to_readers(spark, tmp_path):
    root = str(tmp_path / "idx")
    create_bm25_index(spark, _docs(spark, DOCS[:4]), root, n_files=2)
    append_bm25_index(spark, _docs(spark, DOCS[4:6]), root, n_files=2)
    append_bm25_index(spark, _docs(spark, DOCS[6:]), root, n_files=2)
    terms = ["cat", "flux"]
    pre = [tuple(r) for r in bm25_search(spark, root, terms, k=8).collect()]
    pre_stats = corpus_stats(spark, root)
    n_delta_rows = read_table(spark, os.path.join(root, "corpus_stats")).count()
    assert n_delta_rows == 3  # one delta row per batch

    out = compact_bm25_stats(spark, root)
    assert out["corpus_rows"] == 1
    assert read_table(spark, os.path.join(root, "corpus_stats")).count() == 1
    assert corpus_stats(spark, root) == pre_stats
    assert [tuple(r) for r in bm25_search(spark, root, terms, k=8).collect()] == pre


def _write_jsonl(inp, name, rows):
    with open(os.path.join(inp, name), "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows))


def test_streaming_maintenance_exactly_once(spark, tmp_path):
    """The posting-list stream (verdict #7): batches land atomically via
    the txn watermark; a checkpoint-loss replay of the SAME input set
    re-applies nothing — no duplicate postings, stats unchanged."""
    inp = str(tmp_path / "in")
    os.makedirs(inp)
    root = str(tmp_path / "idx")
    ck = str(tmp_path / "ck")
    schema = "doc_id long, text string"

    def run():
        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", "1"
        ).json(inp)
        run_postings_append_stream(spark, stream, root, ck, n_files=2)

    _write_jsonl(inp, "b0.json", [
        {"doc_id": d, "text": t} for d, t in DOCS[:4]])
    run()
    assert corpus_stats(spark, root)[0] == 4

    _write_jsonl(inp, "b1.json", [
        {"doc_id": d, "text": t} for d, t in DOCS[4:]])
    run()
    assert corpus_stats(spark, root)[0] == len(DOCS)

    # the stream-built index answers exactly like a batch-built one
    batch_root = str(tmp_path / "batch_idx")
    create_bm25_index(spark, _docs(spark), batch_root, n_files=2)
    for terms in (["cat", "quantum"], ["flux"]):
        a = [tuple(r) for r in bm25_search(spark, root, terms, k=8).collect()]
        b = [tuple(r) for r in bm25_search(spark, batch_root, terms, k=8).collect()]
        assert a == b

    # checkpoint loss: same input replays under batch ids 0..1 — the
    # (app, batch) watermark skips every leg; postings stay exact
    import shutil

    shutil.rmtree(ck)
    pre_postings = read_table(spark, os.path.join(root, "postings")).count()
    run()
    assert read_table(spark, os.path.join(root, "postings")).count() == pre_postings
    assert corpus_stats(spark, root)[0] == len(DOCS)


def test_stats_fold_survives_racing_append(spark, tmp_path):
    """r10 review finding: a logical overwrite computed 'removed' from
    the fresh tip while its data came from the pre-race snapshot,
    silently dropping a concurrent append's delta rows. The
    file-granular fold (optimize_table + transform) removes exactly the
    files it read — the racing append's files stay live. Emulated by
    landing the racing append from INSIDE the fold's transform window
    (after the snapshot, before the claim)."""
    from medallion_data_lake_spark.operators.versioned import (
        commit,
        optimize_table,
    )

    root = str(tmp_path / "idx")
    create_bm25_index(spark, _docs(spark, DOCS[:4]), root, n_files=2)
    append_bm25_index(spark, _docs(spark, DOCS[4:6]), root, n_files=2)
    cs_path = os.path.join(root, "corpus_stats")

    racing = {"landed": False}

    def fold_with_race(df):
        if not racing["landed"]:
            racing["landed"] = True
            commit(  # the racing append: 100 docs, 1000 tokens
                spark.createDataFrame([(100, 1000)], "n_docs long, sum_dl long"),
                cs_path, mode="append",
            )
        return df.agg(
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.sum("sum_dl").cast("long").alias("sum_dl"),
        )

    optimize_table(spark, cs_path, transform=fold_with_race)
    n, _ = corpus_stats(spark, root)
    assert n == 6 + 100, "the racing append's delta row must survive the fold"


def test_search_pins_a_transaction_consistent_snapshot(spark, tmp_path):
    """r10 review finding: independently-pinned table reads could mix a
    half-landed append into a ranking. bm25_search now reads every
    table at the newest COMMITTED txn's recorded versions, so postings
    published outside a completed txn (mid-roll-forward state) are
    invisible until their txn commits."""
    from medallion_data_lake_spark.operators.inverted_index import (
        committed_index_snapshot,
    )
    from medallion_data_lake_spark.operators.versioned import commit

    root = str(tmp_path / "idx")
    create_bm25_index(spark, _docs(spark), root, n_files=2)
    pre = [tuple(r) for r in bm25_search(spark, root, ["cat"], k=8).collect()]
    pins = committed_index_snapshot(root)
    assert set(pins) == {"postings", "doclens", "termstats", "corpus_stats"}

    # a half-landed append: postings rows visible at the table tip but
    # no committed txn covering them (no doclens/stats legs yet)
    commit(
        spark.createDataFrame([("cat", 99, 50)], "term string, doc_id long, tf long"),
        os.path.join(root, "postings"), mode="append",
    )
    post = [tuple(r) for r in bm25_search(spark, root, ["cat"], k=8).collect()]
    assert post == pre, "uncommitted-txn postings must not affect ranking"
    assert committed_index_snapshot(root) == pins


def test_cli_build_watermark_round_trip(spark, tmp_path, capsys):
    """The CLI exposes the exactly-once watermark: a re-run of the same
    (app, version) build is a duplicate-skip, not a double-count."""
    from medallion_data_lake_spark import cli

    root = str(tmp_path / "idx")
    args = ["bm25-build", root, "--sf", "/root/testdata/sf0.001",
            "--txn-app", "cli-app", "--txn-version", "0"]
    assert cli.main(args) == 0
    first = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(first)["status"] == "committed"
    assert cli.main(args) == 0
    second = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(second)["status"] == "duplicate_skip"
    assert corpus_stats(spark, root)[0] == 500  # sf0.001 documents, once


def test_snapshot_survives_txn_expiry_and_torn_manifests(spark, tmp_path):
    """r10 review findings: the consistent-cut pins must survive a
    retention sweep (expire_txns keeps the newest committed manifest)
    and skip torn manifest files instead of erroring."""
    from medallion_data_lake_spark.operators.inverted_index import (
        committed_index_snapshot,
    )
    from medallion_data_lake_spark.operators.txn import expire_txns

    root = str(tmp_path / "idx")
    create_bm25_index(spark, _docs(spark, DOCS[:4]), root, n_files=2)
    append_bm25_index(spark, _docs(spark, DOCS[4:]), root, n_files=2)
    pins = committed_index_snapshot(root)
    pre = [tuple(r) for r in bm25_search(spark, root, ["cat"], k=8).collect()]

    # aggressive sweep: everything past-horizon, newest committed kept
    txn_root = os.path.join(root, "_txn")
    assert len(expire_txns(txn_root, older_than_sec=0.0)) == 1
    assert committed_index_snapshot(root) == pins

    # a torn manifest (newest by name) is skipped, not fatal
    with open(os.path.join(txn_root, "txn-ffffffffffffffff-dead.json"), "w") as f:
        f.write("{this is not json")
    assert committed_index_snapshot(root) == pins
    assert [tuple(r) for r in bm25_search(spark, root, ["cat"], k=8).collect()] == pre


def test_cli_search_strips_term_whitespace(spark, tmp_path, capsys):
    """r10 review finding: '--terms \"cat, dog\"' silently contributed
    nothing for ' dog' — terms are stripped now."""
    from medallion_data_lake_spark import cli

    root = str(tmp_path / "idx")
    create_bm25_index(spark, _docs(spark), root, n_files=2)
    assert cli.main(["bm25-search", root, "--terms", "dog, quantum",
                     "--limit", "8", "--sf", "/root/testdata/sf0.001"]) == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()
            if l.startswith("{")]
    assert any(r["doc_id"] == 5 and r["n_terms_matched"] == 2 for r in rows), rows


def test_index_stats_reports_fold_pressure(spark, tmp_path):
    from medallion_data_lake_spark.operators.inverted_index import (
        bm25_index_stats,
    )

    root = str(tmp_path / "idx")
    create_bm25_index(spark, _docs(spark, DOCS[:2]), root, n_files=2)
    for lo in range(2, 8):  # six more single-doc batches -> delta tail
        append_bm25_index(spark, _docs(spark, DOCS[lo:lo + 1]), root, n_files=1)
    st = bm25_index_stats(spark, root)
    assert st["n_docs"] == 8 and st["delta_batches"] == 7
    assert st["termstats_delta_rows"] > st["vocabulary"]
    assert set(st["pinned_snapshot"]) == {
        "postings", "doclens", "termstats", "corpus_stats"}
    assert st["fold_recommended"] is True

    compact_bm25_stats(spark, root)
    st2 = bm25_index_stats(spark, root)
    assert st2["termstats_delta_rows"] == st2["vocabulary"]
    assert st2["delta_batches"] == 1
    assert st2["fold_recommended"] is False
    assert st2["n_docs"] == 8


def test_snapshot_never_straddles_a_pending_txn(spark, tmp_path, monkeypatch):
    """r10 ADVICE (medium): between the crash and the recover_txns
    sweep, the subset re-run manifest is the NEWEST committed one — a
    merge that takes termstats/corpus from it but postings/doclens from
    the older full manifest pins new stats against stale postings (the
    exact state the snapshot docstring guarantees against). Before
    recovery runs, the pins must fall back to the last cut that does
    not straddle the pending prepared manifest: batch-1 for ALL four
    tables."""
    from medallion_data_lake_spark.operators import txn as T
    from medallion_data_lake_spark.operators.inverted_index import (
        committed_index_snapshot,
    )

    root = str(tmp_path / "idx")
    m0 = create_bm25_index(spark, _docs(spark, DOCS[:4]), root, n_files=2)
    batch1 = {
        os.path.basename(leg["table"]): leg["version"] for leg in m0["legs"]
    }

    real = T.publish_staged
    calls = {"n": 0}

    def crash_after_two(spark_, table, sid):
        if calls["n"] >= 2:
            raise RuntimeError("crash")
        calls["n"] += 1
        return real(spark_, table, sid)

    monkeypatch.setattr(T, "publish_staged", crash_after_two)
    with pytest.raises(RuntimeError, match="crash"):
        append_bm25_index(spark, _docs(spark, DOCS[4:]), root, n_files=2,
                          txn_app_id="app", txn_version=1)
    monkeypatch.undo()
    # simulate a RACING writer whose pre-append repair check ran before
    # the crashed txn prepared its manifest (a serial writer's append
    # now rolls the torn txn forward first — _repair_live_txns)
    monkeypatch.setattr(II, "_repair_live_txns", lambda *a, **k: None)
    m2 = append_bm25_index(spark, _docs(spark, DOCS[4:]), root, n_files=2,
                           txn_app_id="app", txn_version=1)
    monkeypatch.undo()
    assert m2["status"] == "committed" and 0 < len(m2["legs"]) < 4

    # NO recover_txns yet: the crashed manifest is still 'prepared'
    pins = committed_index_snapshot(root)
    assert pins == batch1, (
        f"pins straddle the pending prepared txn: {pins} != {batch1}"
    )
    # and the pinned search answers exactly like batch-1-only BM25
    got = [(d, s) for d, _, s in
           bm25_search(spark, root, ["cat"], k=8).collect()]
    want = [tuple(r) for r in
            _bm25_scratch(spark, _docs(spark, DOCS[:4]), ["cat"], 8).collect()]
    assert got == want


def test_snapshot_merges_pins_across_split_manifests(spark, tmp_path, monkeypatch):
    """r10 review pass 4: a crashed append whose re-run covered a
    subset of tables splits the four legs over TWO committed manifests;
    the pins must merge newest-first per table instead of requiring a
    single 4-leg manifest (which retention may not even keep)."""
    from medallion_data_lake_spark.operators import txn as T
    from medallion_data_lake_spark.operators.inverted_index import (
        committed_index_snapshot,
    )
    from medallion_data_lake_spark.operators.txn import recover_txns

    root = str(tmp_path / "idx")
    create_bm25_index(spark, _docs(spark, DOCS[:4]), root, n_files=2)

    # append batch 1: crash after two legs publish
    real = T.publish_staged
    calls = {"n": 0}

    def crash_after_two(spark_, table, sid):
        if calls["n"] >= 2:
            raise RuntimeError("crash")
        calls["n"] += 1
        return real(spark_, table, sid)

    monkeypatch.setattr(T, "publish_staged", crash_after_two)
    with pytest.raises(RuntimeError, match="crash"):
        append_bm25_index(spark, _docs(spark, DOCS[4:]), root, n_files=2,
                          txn_app_id="app", txn_version=1)
    monkeypatch.undo()

    # the re-run stages only the uncovered tables -> a PARTIAL manifest
    # (racing-writer simulation: skip the serial writer's pre-append
    # repair so the split-manifest history actually forms)
    monkeypatch.setattr(II, "_repair_live_txns", lambda *a, **k: None)
    m2 = append_bm25_index(spark, _docs(spark, DOCS[4:]), root, n_files=2,
                           txn_app_id="app", txn_version=1)
    monkeypatch.undo()
    assert m2["status"] == "committed" and 0 < len(m2["legs"]) < 4
    # recovery completes the original manifest (duplicate-skips)
    acted = recover_txns(spark, os.path.join(root, "_txn"))
    assert [x["status"] for x in acted] == ["committed"]

    pins = committed_index_snapshot(root)
    assert pins is not None and set(pins) == {
        "postings", "doclens", "termstats", "corpus_stats"}
    # and the pinned search answers exactly like the from-scratch form
    got = [tuple(r) for r in bm25_search(spark, root, ["quantum"], k=8).collect()]
    want = [tuple(r)
            for r in _bm25_scratch(spark, _docs(spark), ["quantum"], 8).collect()]
    assert [(d, s) for d, _, s in got] == want


def test_stats_fold_writes_one_file_not_fragments(spark, tmp_path):
    """r10 review pass 4: sizing from INPUT bytes would fragment a
    row-folding rewrite into near-empty files; the fold of many delta
    files must come out as one."""
    root = str(tmp_path / "idx")
    create_bm25_index(spark, _docs(spark, DOCS[:2]), root, n_files=2)
    for lo in range(2, 8):
        append_bm25_index(spark, _docs(spark, DOCS[lo:lo + 1]), root, n_files=1)
    out = compact_bm25_stats(spark, root)
    assert out["termstats_files"] == 1
    assert out["corpus_files"] == 1


def test_fold_transform_must_preserve_schema(spark, tmp_path):
    from medallion_data_lake_spark.operators.versioned import (
        commit,
        optimize_table,
    )

    t = str(tmp_path / "t")
    commit(spark.createDataFrame([(1, 2)], "a long, b long"), t)
    with pytest.raises(ValueError, match="preserve the rewritten"):
        optimize_table(spark, t, transform=lambda df: df.select("a"))


def test_search_plan_construction_jobs_flat_in_terms(spark, tmp_path):
    """r10 verdict #3: r10 paid one bloom-probe job PER TERM plus a
    driver-side corpus .first() to even construct the search plan;
    the batched form pays a constant number of jobs (one probe) no
    matter how many query terms, and defers everything else to the
    caller's first action."""
    root = str(tmp_path / "idx")
    create_bm25_index(spark, _docs(spark), root, n_files=4)
    sc = spark.sparkContext

    def jobs_to_build(terms):
        group = f"probe-{len(terms)}"
        sc.setJobGroup(group, "plan construction only")
        try:
            bm25_search(spark, root, terms, k=5)  # NOT collected
        finally:
            sc.setJobGroup(None, None)
        return len(sc.statusTracker().getJobIdsForGroup(group))

    one = jobs_to_build(["cat"])
    three = jobs_to_build(["cat", "dog", "flux"])
    assert three == one, (one, three)
    # residual constant: one parquet footer/schema job per index table
    # (4) + ONE bloom-probe job; r10 paid 2 + K*2 and a corpus scan
    assert one <= 5, f"plan construction ran {one} jobs; expected <=5"


def test_batched_candidates_match_per_term_union(spark, tmp_path):
    """The ONE isin read returns exactly the union of the r10 per-term
    point reads (same rows, still pruned)."""
    from medallion_data_lake_spark.operators.versioned import (
        read_table_pruned,
    )

    root = str(tmp_path / "idx")
    create_bm25_index(spark, _docs(spark), root, n_files=4)
    terms = ["cat", "quantum", "mat"]
    got, report = bm25_candidates(spark, root, terms)
    want = sorted(
        tuple(r)
        for t in terms
        for r in read_table_pruned(
            spark, os.path.join(root, "postings"), eq={"term": t}
        )[0].collect()
    )
    assert sorted(tuple(r) for r in got.collect()) == want
    assert report["files_skipped"] > 0


def test_append_repairs_torn_txn_before_staging(spark, tmp_path, monkeypatch):
    """r11 review (second pass): an append landing past a torn txn lets
    a LATER recovery publish the old batch's legs after this one's —
    manifest order and version order then disagree and the snapshot
    pins can mix batch sets. The serial writer's append must roll the
    torn txn forward FIRST, so publishes stay in manifest order."""
    from medallion_data_lake_spark.operators import txn as T
    from medallion_data_lake_spark.operators.inverted_index import (
        committed_index_snapshot,
    )
    from medallion_data_lake_spark.operators.txn import list_txns

    root = str(tmp_path / "idx")
    real = T.publish_staged
    calls = {"n": 0}

    def crash_after_two(spark_, table, sid):
        if calls["n"] >= 2:
            raise RuntimeError("crash")
        calls["n"] += 1
        return real(spark_, table, sid)

    monkeypatch.setattr(T, "publish_staged", crash_after_two)
    with pytest.raises(RuntimeError, match="crash"):
        create_bm25_index(spark, _docs(spark, DOCS[:4]), root, n_files=2)
    monkeypatch.undo()
    troot = os.path.join(root, "_txn")
    assert [m["status"] for m in list_txns(troot)] == ["prepared"]

    # the next append repairs first: NO prepared manifest remains, both
    # batches are fully published IN ORDER, and the snapshot pins the
    # complete two-batch state
    append_bm25_index(spark, _docs(spark, DOCS[4:]), root, n_files=2)
    assert all(m["status"] == "committed" for m in list_txns(troot))
    assert corpus_stats(spark, root)[0] == len(DOCS)
    pins = committed_index_snapshot(root)
    assert set(pins) == {"postings", "doclens", "termstats", "corpus_stats"}
    got = [(d, s) for d, _, s in
           bm25_search(spark, root, ["cat"], k=8).collect()]
    want = [tuple(r) for r in
            _bm25_scratch(spark, _docs(spark), ["cat"], 8).collect()]
    assert got == want


def test_append_refuses_stuck_txn_instead_of_retrying(spark, tmp_path):
    """r11 review (third pass): the pre-append repair must NOT
    auto-retry a STUCK txn — that would race a concurrently running
    compensate_stuck_txn (the concurrency recover_txns' docstring
    forbids). A stuck manifest refuses the append with the operator
    remedies named."""
    from medallion_data_lake_spark.operators.txn import _write_manifest

    root = str(tmp_path / "idx")
    create_bm25_index(spark, _docs(spark, DOCS[:4]), root, n_files=2)
    troot = os.path.join(root, "_txn")
    _write_manifest(troot, {
        "txn_id": "txn-00000000000000000001-stuck", "status": "stuck",
        "created": 1.0,
        "legs": [{"table": os.path.abspath(os.path.join(root, "postings")),
                  "staging_id": "sX",
                  "error": "CommitConflict: parked"}],
    })
    with pytest.raises(RuntimeError, match="unresolved transaction"):
        append_bm25_index(spark, _docs(spark, DOCS[4:]), root, n_files=2)


def test_live_txn_listing_skips_torn_manifests(spark, tmp_path):
    """r11 review (third pass): a torn manifest file must not blank the
    liveness listing (that would silently disable the repair past a
    genuinely live txn) nor crash it."""
    from medallion_data_lake_spark.operators.inverted_index import (
        _live_txns,
    )
    from medallion_data_lake_spark.operators.txn import _write_manifest

    root = str(tmp_path / "idx")
    create_bm25_index(spark, _docs(spark, DOCS[:4]), root, n_files=2)
    troot = os.path.join(root, "_txn")
    _write_manifest(troot, {
        "txn_id": "txn-00000000000000000001-live", "status": "prepared",
        "created": 1.0, "legs": [],
    })
    with open(os.path.join(troot, "txn-fffffffffffffff-torn.json"), "w") as f:
        f.write("{not json")
    live = _live_txns(root)
    assert [m["txn_id"] for m in live] == ["txn-00000000000000000001-live"]


def test_stream_start_repairs_torn_batch_txn(spark, tmp_path, monkeypatch):
    """r11 review (third pass): the streaming exemption only covers
    WATERMARKED torn txns; a torn unwatermarked batch create must be
    rolled forward at stream start, not appended past."""
    from medallion_data_lake_spark.operators import txn as T
    from medallion_data_lake_spark.operators.txn import list_txns

    root = str(tmp_path / "idx")
    real = T.publish_staged
    calls = {"n": 0}

    def crash_after_two(spark_, table, sid):
        if calls["n"] >= 2:
            raise RuntimeError("crash")
        calls["n"] += 1
        return real(spark_, table, sid)

    monkeypatch.setattr(T, "publish_staged", crash_after_two)
    with pytest.raises(RuntimeError, match="crash"):
        create_bm25_index(spark, _docs(spark, DOCS[:4]), root, n_files=2)
    monkeypatch.undo()

    inp = str(tmp_path / "in")
    os.makedirs(inp)
    _write_jsonl(inp, "b1.jsonl",
                 [{"doc_id": i, "text": t} for i, t in DOCS[4:]])
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1").json(inp)
    )
    q = run_postings_append_stream(
        spark, stream, root, str(tmp_path / "ck"),
    )
    q.awaitTermination(300)

    troot = os.path.join(root, "_txn")
    assert all(m["status"] == "committed" for m in list_txns(troot))
    assert corpus_stats(spark, root)[0] == len(DOCS)
    got = [(d, s) for d, _, s in
           bm25_search(spark, root, ["cat"], k=8).collect()]
    want = [tuple(r) for r in
            _bm25_scratch(spark, _docs(spark), ["cat"], 8).collect()]
    assert got == want


def test_filtered_search_restricts_before_topk(spark, tmp_path):
    """bm25_search(allowed=...) — "search within this collection": the
    filter lands before the top-k, so the result is the top-k of the
    ALLOWED docs' scores (per-doc BM25 is independent of other
    candidates, so it must equal post-filtering an unbounded search);
    scoring stats stay corpus-level."""
    root = str(tmp_path / "idx")
    create_bm25_index(spark, _docs(spark), root, n_files=2)
    terms = ["cat", "quantum"]

    unfiltered = bm25_search(spark, root, terms, k=len(DOCS)).collect()
    allowed_ids = {1, 2, 5, 8}
    want = [
        (r["doc_id"], r["n_terms_matched"], r["score"])
        for r in sorted(unfiltered, key=lambda r: (-r["score"], r["doc_id"]))
        if r["doc_id"] in allowed_ids
    ][:3]

    allowed = spark.createDataFrame(
        [(i,) for i in sorted(allowed_ids)], "doc_id long")
    got = [
        (r["doc_id"], r["n_terms_matched"], r["score"])
        for r in bm25_search(spark, root, terms, k=3,
                             allowed=allowed).collect()
    ]
    assert got == want
    assert {d for d, _, _ in got} <= allowed_ids
    # the unfiltered top-1 (doc 4, pure cat spam) is disallowed -> the
    # filtered result must differ from a naive truncation
    assert unfiltered[0]["doc_id"] not in allowed_ids

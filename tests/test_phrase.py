"""Phrase retrieval via bigram postings (operators/inverted_index.py):
the indexed path must return the scan path's exact doc set, with bloom
pruning reported; the bigram table rides the same txn/snapshot/stream
machinery as the other index legs."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from medallion_data_lake_spark.operators.inverted_index import (
    append_bm25_index,
    bigram_tokens,
    bm25_search,
    committed_index_snapshot,
    create_bm25_index,
    index_has_bigrams,
    phrase_bigrams,
    phrase_candidates,
    phrase_search,
)

DOCS = [
    (1, "the cat sat on the mat"),
    (2, "cat sat by the dog"),
    (3, "the cat sat on the cat sat on it"),
    (4, "sat the cat"),
    (5, "on cat sat zebra on"),  # has 'cat sat' and 'sat on'? no: sat->zebra
    (6, "x"),
    (7, "cat sat somewhere then sat on it"),  # both bigrams, NOT the phrase
]


def _docs(spark, rows=None):
    return spark.createDataFrame(rows or DOCS, "doc_id long, text string")


@pytest.fixture
def idx(spark, tmp_path):
    root = str(tmp_path / "idx")
    create_bm25_index(spark, _docs(spark, DOCS[:4]), root, n_files=2,
                      bigrams=True)
    append_bm25_index(spark, _docs(spark, DOCS[4:]), root, n_files=2)
    return root


def _scan_phrase(spark, docs, phrase):
    """Ground truth computed in PLAIN PYTHON (independent of every
    Spark expression the implementation uses): overlapping position
    count of the contiguous token run."""
    m = len(phrase)
    out = []
    for r in docs.select("doc_id", "text").collect():
        t = r["text"].split()
        n = sum(
            1 for i in range(len(t) - m + 1) if t[i:i + m] == list(phrase)
        )
        if n:
            out.append((r["doc_id"], n))
    return sorted(out)


def test_indexed_phrase_equals_scan_path(spark, idx):
    docs = _docs(spark)
    for phrase in (["cat", "sat"], ["cat", "sat", "on"],
                   ["the", "cat", "sat", "on"], ["no", "such", "run"]):
        got, report = phrase_search(spark, idx, docs, phrase)
        assert sorted(tuple(r) for r in got.collect()) == \
            _scan_phrase(spark, docs, phrase), phrase
        assert report["files_total"] > 0


def test_candidates_necessary_not_sufficient(spark, idx):
    """Doc 7 carries both bigrams of 'cat sat on' without the
    contiguous run: it must appear in the candidates and be removed by
    the exact residual — the two-stage semantics the gated
    phrase_match_docs query mirrors."""
    cand, _ = phrase_candidates(spark, idx, ["cat", "sat", "on"])
    cand_ids = {r["doc_id"] for r in cand.collect()}
    assert 7 in cand_ids
    got, _ = phrase_search(spark, idx, _docs(spark), ["cat", "sat", "on"])
    assert 7 not in {r["doc_id"] for r in got.collect()}
    # multiple occurrences counted: doc 3 has the run twice
    assert dict(
        (r["doc_id"], r["n_matches"]) for r in got.collect()
    )[3] == 2


def test_phrase_reads_prune_files(spark, tmp_path):
    """The sorted+bloomed bigram layout must skip files for a rare
    phrase, exactly like term postings do."""
    rows = [(i, f"filler{i} word{i % 7} pad{i}") for i in range(40)]
    rows.append((99, "needle alpha beta"))
    root = str(tmp_path / "idx")
    create_bm25_index(spark, _docs(spark, rows), root, n_files=6,
                      bigrams=True)
    _, report = phrase_candidates(spark, root, ["needle", "alpha", "beta"])
    assert report["files_skipped"] > report["files_read"] > 0, report


def test_bigram_leg_is_transactional(spark, tmp_path, monkeypatch):
    """All five tables land through one manifest; the snapshot pins the
    bigram leg with the same consistent cut."""
    root = str(tmp_path / "idx")
    m = create_bm25_index(spark, _docs(spark, DOCS[:4]), root, n_files=2,
                          bigrams=True)
    assert len(m["legs"]) == 5
    pins = committed_index_snapshot(root)
    assert set(pins) == {"postings", "doclens", "termstats",
                         "corpus_stats", "bigrams"}


def test_bigrams_all_or_nothing(spark, tmp_path):
    root = str(tmp_path / "plain")
    create_bm25_index(spark, _docs(spark, DOCS[:4]), root, n_files=2)
    assert not index_has_bigrams(root)
    with pytest.raises(ValueError, match="without bigrams"):
        append_bm25_index(spark, _docs(spark, DOCS[4:]), root, bigrams=True)
    with pytest.raises(ValueError, match="no bigram table"):
        phrase_candidates(spark, root, ["cat", "sat"])
    # and a bigramless append on a bigram index refuses too
    root2 = str(tmp_path / "bg")
    create_bm25_index(spark, _docs(spark, DOCS[:4]), root2, n_files=2,
                      bigrams=True)
    with pytest.raises(ValueError, match="with bigrams"):
        append_bm25_index(spark, _docs(spark, DOCS[4:]), root2,
                          bigrams=False)


def test_phrase_validation(spark, idx):
    with pytest.raises(ValueError, match="two tokens"):
        phrase_candidates(spark, idx, ["solo"])
    assert phrase_bigrams(["a", "b", "c"]) == ["a b", "b c"]


def test_bigram_tokens_edge_cases(spark):
    rows = [(1, "only"), (2, ""), (3, "  two  tokens  "), (4, "a b c")]
    from medallion_data_lake_spark.operators.inverted_index import (
        clean_tokens,
    )

    out = {
        r["doc_id"]: r["bg"]
        for r in _docs(spark, rows)
        .select("doc_id", clean_tokens(F.col("text")).alias("_toks"))
        .select("doc_id", bigram_tokens(F.col("_toks")).alias("bg"))
        .collect()
    }
    assert out[1] == [] and out[2] == []
    assert out[3] == ["two tokens"]
    assert out[4] == ["a b", "b c"]


def test_streaming_append_maintains_bigrams(spark, tmp_path):
    """The streaming maintenance path lands the fifth leg in the same
    per-batch txn; phrase search over the streamed index equals the
    scan path."""
    import json

    from medallion_data_lake_spark.operators.inverted_index import (
        run_postings_append_stream,
    )

    root = str(tmp_path / "idx")
    create_bm25_index(spark, _docs(spark, DOCS[:2]), root, n_files=2,
                      bigrams=True)

    inp = str(tmp_path / "in")
    os.makedirs(inp)
    with open(os.path.join(inp, "b1.jsonl"), "w") as f:
        f.write("\n".join(
            json.dumps({"doc_id": i, "text": t}) for i, t in DOCS[2:]
        ))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1").json(inp)
    )
    q = run_postings_append_stream(
        spark, stream, root, str(tmp_path / "ck"),
    )
    q.awaitTermination(300)

    docs = _docs(spark)
    got, _ = phrase_search(spark, root, docs, ["cat", "sat", "on"])
    assert sorted(tuple(r) for r in got.collect()) == \
        _scan_phrase(spark, docs, ["cat", "sat", "on"])
    # and keyword search still serves the full corpus
    assert bm25_search(spark, root, ["cat"], k=10).count() > 0


def test_cli_phrase_search_round_trip(spark, tmp_path, capsys):
    """bm25-build --bigrams then phrase-search through the CLI: the
    exact-phrase answers come back as JSON rows."""
    import json

    from medallion_data_lake_spark import cli

    root = str(tmp_path / "idx")
    assert cli.main(["bm25-build", root, "--bigrams",
                     "--sf", "/root/testdata/sf0.001"]) == 0
    capsys.readouterr()
    assert cli.main(["phrase-search", root, "--phrase", "stream table hash",
                     "--sf", "/root/testdata/sf0.001"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    rows = [json.loads(ln) for ln in out if ln.startswith("{")]
    assert len(rows) == 3  # measured fixture df at sf0.001
    assert all(r["n_matches"] >= 1 for r in rows)
    # too-short phrase refused
    assert cli.main(["phrase-search", root, "--phrase", "solo",
                     "--sf", "/root/testdata/sf0.001"]) == 2


def test_torn_bigram_create_replays_exactly_once(spark, tmp_path, monkeypatch):
    """r11 review (high): the bigram contract must be resolved from a
    DURABLE marker, not from published state — a create(bigrams=True)
    that crashes mid roll-forward (postings published, bigram leg still
    staged) must let the documented idempotent re-run proceed as a
    5-leg index instead of raising 'built without bigrams', and an
    auto-detect caller (a restarted stream) must resolve True instead
    of silently committing 4-leg appends that leave permanent phrase
    gaps."""
    from medallion_data_lake_spark.operators import txn as T
    from medallion_data_lake_spark.operators.inverted_index import (
        _resolve_bigrams,
    )
    from medallion_data_lake_spark.operators.txn import recover_txns

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
        create_bm25_index(spark, _docs(spark, DOCS[:4]), root, n_files=2,
                          bigrams=True)
    monkeypatch.undo()

    # torn state: postings published, bigram leg staged-not-published —
    # published state alone would mis-resolve; the durable marker wins
    from medallion_data_lake_spark.operators.versioned import (
        latest_version,
    )

    assert latest_version(os.path.join(root, "bigrams")) is None
    assert index_has_bigrams(root)                   # marker remembers
    assert _resolve_bigrams(root, None) is True
    assert _resolve_bigrams(root, True) is True      # replay proceeds
    with pytest.raises(ValueError, match="with bigrams"):
        _resolve_bigrams(root, False)                # contract change refused

    # the replayed append lands the remaining legs; recovery completes
    # the torn txn; the phrase index then covers the FULL corpus
    append_bm25_index(spark, _docs(spark, DOCS[4:]), root, n_files=2)
    recover_txns(spark, os.path.join(root, "_txn"))
    docs = _docs(spark)
    got, _ = phrase_search(spark, root, docs, ["cat", "sat", "on"])
    assert sorted(tuple(r) for r in got.collect()) == \
        _scan_phrase(spark, docs, ["cat", "sat", "on"])


def test_failed_create_marker_does_not_poison_root(spark, tmp_path):
    """r11 review (second pass): the bigram marker is written before
    any leg stages, so a create(bigrams=True) that fails before
    anything durable starts leaves ONLY the marker. A fresh
    create(bigrams=False) must clean it and proceed instead of raising
    'rebuild the index' about an index that was never built."""
    from medallion_data_lake_spark.operators.inverted_index import (
        _resolve_bigrams,
    )

    root = str(tmp_path / "idx")
    # simulate the failed create: marker written, nothing else durable
    assert _resolve_bigrams(root, True) is True
    assert index_has_bigrams(root)

    # a contracted-but-unbuilt bigram table gives the actionable error
    with pytest.raises(ValueError, match="no published version"):
        phrase_candidates(spark, root, ["a", "b"])

    m = create_bm25_index(spark, _docs(spark, DOCS[:4]), root, n_files=2,
                          bigrams=False)
    assert m["status"] == "committed" and len(m["legs"]) == 4
    assert not index_has_bigrams(root)
    assert bm25_search(spark, root, ["cat"], k=3).count() > 0


def test_marker_cleanup_refuses_when_anything_durable_exists(spark, tmp_path):
    """r11 review (third pass): 'nothing durable' must mean NO txn
    manifest in any state and NO published version on ANY of the five
    tables — a broken create can publish the middle legs only, and
    cleaning the marker over them would land a fresh 4-leg index on
    top of orphaned stats rows."""
    from medallion_data_lake_spark.operators.inverted_index import (
        _resolve_bigrams,
    )
    from medallion_data_lake_spark.operators.txn import _write_manifest
    from medallion_data_lake_spark.operators.versioned import commit

    root = str(tmp_path / "idx")
    assert _resolve_bigrams(root, True) is True  # marker only

    # a broken txn's surviving publish: doclens landed, postings lost
    commit(spark.createDataFrame([(1, 4)], "doc_id long, dl long"),
           os.path.join(root, "doclens"))
    with pytest.raises(ValueError, match="with bigrams"):
        _resolve_bigrams(root, False)

    # manifests alone (even terminal ones) also block the cleanup
    root2 = str(tmp_path / "idx2")
    assert _resolve_bigrams(root2, True) is True
    os.makedirs(os.path.join(root2, "_txn"), exist_ok=True)
    _write_manifest(os.path.join(root2, "_txn"), {
        "txn_id": "txn-0-broken", "status": "broken", "created": 1.0,
        "legs": [],
    })
    with pytest.raises(ValueError, match="with bigrams"):
        _resolve_bigrams(root2, False)


def test_pointread_phrase_equals_scan_path(spark, tmp_path):
    """The scan-free serving path (bigram candidates + bloom-pruned
    doc-store point reads) returns exactly the scan path's answer,
    prunes the doc store's files, and handles the no-match and
    too-many-candidates edges."""
    from medallion_data_lake_spark.operators.inverted_index import (
        phrase_search_pointread,
    )
    from medallion_data_lake_spark.operators.versioned import commit

    idx = str(tmp_path / "idx")
    create_bm25_index(spark, _docs(spark), idx, n_files=2, bigrams=True)
    store = str(tmp_path / "docstore")
    # several commits so there are multiple files to prune
    for lo in range(0, len(DOCS), 2):
        commit(_docs(spark, DOCS[lo:lo + 2]), store,
               stats_cols=("doc_id",), bloom_cols=("doc_id",),
               mode="append" if lo else "overwrite")

    for phrase in (["cat", "sat", "on"], ["cat", "sat"]):
        got, report = phrase_search_pointread(spark, idx, store, phrase)
        assert sorted(tuple(r) for r in got.collect()) == \
            _scan_phrase(spark, _docs(spark), phrase), phrase
        assert report["candidates"] > 0
        assert report["doc_files_skipped"] > 0  # the store was pruned

    got, report = phrase_search_pointread(spark, idx, store,
                                          ["no", "such", "run"])
    assert got.count() == 0 and report["candidates"] == 0

    with pytest.raises(ValueError, match="max_candidates"):
        phrase_search_pointread(spark, idx, store, ["cat", "sat"],
                                max_candidates=1)


def test_shuffled_candidate_join_equals_broadcast(spark, idx):
    """broadcast_candidates=False (the corpus-scale escape hatch for
    phrases with no discriminative bigram) must return the identical
    answer through a shuffled semi-join, with no broadcast of the
    candidate side in the plan."""
    docs = _docs(spark)
    phrase = ["cat", "sat", "on"]
    bc, _ = phrase_search(spark, idx, docs, phrase)
    sh, _ = phrase_search(spark, idx, docs, phrase,
                          broadcast_candidates=False)
    assert sorted(tuple(r) for r in bc.collect()) == \
        sorted(tuple(r) for r in sh.collect())

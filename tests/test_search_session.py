"""WarmSearchSession (operators/search_session.py): the warm path —
pinned snapshot + corpus-total literals + cached doclens/termstats —
must be ANSWER-IDENTICAL to the cold per-request path on the same
snapshot, stay pinned across a concurrent append until refresh(), and
release only its own cache entries on close."""

from __future__ import annotations

from pyspark.sql import functions as F

from medallion_data_lake_spark.operators.inverted_index import (
    append_bm25_index,
    bm25_search,
    create_bm25_index,
    phrase_search,
)
from medallion_data_lake_spark.operators.search_session import (
    WarmSearchSession,
)

DOCS = [
    (1, "stream table join state"),
    (2, "hash join build probe"),
    (3, "stream stream join watermark state"),
    (4, "table scan filter pushdown"),
    (5, "state store checkpoint stream"),
    (6, "join hash shuffle exchange"),
]


def _docs(spark, rows=None):
    return spark.createDataFrame(rows or DOCS, "doc_id long, text string")


def _emb(spark, n=6):
    return spark.createDataFrame(
        [(i + 1, [float((i * 7 + j * 3) % 10) for j in range(8)])
         for i in range(n)],
        "vec_id long, embedding array<float>",
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_warm_equals_cold_bm25_phrase_hybrid(spark, tmp_path):
    root = str(tmp_path / "idx")
    create_bm25_index(spark, _docs(spark), root, n_files=2, bigrams=True)
    docs, emb = _docs(spark), _emb(spark)

    cold_bm25 = _rows(bm25_search(spark, root, ["stream", "join"], k=5))
    cold_phrase = _rows(
        phrase_search(spark, root, docs, ["stream", "join"])[0])
    from medallion_data_lake_spark.operators.hybrid import hybrid_search

    cold_hybrid = _rows(
        hybrid_search(spark, root, emb, ["stream", "join"], 1, k=5))

    with WarmSearchSession(spark, root, embeddings=emb) as s:
        assert s.corpus_totals[0] == len(DOCS) and s.corpus_totals[1] > 0
        # twice: the second request is the fully-warm one
        for _ in range(2):
            assert _rows(s.bm25(["stream", "join"], k=5)) == cold_bm25
            assert _rows(
                s.phrase(["stream", "join"], docs=docs)[0]) == cold_phrase
            assert _rows(
                s.hybrid(["stream", "join"], 1, k=5)) == cold_hybrid


def test_warm_plan_carries_no_corpus_fold(spark, tmp_path):
    """The warm bm25 plan must inline (N, sum_dl) as literals: no scan
    of the corpus_stats table remains in the optimized plan."""
    root = str(tmp_path / "idx")
    create_bm25_index(spark, _docs(spark), root, n_files=2)
    with WarmSearchSession(spark, root, cache_tables=False) as s:
        plan = s.bm25(["stream"], k=3)._jdf.queryExecution() \
            .optimizedPlan().toString()
        assert "corpus_stats" not in plan


def test_session_is_a_snapshot_lease_until_refresh(spark, tmp_path):
    """An append lands mid-session: the session keeps answering from
    its pinned cut; refresh() picks up the new snapshot (and the new
    doc then ranks)."""
    root = str(tmp_path / "idx")
    create_bm25_index(spark, _docs(spark), root, n_files=2)
    s = WarmSearchSession(spark, root, cache_tables=False)
    before = _rows(s.bm25(["zebra"], k=5))
    assert before == []
    append_bm25_index(
        spark, _docs(spark, [(99, "zebra zebra stream")]), root, n_files=1
    )
    assert _rows(s.bm25(["zebra"], k=5)) == before  # still pinned
    assert s.corpus_totals[0] == len(DOCS)
    s.refresh()
    after = _rows(s.bm25(["zebra"], k=5))
    assert [r[0] for r in after] == [99]
    assert s.corpus_totals[0] == len(DOCS) + 1
    # warm answer at the NEW pin equals a fresh cold call
    assert after == _rows(bm25_search(spark, root, ["zebra"], k=5))
    s.close()


def test_close_releases_only_own_cache(spark, tmp_path):
    root = str(tmp_path / "idx")
    create_bm25_index(spark, _docs(spark), root, n_files=2)
    other = _docs(spark).cache()
    other.count()
    s = WarmSearchSession(spark, root)
    s.bm25(["stream"], k=3).collect()
    s.close()
    assert other.storageLevel.useMemory  # untouched by session close
    other.unpersist()


def test_warm_phrase_path_skips_the_store_read(spark, tmp_path):
    """The r13 phrase warm path: with a cached tokenized doc
    projection, phrase() semi-joins bigram candidates against memory —
    answer-identical to the cold point-read, and the doc-store files
    are NEVER read per request (the cold path's dominant cost). Plan
    strings can't prove the latter (the cached relation's printed
    definition legitimately mentions the store), so the test proves it
    behaviorally: after the cache is materialized, the store's data
    files are DELETED from disk and the warm path must still answer."""
    import glob
    import os

    from medallion_data_lake_spark.operators.versioned import commit

    root = str(tmp_path / "idx")
    create_bm25_index(spark, _docs(spark), root, n_files=2, bigrams=True)
    store = str(tmp_path / "docstore")
    commit(_docs(spark), store, stats_cols=("doc_id",),
           bloom_cols=("doc_id",))

    from medallion_data_lake_spark.operators.inverted_index import (
        committed_index_snapshot,
        phrase_search_pointread,
    )

    pins = committed_index_snapshot(root)
    cold = _rows(phrase_search_pointread(
        spark, root, store, ["stream", "join"], pins=pins)[0])

    with WarmSearchSession(spark, root, docs_table=store) as s:
        warm_df, report = s.phrase(["stream", "join"])
        assert _rows(warm_df) == cold and len(cold) > 0
        assert "files_read" in report  # bigram pruning still reported
        # doc-store appends are invisible until refresh (lease)
        commit(_docs(spark, [(9, "stream join stream join")]), store,
               mode="append", stats_cols=("doc_id",),
               bloom_cols=("doc_id",))
        again, _ = s.phrase(["stream", "join"])
        assert _rows(again) == cold
        assert 9 not in {r[0] for r in _rows(again)}
        # the no-store-read proof: force the cached projection fully
        # into memory, remove the store's parquet data files, and the
        # warm path still answers (a per-request store scan would fail)
        assert s._doc_toks is not None
        s._doc_toks.count()
        removed = 0
        for f in glob.glob(os.path.join(store, "**", "*.parquet"),
                           recursive=True):
            os.remove(f)
            removed += 1
        assert removed > 0
        gone, _ = s.phrase(["stream", "join"])
        assert _rows(gone) == cold


def test_session_refuses_uncommitted_index(spark, tmp_path):
    """An index with no committed append txn has no consistent cut to
    pin; pins={} would silently float per-request reads at 'latest'
    while corpus_totals stay frozen — the session must refuse instead
    (r12 ADVICE item)."""
    import pytest

    with pytest.raises(ValueError, match="no committed append txn"):
        WarmSearchSession(spark, str(tmp_path / "never_built"))


def test_phrase_requires_bigrams(spark, tmp_path):
    import pytest

    root = str(tmp_path / "idx")
    create_bm25_index(spark, _docs(spark), root, n_files=2)  # no bigrams
    s = WarmSearchSession(spark, root, cache_tables=False)
    with pytest.raises(ValueError, match="bigram"):
        s.phrase(["stream", "join"], docs=_docs(spark))
    with pytest.raises(ValueError, match="embeddings"):
        s.hybrid(["stream"], 1)
    s.close()


# ---------------------------------------------------------------------------
# HTTP search routes (serving_http.py /search /phrase /hybrid) over a
# shared WarmSearchSession
# ---------------------------------------------------------------------------


def _post(url, payload):
    import json as _json
    import urllib.error
    import urllib.request

    req = urllib.request.Request(
        url, data=_json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=60) as resp:
            return resp.status, _json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, _json.loads(e.read())


def test_http_search_routes(spark, tmp_path):
    from medallion_data_lake_spark.serving import ServingLayer
    from medallion_data_lake_spark.serving_http import (
        serve_http_background,
    )

    root = str(tmp_path / "idx")
    create_bm25_index(spark, _docs(spark), root, n_files=2, bigrams=True)
    session = WarmSearchSession(
        spark, root, embeddings=_emb(spark), docs=_docs(spark),
    )
    serving = ServingLayer(spark)
    server, thread = serve_http_background(
        serving, port=0, search_session=session)
    host, port = server.server_address
    base = f"http://{host}:{port}"
    try:
        st, out = _post(f"{base}/search",
                        {"terms": ["stream", "join"], "k": 3})
        assert st == 200 and out["row_count"] == 3
        assert out["columns"] == ["doc_id", "n_terms_matched", "score"]
        want = [r[0] for r in _rows(
            session.bm25(["stream", "join"], k=3))][:1]  # same engine path
        assert want  # non-degenerate

        st, out = _post(f"{base}/phrase", {"phrase": ["stream", "join"]})
        assert st == 200
        assert {tuple(r) for r in out["rows"]} == {(3, 1)}
        assert "pruning" in out
        # absent k -> default_rows bound; an explicit k (even below the
        # default) is honored like every other route (r12 ADVICE item)
        assert out["truncated_at"] == 100
        st, out = _post(f"{base}/phrase",
                        {"phrase": ["stream", "join"], "k": 1})
        assert st == 200 and out["truncated_at"] == 1

        st, out = _post(f"{base}/hybrid",
                        {"terms": ["stream", "join"], "vec_id": 1, "k": 4})
        assert st == 200 and out["row_count"] == 4
        assert out["columns"][0] == "doc_id"

        st, out = _post(f"{base}/similar", {"vec_id": 1, "k": 3})
        assert st == 200 and out["row_count"] == 3
        assert out["columns"] == ["vec_id", "rank"]
        # equals the brute cosine branch (no vec_index on this session)
        from medallion_data_lake_spark.operators.hybrid import cosine_topn

        want = _rows(cosine_topn(_emb(spark), 1, 3))
        assert _rows(session.similar(1, k=3)) == want

        st, out = _post(f"{base}/search", {})
        assert st == 400 and "terms" in out["error"]
        st, out = _post(f"{base}/similar", {})
        assert st == 400 and "vec_id" in out["error"]
        st, out = _post(f"{base}/phrase", {"phrase": ["x"]})
        assert st == 400
    finally:
        server.shutdown()
        thread.join(timeout=5)
        session.close()


def test_http_search_unconfigured_is_clean_error(spark):
    from medallion_data_lake_spark.serving import ServingLayer
    from medallion_data_lake_spark.serving_http import (
        serve_http_background,
    )

    server, thread = serve_http_background(ServingLayer(spark), port=0)
    host, port = server.server_address
    try:
        st, out = _post(f"http://{host}:{port}/search", {"terms": ["x"]})
        assert st == 400 and "no search index" in out["error"]
    finally:
        server.shutdown()
        thread.join(timeout=5)


def test_similar_with_persisted_vec_index(spark, tmp_path):
    """With vec_index= the session's similar() probes the persisted
    index; under exhaustive probing it must equal the brute branch's
    id set."""
    from medallion_data_lake_spark.operators.ann import (
        build_kmeans_ivf_index,
    )
    from medallion_data_lake_spark.operators.hybrid import cosine_topn

    root = str(tmp_path / "idx")
    create_bm25_index(spark, _docs(spark), root, n_files=2)
    emb = _emb(spark)
    vec = str(tmp_path / "vec")
    build_kmeans_ivf_index(emb, vec, k=2)
    s = WarmSearchSession(spark, root, embeddings=emb, vec_index=vec,
                          cache_tables=False)
    got = {r["vec_id"] for r in s.similar(1, k=3, n_probes=2).collect()}
    want = {r["vec_id"] for r in cosine_topn(emb, 1, 3).collect()}
    assert got == want and len(got) == 3
    s.close()


def test_session_over_streaming_maintained_index(spark, tmp_path):
    """The serving story end-to-end against a STREAMING-maintained
    index: the warm session opens on the stream's committed snapshot,
    keeps serving that pinned cut while the stream lands another
    micro-batch (per-batch txn manifests — the same snapshot source as
    batch appends), and refresh() advances to the new committed cut."""
    import json as _json
    import os

    from medallion_data_lake_spark.operators.inverted_index import (
        run_postings_append_stream,
    )

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

    def drop(name, rows):
        with open(os.path.join(inp, name), "w") as fh:
            for d, t in rows:
                fh.write(_json.dumps({"doc_id": d, "text": t}) + "\n")

    drop("b0.json", DOCS[:4])
    run()
    s = WarmSearchSession(spark, root, cache_tables=False)
    assert s.corpus_totals[0] == 4
    first = _rows(s.bm25(["stream"], k=5))
    assert first and all(r[0] <= 4 for r in first)

    drop("b1.json", DOCS[4:])
    run()
    # still the pinned cut
    assert _rows(s.bm25(["stream"], k=5)) == first
    s.refresh()
    assert s.corpus_totals[0] == len(DOCS)
    after = _rows(s.bm25(["stream"], k=5))
    assert {r[0] for r in after} > {r[0] for r in first}
    # the refreshed warm answer equals a cold call at the tip
    assert after == _rows(bm25_search(spark, root, ["stream"], k=5))
    s.close()

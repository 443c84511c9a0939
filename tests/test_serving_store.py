"""Serving store (serving_store.py): the exported-SQL serving tier.

Contract under test:
- store BM25 results equal the lake's ``bm25_search`` at the exported
  snapshot — ids and match counts exactly, scores to double tolerance
  (the store sums per-term doubles through the same decimal(28,12)
  cast; Derby's decimal CAST truncates where Spark rounds, so the last
  place can differ by 1e-12);
- the store is a consistency LEASE: lake appends after export are
  invisible — store results keep matching the lake AT THE PINS;
- gold exports roundtrip and serve indexed point/top-k lookups;
- requests run with NO Spark job (the whole point of the tier);
- the HTTP /search route answers from the store when armed.
"""

from __future__ import annotations

import pytest

from medallion_data_lake_spark.operators.inverted_index import (
    append_bm25_index,
    bm25_search,
    create_bm25_index,
)
from medallion_data_lake_spark.serving_store import (
    DERBY_DRIVER,
    ServingStore,
    export_gold_store,
    export_search_store,
)

DOCS = [
    (1, "stream table join state"),
    (2, "hash join build probe"),
    (3, "stream stream join watermark state"),
    (4, "table scan filter pushdown"),
    (5, "state store checkpoint stream"),
    (6, "join hash shuffle exchange"),
]


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("derby_store")
    spark._jvm.java.lang.System.setProperty("derby.system.home", str(root))
    return f"jdbc:derby:{root}/store{{}};create=true"


def _docs(spark, rows=None):
    return spark.createDataFrame(rows or DOCS, "doc_id long, text string")


def _lake_rows(df):
    return [(r["doc_id"], r["n_terms_matched"], r["score"])
            for r in df.collect()]


def _assert_store_equals_lake(store_out, lake_rows):
    assert store_out["columns"] == ["doc_id", "n_terms_matched", "score"]
    got = [tuple(r) for r in store_out["rows"]]
    assert [g[:2] for g in got] == [l[:2] for l in lake_rows]
    for g, l in zip(got, lake_rows):
        assert abs(g[2] - l[2]) < 1e-9, (g, l)


def test_store_bm25_equals_lake_at_snapshot(spark, tmp_path, derby_url):
    root = str(tmp_path / "idx")
    create_bm25_index(spark, _docs(spark), root, n_files=2)
    url = derby_url.format("eq")
    pins = export_search_store(spark, root, url)

    with ServingStore(spark, url) as store:
        assert store.manifest() == pins
        for terms, k in ([["stream", "join"], 5], [["hash"], 3],
                         [["state", "store", "scan"], 6]):
            lake = _lake_rows(bm25_search(spark, root, terms, k=k,
                                          pins=pins))
            _assert_store_equals_lake(store.bm25(terms, k=k), lake)


def test_store_is_a_snapshot_lease(spark, tmp_path, derby_url):
    """Appends after export stay invisible: the store keeps matching
    the lake AT THE EXPORTED PINS, not the lake tip."""
    root = str(tmp_path / "idx")
    create_bm25_index(spark, _docs(spark), root, n_files=2)
    url = derby_url.format("lease")
    pins = export_search_store(spark, root, url)
    append_bm25_index(
        spark, _docs(spark, [(7, "stream join stream join")]), root)

    with ServingStore(spark, url) as store:
        out = store.bm25(["stream", "join"], k=6)
        ids = [r[0] for r in out["rows"]]
        assert 7 not in ids  # post-export append invisible
        lake_pinned = _lake_rows(
            bm25_search(spark, root, ["stream", "join"], k=6, pins=pins))
        _assert_store_equals_lake(out, lake_pinned)
        # re-export picks up the append (the refresh path)
        pins2 = export_search_store(spark, root, url)
        assert pins2 != pins
        out2 = store.bm25(["stream", "join"], k=6)
        assert 7 in [r[0] for r in out2["rows"]]


def test_store_request_runs_no_spark_job(spark, tmp_path, derby_url):
    """The tier's reason to exist: a store request must not launch any
    Spark job (it is one JDBC statement on the driver JVM)."""
    root = str(tmp_path / "idx")
    create_bm25_index(spark, _docs(spark), root, n_files=2)
    url = derby_url.format("nojob")
    export_search_store(spark, root, url)

    tracker = spark.sparkContext.statusTracker()
    with ServingStore(spark, url) as store:
        before = tracker.getJobIdsForGroup(None)
        out = store.bm25(["stream", "join"], k=5)
        assert out["row_count"] > 0
        assert tracker.getJobIdsForGroup(None) == before


def test_gold_export_point_and_topk(spark, derby_url):
    gold = spark.createDataFrame(
        [(i, f"cust_{i:03d}", float(i * 7 % 101)) for i in range(1, 101)],
        "customer_id int, name string, total_spent double",
    )
    url = derby_url.format("gold")
    export_gold_store(spark, {"gold_customers": gold}, url,
                      indexes={"gold_customers": "customer_id"})
    with ServingStore(spark, url) as store:
        pt = store.gold_point("gold_customers", "customer_id", 42)
        assert pt["row_count"] == 1
        assert pt["rows"][0][1] == "cust_042"
        top = store.gold_topk("gold_customers", "total_spent", k=3)
        want = sorted(((r["total_spent"], r["customer_id"])
                       for r in gold.collect()), reverse=True)[:3]
        assert [r[2] for r in top["rows"]] == [w[0] for w in want]
        # identifiers are validated, never interpolated from free text
        with pytest.raises(ValueError, match="identifier"):
            store.gold_point("gold_customers; DROP", "customer_id", 1)


def test_http_search_served_from_store(spark, tmp_path, derby_url):
    import json as _json
    import urllib.request

    from medallion_data_lake_spark.serving import ServingLayer
    from medallion_data_lake_spark.serving_http import (
        serve_http_background,
    )

    root = str(tmp_path / "idx")
    create_bm25_index(spark, _docs(spark), root, n_files=2)
    url = derby_url.format("http")
    pins = export_search_store(spark, root, url)

    store = ServingStore(spark, url)
    server, thread = serve_http_background(
        ServingLayer(spark), port=0, serving_store=store)
    host, port = server.server_address
    try:
        req = urllib.request.Request(
            f"http://{host}:{port}/search",
            data=_json.dumps({"terms": ["stream", "join"], "k": 4}).encode(),
            headers={"Content-Type": "application/json"}, method="POST",
        )
        with urllib.request.urlopen(req, timeout=60) as resp:
            out = _json.loads(resp.read())
        assert out["engine"] == "store" and out["row_count"] == 4
        lake = _lake_rows(
            bm25_search(spark, root, ["stream", "join"], k=4, pins=pins))
        _assert_store_equals_lake(out, lake)
    finally:
        server.shutdown()
        thread.join(timeout=5)
        store.close()


def test_export_refuses_uncommitted_index(spark, tmp_path, derby_url):
    with pytest.raises(ValueError, match="no committed append txn"):
        export_search_store(spark, str(tmp_path / "ghost"),
                            derby_url.format("ghost"))

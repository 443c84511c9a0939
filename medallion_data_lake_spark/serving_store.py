"""Serving store: sub-second request serving from an exported SQL
store — no Spark job per request.

The warm Spark session (operators/search_session.py) floors at ~1s per
request at local[32] because every request is still a Spark job:
scheduler + task launch + shuffle machinery, however small the data.
The reference's answer is a serving TIER — gold tables exported to
Postgres and queried directly ("sub-second response times",
reference ``sakila-data-lake/gold_postgress/fast_query.py:1-4``; the
export at ``gold_to_postgres.py:33-58``). This module is that tier,
Spark-first:

- the EXPORT runs through the distributed JDBC sink
  (:func:`sources.sinks.write_jdbc` — executor-parallel inserts, no
  ``toPandas`` hop, S10), reading every index table at ONE committed
  snapshot (:func:`operators.inverted_index.committed_index_snapshot`),
  so the store is a transaction-consistent cut of the lake;
- REQUESTS run over a plain ``java.sql`` connection through the
  driver JVM — one prepared statement, no Spark plan, no job. The
  store carries everything per-request scoring needs precomputed by
  Spark at export time (idf per term, corpus avgdl), so the request
  SQL evaluates only IEEE double arithmetic identical to the lake
  plan's (:func:`operators.inverted_index.bm25_term_score` — same ops,
  same order).

At 100 TB the shape is unchanged: the export is a bounded distributed
write (postings/doclens are index tables that track the corpus's
vocabulary and document count, not raw bytes), the store is Postgres/
MySQL behind the same JDBC URL, and request latency is the store's
indexed-lookup latency — independent of corpus scale for point/top-k
shapes. Embedded Derby (in every pyspark distribution) stands in for
the server database here, exactly as tests/test_jdbc.py does for the
ingest side.

Consistency contract: the store equals the lake AT THE EXPORTED
SNAPSHOT (pins recorded in the ``mdls_store_manifest`` table). Lake
appends after export are invisible until the next export — the same
read-lease semantics as ``WarmSearchSession.refresh()``.

Proven by tests/test_serving_store.py (store bm25 ≡ lake bm25_search
at the pinned snapshot, gold roundtrip, staleness lease); measured by
scripts/measure_serving_store.py (store p50 vs warm-Spark p50,
SCALE.md round 13).
"""

from __future__ import annotations

import json
import re
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.inverted_index import (
    _CORPUS,
    _DOCLENS,
    _POSTINGS,
    _TERMSTATS,
    _t,
    BM25_B,
    BM25_K1,
    bm25_idf,
    bm25_term_score,
    committed_index_snapshot,
)
from .operators.versioned import read_table
from .sources.sinks import write_jdbc

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"
ROW_CAP = 10_000  # same driver-side bound as serving.py

# Store-side table names (one namespace per store database).
T_POSTINGS = "mdls_postings"
T_TERMSTATS = "mdls_termstats"
T_CORPUS = "mdls_corpus"
T_MANIFEST = "mdls_store_manifest"

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _check_ident(name: str) -> str:
    """Identifiers (table/column names) are interpolated into DDL/SQL —
    never accept free text."""
    if not _IDENT.match(name):
        raise ValueError(f"invalid SQL identifier: {name!r}")
    return name


class ServingStore:
    """A driver-side ``java.sql`` connection to the exported store.

    Every request is one prepared statement on the JVM — no Spark job,
    no scheduler, no shuffle. py4j round-trips dominate the residual
    cost (~1 call per cell of the bounded result), which is why every
    query here is row-capped.

    The connection is NOT thread-safe (JDBC connections never are);
    the HTTP layer serializes access with a lock."""

    def __init__(self, spark: SparkSession, url: str,
                 driver: str | None = DERBY_DRIVER):
        self.spark = spark
        self.url = url
        jvm = spark._jvm
        if driver:
            # Embedded drivers may not be DriverManager-registered yet.
            jvm.java.lang.Class.forName(driver)
        self._conn = jvm.java.sql.DriverManager.getConnection(url)

    # -- plumbing -----------------------------------------------------------

    def close(self) -> None:
        try:
            self._conn.close()
        except Exception:
            pass

    def __enter__(self) -> "ServingStore":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def execute(self, sql: str) -> None:
        """DDL / maintenance statement (CREATE INDEX, DELETE...)."""
        st = self._conn.createStatement()
        try:
            st.execute(sql)
        finally:
            st.close()

    def query(self, sql: str, params: list | None = None,
              max_rows: int = ROW_CAP) -> dict:
        """Run one (optionally prepared) statement, return the bounded
        result as {"columns", "rows", "row_count"} — the same shape the
        HTTP layer's run_bounded_df emits."""
        n = max(1, min(int(max_rows), ROW_CAP))
        ps = self._conn.prepareStatement(sql)
        try:
            ps.setMaxRows(n)
            for i, p in enumerate(params or [], start=1):
                if isinstance(p, bool):
                    ps.setBoolean(i, p)
                elif isinstance(p, int):
                    ps.setLong(i, p)
                elif isinstance(p, float):
                    ps.setDouble(i, p)
                else:
                    ps.setString(i, str(p))
            rs = ps.executeQuery()
            md = rs.getMetaData()
            ncols = md.getColumnCount()
            cols = [md.getColumnLabel(c + 1).lower() for c in range(ncols)]
            rows = []
            while rs.next() and len(rows) < n:
                rows.append([rs.getObject(c + 1) for c in range(ncols)])
            rs.close()
            return {"columns": cols,
                    "rows": [[_plain(v) for v in r] for r in rows],
                    "row_count": len(rows)}
        finally:
            ps.close()

    # -- search surface -------------------------------------------------

    def bm25(self, terms: list[str], k: int = 10) -> dict:
        """Top-``k`` Okapi BM25 from the exported index — ONE
        covering-index scan + group-by, zero joins.

        The per-(term, doc) BM25 contribution ("impact") was
        precomputed BY SPARK at export with the exact
        :func:`bm25_term_score` expression the lake plan evaluates —
        every score component (tf, dl, avgdl, idf) is frozen at the
        exported snapshot, so materializing the product is pure
        denormalization, the impact-ordered-postings trick every
        serving-grade index (e.g. Lucene impacts) uses. The per-doc sum
        goes through the same ``decimal(28,12)`` order-independence
        cast as the lake plan. Result columns match ``bm25_search``:
        (doc_id, n_terms_matched, score).

        k1/b live in the exported impacts; a different (k1, b) needs a
        re-export, the same way it needs a re-scan in the lake."""
        terms = sorted(set(terms))
        if not terms:
            raise ValueError("bm25 needs at least one query term")
        k = max(1, min(int(k), ROW_CAP))
        marks = ", ".join("?" for _ in terms)
        # Spark's JDBC writer creates QUOTED lower-case columns; Derby
        # folds unquoted identifiers to upper case, so every column
        # reference here must stay quoted.
        # ORDER BY the DECIMAL sum itself, casting to double only in
        # the projection: the lake plan orders by the decimal(28,12)
        # sum before casting, so ordering the double here could rank
        # two docs differently at the k boundary when their decimal
        # scores differ below double precision (r13 advice).
        sql = (
            'SELECT p."doc_id", COUNT(*) AS n_terms_matched, '
            'CAST(SUM(CAST(p."impact" AS DECIMAL(28,12))) AS DOUBLE) '
            "AS score "
            f"FROM {T_POSTINGS} p "
            f'WHERE p."term" IN ({marks}) '
            'GROUP BY p."doc_id" '
            'ORDER BY SUM(CAST(p."impact" AS DECIMAL(28,12))) DESC, '
            f'p."doc_id" ASC FETCH FIRST {k} ROWS ONLY'
        )
        return self.query(sql, list(terms), max_rows=k)

    def gold_topk(self, table: str, order_col: str, k: int = 10,
                  desc: bool = True) -> dict:
        """Ordered top-k over an exported gold table (the canonical
        dashboard shape the reference serves from Postgres)."""
        t, c = _check_ident(table), _check_ident(order_col)
        k = max(1, min(int(k), ROW_CAP))
        d = "DESC" if desc else "ASC"
        return self.query(
            f'SELECT * FROM {t} ORDER BY "{c}" {d} '
            f"FETCH FIRST {k} ROWS ONLY",
            max_rows=k,
        )

    def gold_point(self, table: str, key_col: str, key) -> dict:
        """Indexed point lookup on an exported gold table."""
        t, c = _check_ident(table), _check_ident(key_col)
        return self.query(f'SELECT * FROM {t} WHERE "{c}" = ?', [key])

    def manifest(self) -> dict:
        """The export's snapshot pins (the store's consistency cut)."""
        out = self.query(f'SELECT "pins" FROM {T_MANIFEST}')
        return json.loads(out["rows"][0][0]) if out["rows"] else {}


def _plain(v):
    """py4j JavaObject scalars → JSON-safe Python values."""
    if v is None or isinstance(v, (int, float, str, bool)):
        return v
    # java.math.BigDecimal, java.sql.Timestamp/Date, etc.
    s = str(v)
    try:
        return int(s)
    except ValueError:
        try:
            return float(s)
        except ValueError:
            return s


def export_search_store(
    spark: SparkSession,
    index_root: str,
    url: str,
    driver: str | None = DERBY_DRIVER,
    pins: dict[str, int] | None = None,
    term_width: int = 256,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> dict[str, int]:
    """Export a BM25 index's serving projection to the SQL store, all
    tables read at ONE committed snapshot:

    - ``mdls_postings (term, doc_id, tf, impact)`` — ``impact`` is the
      per-(term, doc) BM25 contribution PRECOMPUTED by Spark with the
      exact :func:`bm25_term_score` expression the lake plan uses
      (every component — tf, dl, avgdl, idf — is frozen at the
      snapshot, so this is pure denormalization: a request needs NO
      joins, just the covering index on (term, doc_id, impact));
    - ``mdls_termstats (term, df, idf)`` — the per-term audit view
      (:func:`bm25_idf`, same expression as the lake);
    - ``mdls_corpus (n_docs, avgdl)`` — 1 row, the folded totals;
    - ``mdls_store_manifest (pins)`` — the exported versions, JSON.

    The impact join runs IN SPARK at export time (distributed), which
    is the whole design: per-request work in the store is an indexed
    scan bounded by the query terms' posting lengths, independent of
    corpus size. String columns get explicit VARCHAR DDL: Spark's
    Derby dialect defaults StringType to CLOB, which Derby can neither
    index nor compare in a WHERE clause. Returns the pins."""
    pins = pins or committed_index_snapshot(index_root)
    if pins is None:
        raise ValueError(
            f"index at {index_root} has no committed append txn; "
            "nothing consistent to export"
        )
    postings = read_table(
        spark, _t(index_root, _POSTINGS), version=pins.get(_POSTINGS)
    ).select("term", "doc_id", "tf")
    doclens = read_table(
        spark, _t(index_root, _DOCLENS), version=pins.get(_DOCLENS)
    ).select("doc_id", "dl")
    corpus_row = read_table(
        spark, _t(index_root, _CORPUS), version=pins.get(_CORPUS)
    ).agg(
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("sum_dl").cast("long").alias("sum_dl"),
    ).select(
        "n_docs",
        (F.col("sum_dl") / F.col("n_docs")).alias("avgdl"),
    )
    totals = corpus_row.first()
    if totals is None or not totals["n_docs"]:
        # an empty-but-committed index folds to NULL totals; int(None)
        # would crash opaquely rows deep instead of stating the problem
        raise ValueError(
            f"index at {index_root} has no documents at the committed "
            "snapshot; nothing to export"
        )
    n_docs, avgdl = int(totals["n_docs"]), float(totals["avgdl"])
    termstats = (
        read_table(
            spark, _t(index_root, _TERMSTATS), version=pins.get(_TERMSTATS)
        )
        .groupBy("term")
        .agg(F.sum("df_delta").cast("long").alias("df"))
        .select(
            "term", "df",
            bm25_idf(F.lit(n_docs), F.col("df")).alias("idf"),
        )
    )
    # materialize the per-(term, doc) impact: broadcast the
    # vocabulary-bounded termstats, shuffle-join doclens on doc_id —
    # the same join shape the lake search plan evaluates per query,
    # paid ONCE here instead
    impacts = (
        postings.join(F.broadcast(termstats.select("term", "idf")), "term")
        .join(doclens, "doc_id")
        .select(
            "term", "doc_id", "tf",
            bm25_term_score(
                F.col("tf"), F.col("dl"), F.lit(avgdl), F.col("idf"),
                k1, b,
            ).alias("impact"),
        )
    )
    vc = f"VARCHAR({int(term_width)})"
    write_jdbc(impacts, url, T_POSTINGS, driver=driver,
               createTableColumnTypes=f"term {vc}")
    write_jdbc(termstats, url, T_TERMSTATS, driver=driver,
               createTableColumnTypes=f"term {vc}")
    write_jdbc(corpus_row, url, T_CORPUS, driver=driver)
    manifest = spark.createDataFrame([(json.dumps(pins),)], "pins string")
    write_jdbc(manifest, url, T_MANIFEST, driver=driver,
               createTableColumnTypes="pins VARCHAR(4096)")
    with ServingStore(spark, url, driver=driver) as store:
        # covering index: the bm25 statement reads (term, doc_id,
        # impact) and nothing else — Derby answers it index-only
        store.execute(
            f"CREATE INDEX idx_postings_term ON "
            f'{T_POSTINGS}("term", "doc_id", "impact")')
        store.execute(
            f'CREATE INDEX idx_termstats_term ON {T_TERMSTATS}("term")')
        # give the optimizer real cardinalities for the fresh tables —
        # Derby has no auto-analyze, so call its system procedure; any
        # other engine (Postgres/MySQL behind the same URL) autovacuums
        # or ANALYZEs on its own and has no SYSCS_UTIL schema
        if driver == DERBY_DRIVER:
            for t in (T_POSTINGS, T_TERMSTATS):
                store.execute(
                    "CALL SYSCS_UTIL.SYSCS_UPDATE_STATISTICS"
                    f"('APP', '{t.upper()}', NULL)")
    return pins


def export_gold_store(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    url: str,
    driver: str | None = DERBY_DRIVER,
    indexes: dict[str, str] | None = None,
    string_width: int = 256,
) -> None:
    """Export gold DataFrames to the store (distributed JDBC write) and
    index the requested lookup columns. String columns become VARCHAR
    (indexable/comparable; Derby CLOBs are neither)."""
    for name, df in tables.items():
        _check_ident(name)
        str_cols = [f.name for f in df.schema.fields
                    if f.dataType.typeName() == "string"]
        ddl = ", ".join(
            f"{_check_ident(c)} VARCHAR({int(string_width)})"
            for c in str_cols
        )
        opts = {"createTableColumnTypes": ddl} if ddl else {}
        write_jdbc(df, url, name, driver=driver, **opts)
    if indexes:
        with ServingStore(spark, url, driver=driver) as store:
            for table, col in indexes.items():
                t, c = _check_ident(table), _check_ident(col)
                store.execute(
                    f'CREATE INDEX idx_{t}_{c} ON {t}("{c}")')


def run_store_search(store, lock, req: dict) -> dict:
    """HTTP dispatch for the store-backed /search route: same request
    and response shape as the warm-session path, plus
    ``"engine": "store"`` so callers can tell which tier answered."""
    terms = req.get("terms")
    if not terms:
        raise ValueError("body must carry {'terms': [...]}")
    k = max(1, min(int(req.get("k", 10)), ROW_CAP))
    t0 = time.time()
    with lock:
        out = store.bm25(list(terms), k=k)
    out["engine"] = "store"
    out["truncated_at"] = k
    out["elapsed_sec"] = round(time.time() - t0, 4)
    return out

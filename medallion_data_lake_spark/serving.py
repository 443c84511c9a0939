"""Serving-side query surface over the gold layer.

Analog of the reference's serving pair — the Postgres ``FastQuery``
REPL (``gold_postgress/fast_query.py:9-196``) and the cached-session
web interface (``query_interface.py:1-200``) — re-expressed over Spark
itself so there is no second engine to keep in sync:

- one CACHED SparkSession + gold catalog per process (the reference
  caches the session because session startup dominates interactive
  latency; same here — first call pays the mount, every later query is
  sub-second on gold-sized tables);
- gold tables are registered as views once and optionally pinned in
  memory (``spark.catalog.cacheTable`` — the in-memory columnar cache
  is Spark's analog of serving from Postgres);
- every verb returns data (DataFrame / dict / pandas) rather than
  printing, so the same surface backs a REPL, a web handler, or a test;
- reads stay bounded: ``query_pandas`` caps the rows collected to the
  driver (S14 — the reference's interface trusts LIMIT clauses typed by
  the user);
- a JDBC-served deployment (reference keeps a Postgres copy) is the
  same class pointed at ``read_jdbc_table`` sources — see
  ``from_jdbc`` — so query code is identical against parquet gold or a
  database copy.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .catalog import Catalog

# Canned analytics mirroring fast_query.sample_queries()
# (gold_postgress/fast_query.py:76-196): value-tier distribution and
# daily revenue over the gold tables our pipeline writes.
SAMPLE_QUERIES: dict[str, str] = {
    "customer_value_distribution": """
        SELECT customer_value_tier,
               COUNT(*)                        AS customers,
               ROUND(AVG(total_spent), 2)      AS avg_spent,
               ROUND(SUM(total_spent), 2)      AS total_revenue
        FROM gold_customer_summary
        GROUP BY customer_value_tier
        ORDER BY total_revenue DESC
    """,
    "daily_revenue_trend": """
        SELECT *
        FROM gold_daily_revenue
        ORDER BY payment_date
    """,
}


class ServingLayer:
    """Cached serving session over a gold root (or JDBC-backed views)."""

    def __init__(self, spark: SparkSession, gold_root: str | None = None,
                 cache_tables: bool = False):
        self.spark = spark
        self.catalog = Catalog(spark, {"gold": gold_root} if gold_root else {})
        self._cached: list[str] = []
        if gold_root:
            for t in sorted(os.listdir(gold_root)):
                if os.path.isdir(os.path.join(gold_root, t)):
                    name = self.catalog.register_path("gold", t)
                    if cache_tables:
                        spark.catalog.cacheTable(name)
                        self._cached.append(name)

    @classmethod
    def from_jdbc(
        cls,
        spark: SparkSession,
        url: str,
        tables: dict[str, str],
        properties: dict[str, str] | None = None,
        cache_tables: bool = True,
    ) -> "ServingLayer":
        """Serve from a database copy of gold (reference S10 pairing):
        each table becomes a ``gold_<name>`` view over a JDBC read.
        Caching is on by default — a serving layer hitting the database
        once per query would defeat its purpose."""
        from .sources.batch import read_jdbc_table

        inst = cls(spark, gold_root=None)
        for name, db_table in tables.items():
            df = read_jdbc_table(spark, url, db_table, properties=properties)
            view = inst.catalog.register("gold", name, df)
            if cache_tables:
                spark.catalog.cacheTable(view)
                inst._cached.append(view)
        return inst

    def register_versioned(
        self, name: str, table_path: str, version: int | None = None,
        cache: bool = False,
    ) -> str:
        """Serve a log-structured versioned table (operators/versioned.py)
        as a ``gold_<name>`` view, optionally PINNED to a version — a
        dashboard pinned this way is reproducible regardless of ongoing
        CDC merges/OPTIMIZE on the table (readers of old snapshots are
        never disturbed; that is the log format's core contract)."""
        from .operators.versioned import read_table

        df = read_table(self.spark, table_path, version=version)
        view = self.catalog.register("gold", name, df)
        if cache:
            self.spark.catalog.cacheTable(view)
            self._cached.append(view)
        return view

    # -- verbs (fast_query.py parity) ------------------------------------

    def query(self, sql: str) -> DataFrame:
        """Lazy DataFrame — callers choose how much to materialize."""
        return self.spark.sql(sql)

    def query_pandas(self, sql: str, max_rows: int = 10_000):
        """Bounded collect for interactive/REPL use (S14)."""
        return self.spark.sql(sql).limit(max_rows).toPandas()

    def show_tables(self) -> list[str]:
        # only views THIS serving layer registered — the session may hold
        # unrelated temp views (other catalogs, notebooks, tests)
        return sorted(self.catalog._registered)

    def describe_table(self, name: str, sample_rows: int = 5) -> dict:
        return self.catalog.describe_table(name, sample_rows=sample_rows)

    def sample_data(self, name: str, limit: int = 5):
        return self.spark.table(name).limit(limit).toPandas()

    def sample_queries(self) -> dict[str, DataFrame]:
        """The canned analytics pack; keys match SAMPLE_QUERIES."""
        return {k: self.spark.sql(v) for k, v in SAMPLE_QUERIES.items()}

    def close(self) -> None:
        for name in self._cached:
            self.spark.catalog.uncacheTable(name)
        self._cached.clear()


def serve_repl(
    serving: ServingLayer,
    in_stream,
    out_stream,
    max_rows: int = 20,
) -> int:
    """Line-oriented SQL REPL over a ServingLayer — the engine's
    ``fast_query.py`` REPL parity (reference
    ``gold_postgress/fast_query.py:76-196``): interactive SQL against the
    cached gold views with bounded output.

    Commands: ``\\t`` list tables, ``\\d <table>`` describe,
    ``\\samples`` run the canned pack, ``\\q`` quit; anything else runs
    as SQL (output bounded to ``max_rows`` — S14, never an unbounded
    collect). Streams are parameters so a test (or a web handler) can
    drive it; returns the number of statements executed.
    """
    def emit(text: str) -> None:
        print(text, file=out_stream)

    emit(f"serving {len(serving.show_tables())} gold view(s); "
         "\\t tables, \\d <table> describe, \\samples, \\q quit")
    executed = 0
    for line in in_stream:
        stmt = line.strip().rstrip(";")
        if not stmt:
            continue
        if stmt in ("\\q", "quit", "exit"):
            break
        try:
            if stmt == "\\t":
                emit("\n".join(serving.show_tables()))
            elif stmt.startswith("\\d "):
                desc = serving.describe_table(stmt[3:].strip(), sample_rows=3)
                emit(str(desc["schema"].simpleString()
                         if hasattr(desc["schema"], "simpleString")
                         else desc["schema"]))
            elif stmt == "\\samples":
                for name, df in serving.sample_queries().items():
                    emit(f"=== {name} ===")
                    emit(df.limit(max_rows).toPandas().to_string(index=False))
            else:
                pdf = serving.query_pandas(stmt, max_rows=max_rows)
                emit(pdf.to_string(index=False))
                executed += 1
        except Exception as exc:  # surface, keep serving (REPL contract)
            emit(f"error: {exc}")
    return executed


_SERVING: ServingLayer | None = None


def get_serving(
    gold_root: str,
    spark_factory: Callable[[], SparkSession] | None = None,
    cache_tables: bool = True,
) -> ServingLayer:
    """Process-wide cached serving layer (reference ``query_interface.py``
    caches its session the same way: @st.cache_resource)."""
    global _SERVING
    if _SERVING is None:
        if spark_factory is None:
            from .session import get_spark

            spark_factory = get_spark
        _SERVING = ServingLayer(spark_factory(), gold_root, cache_tables=cache_tables)
    return _SERVING

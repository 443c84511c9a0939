"""End-to-end JDBC read/write against embedded Apache Derby.

S1 (JDBC full-table scan, reference ``mysql_to_kafka.py:37-55``) and
S10 (JDBC serving sink, reference ``gold_to_postgres.py:33-58``) were
previously verified at the plumbing level only — no database server
exists in this container. Derby's embedded driver ships inside the
pyspark distribution (``pyspark/jars/derby-*.jar``), so the full
write → read → parallel partitioned read path CAN be exercised in-JVM
with a real SQL engine behind the JDBC API: same DataSource V1 JDBC
relation, same dialect machinery, same range-partitioned scan planning
as MySQL/Postgres — only the URL differs.
"""

from __future__ import annotations

import pytest

from medallion_data_lake_spark.sources.batch import read_jdbc_table
from medallion_data_lake_spark.sources.sinks import write_jdbc

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("derby")
    # Keep derby.log out of the repo cwd (read at engine boot).
    spark._jvm.java.lang.System.setProperty("derby.system.home", str(root))
    return f"jdbc:derby:{root}/servingdb;create=true"


@pytest.fixture(scope="module")
def gold_df(spark):
    return spark.createDataFrame(
        [(i, f"cust_{i:04d}", float(i * 10)) for i in range(1, 201)],
        "customer_id INT, name STRING, total_spent DOUBLE",
    )


def test_write_then_read_roundtrip(spark, derby_url, gold_df):
    write_jdbc(gold_df, derby_url, "gold_summary", driver=DERBY_DRIVER)
    back = read_jdbc_table(spark, derby_url, "gold_summary", driver=DERBY_DRIVER)
    assert back.count() == 200
    assert sorted(back.columns) == sorted(gold_df.columns)
    assert (
        sorted(tuple(r) for r in back.collect())
        == sorted(tuple(r) for r in gold_df.collect())
    )


def test_partitioned_parallel_read(spark, derby_url, gold_df):
    """Range-partitioned scan (the S1 parallelism upgrade) returns the
    same rows as the single-partition scan — boundary predicates must
    neither drop nor duplicate rows."""
    write_jdbc(gold_df, derby_url, "gold_part", driver=DERBY_DRIVER)
    back = read_jdbc_table(
        spark,
        derby_url,
        "gold_part",
        partition_column="customer_id",
        num_partitions=4,
        lower_bound=1,
        upper_bound=201,
        driver=DERBY_DRIVER,
    )
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 200
    assert sorted(r.customer_id for r in back.collect()) == list(range(1, 201))


def test_overwrite_mode_replaces(spark, derby_url, gold_df):
    write_jdbc(gold_df, derby_url, "gold_ow", driver=DERBY_DRIVER)
    write_jdbc(
        gold_df.limit(10), derby_url, "gold_ow", mode="overwrite", driver=DERBY_DRIVER
    )
    back = read_jdbc_table(spark, derby_url, "gold_ow", driver=DERBY_DRIVER)
    assert back.count() == 10


def test_append_mode_accumulates(spark, derby_url, gold_df):
    write_jdbc(gold_df.limit(5), derby_url, "gold_ap", driver=DERBY_DRIVER)
    write_jdbc(
        gold_df.limit(5), derby_url, "gold_ap", mode="append", driver=DERBY_DRIVER
    )
    back = read_jdbc_table(spark, derby_url, "gold_ap", driver=DERBY_DRIVER)
    assert back.count() == 10


def test_pushdown_reaches_jdbc_source(spark, derby_url, gold_df):
    """Filter on the JDBC relation is pushed into the source (the scan
    ships a WHERE clause to the database, not a full-table read)."""
    write_jdbc(gold_df, derby_url, "gold_pd", driver=DERBY_DRIVER)
    back = read_jdbc_table(spark, derby_url, "gold_pd", driver=DERBY_DRIVER)
    filtered = back.filter("customer_id <= 50")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "customer_id" in plan
    assert filtered.count() == 50

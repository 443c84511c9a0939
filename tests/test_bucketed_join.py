"""Bucketed co-located joins: the pre-shuffled fact⨝fact path.

Asserts the physical property, not just the rows: joining two tables
bucketed on the same key must plan ZERO exchanges — the shuffle was paid
once at write time (SCALE.md "Partitioning & shuffle").
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from medallion_data_lake_spark.catalog import load_star_table
from medallion_data_lake_spark.plans import count_shuffles, explain_str
from medallion_data_lake_spark.sources.sinks import write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    orders = load_star_table(spark, "/root/testdata/sf0.001", "orders")
    lineitem = load_star_table(spark, "/root/testdata/sf0.001", "lineitem")
    write_bucketed(orders, "b_orders", "o_orderkey", n_buckets=8)
    write_bucketed(lineitem, "b_lineitem", "l_orderkey", n_buckets=8)
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    # disable broadcast so the join must use the bucketed SMJ path (at
    # real scale neither fact side would be broadcastable anyway)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table("b_lineitem")
            .join(spark.table("b_orders"), F.col("l_orderkey") == F.col("o_orderkey"))
            .select("o_orderkey", "l_linenumber", "l_extendedprice", "o_totalprice")
        )
        plan = explain_str(joined)
        assert count_shuffles(joined) == 0, plan  # co-located: no shuffle Exchange
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", prev_aqe)


def test_bucketed_join_rows_match_plain_join(spark, bucketed_tables):
    orders = load_star_table(spark, "/root/testdata/sf0.001", "orders")
    lineitem = load_star_table(spark, "/root/testdata/sf0.001", "lineitem")
    plain = lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).count()
    bucketed = (
        spark.table("b_lineitem")
        .join(spark.table("b_orders"), F.col("l_orderkey") == F.col("o_orderkey"))
        .count()
    )
    assert plain == bucketed == 6000


def test_bucketed_aggregation_avoids_shuffle(spark, bucketed_tables):
    # groupBy on the bucket key also reuses the bucketing
    agg = spark.table("b_orders").groupBy("o_orderkey").agg(F.sum("o_totalprice"))
    assert count_shuffles(agg) == 0

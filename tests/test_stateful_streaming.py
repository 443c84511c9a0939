"""Custom stateful operator: applyInPandasWithState across micro-batches."""

from __future__ import annotations

from pyspark.sql import functions as F

from medallion_data_lake_spark.catalog import load_star_table
from medallion_data_lake_spark.streaming import events as se
from medallion_data_lake_spark.streaming.stateful import running_user_stats


def test_stateful_user_counters_match_batch(spark, tmp_path_factory):
    src = tmp_path_factory.mktemp("state") / "events"
    # two files -> two micro-batches (maxFilesPerTrigger=1), so state
    # must genuinely carry across a batch boundary (more batches only
    # add python-worker spin-up time, not coverage)
    load_star_table(spark, "/root/testdata/sf0.001", "events").repartition(2).write.parquet(str(src))

    stream = se.read_events_stream(spark, str(src), max_files_per_trigger=1)
    stats = running_user_stats(stream, idle_timeout=False)
    q = (
        stats.writeStream.format("memory")
        .queryName("user_state_sink")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path_factory.mktemp("ck")))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()

    # update mode emits one row per user per micro-batch; the LAST row per
    # user is the final accumulated state
    final = {
        r["user_id"]: r
        for r in spark.sql(
            """
            SELECT * FROM (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                           ORDER BY n_events DESC) rn
              FROM user_state_sink
            ) WHERE rn = 1
            """
        ).collect()
    }

    batch = {
        r["user_id"]: r
        for r in load_star_table(spark, "/root/testdata/sf0.001", "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("tv"),
        )
        .collect()
    }
    assert set(final) == set(batch)
    for uid, b in batch.items():
        assert final[uid]["n_events"] == b["n"]
        assert abs(final[uid]["total_value"] - b["tv"]) < 0.02  # per-batch rounding


def test_transform_with_state_matches_legacy_operator(spark, tmp_path_factory):
    """The Spark 4 StatefulProcessor twin accumulates identically across
    micro-batch boundaries. Requires google.protobuf (the TWS state
    protocol) — absent in this container, so this skips here and runs on
    any real cluster image."""
    import pytest

    pytest.importorskip("google.protobuf")
    from medallion_data_lake_spark.streaming.stateful import running_user_stats_tws

    src = tmp_path_factory.mktemp("tws") / "events"
    load_star_table(spark, "/root/testdata/sf0.001", "events").repartition(2).write.parquet(str(src))

    stream = se.read_events_stream(spark, str(src), max_files_per_trigger=1)
    # transformWithStateInPandas requires the RocksDB state store
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        q = (
            running_user_stats_tws(stream)
            .writeStream.format("memory")
            .queryName("user_state_tws_sink")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path_factory.mktemp("ck_tws")))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)

    final = {
        r["user_id"]: r
        for r in spark.sql(
            """
            SELECT * FROM (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                           ORDER BY n_events DESC) rn
              FROM user_state_tws_sink
            ) WHERE rn = 1
            """
        ).collect()
    }
    batch = {
        r["user_id"]: r
        for r in load_star_table(spark, "/root/testdata/sf0.001", "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("tv"))
        .collect()
    }
    assert set(final) == set(batch)
    for uid, b in batch.items():
        assert final[uid]["n_events"] == b["n"]
        assert abs(final[uid]["total_value"] - b["tv"]) < 0.02

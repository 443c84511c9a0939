"""Streaming session windows: F.session_window parity with the batch
lag-gap sessionization query."""

from __future__ import annotations

from pyspark.sql import functions as F

from medallion_data_lake_spark.catalog import load_star_table
from medallion_data_lake_spark.queries import load_all_extra
from medallion_data_lake_spark.streaming import events as se


def test_session_window_stream_matches_batch_sessionization(spark, tmp_path_factory):
    src = tmp_path_factory.mktemp("sess") / "events"
    load_star_table(spark, "/root/testdata/sf0.001", "events").repartition(2).write.parquet(str(src))

    stream = se.read_events_stream(spark, str(src))
    sessions = (
        stream.withWatermark("ts", "30 days")
        .groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    q = (
        sessions.writeStream.format("memory")
        .queryName("sess_sink")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path_factory.mktemp("ck")))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    streamed = {
        (r["user_id"], r["n_events"])
        for r in spark.sql(
            "select user_id, n_events from sess_sink"
        ).collect()
    }
    batch = {
        (r["user_id"], r["n_events"])
        for r in load_all_extra()["user_sessionization"]
        .build(spark, "/root/testdata/sf0.001")
        .collect()
    }
    # session_window merges events within the same 30-min-gap cluster, the
    # same grouping the lag-based batch query derives -> identical
    # (user, session-size) multisets
    assert streamed == batch

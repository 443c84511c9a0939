"""Structured Streaming parity: availableNow stream == batch result."""

from __future__ import annotations

import shutil

import pytest

from medallion_data_lake_spark.catalog import load_star_table
from medallion_data_lake_spark.queries import load_all_extra
from medallion_data_lake_spark.streaming import events as stream_events


@pytest.fixture(scope="module")
def events_parquet_dir(spark, tmp_path_factory):
    """Re-write the events fixture as a clean µs-timestamp parquet dir
    (the raw fixture is TIMESTAMP(NANOS), unreadable by a stream reader
    with our declared µs schema)."""
    out = tmp_path_factory.mktemp("stream") / "events"
    df = load_star_table(spark, "/root/testdata/sf0.001", "events")
    df.repartition(4).write.mode("overwrite").parquet(str(out))
    return str(out)


def test_stream_rollup_matches_batch(spark, tmp_path_factory, events_parquet_dir):
    ck = tmp_path_factory.mktemp("ck")
    stream = stream_events.read_events_stream(spark, events_parquet_dir)
    assert stream.isStreaming
    rollup = stream_events.hourly_rollup(stream)

    q = (
        rollup.writeStream.format("memory")
        .queryName("rollup_test")
        .outputMode("complete")
        .option("checkpointLocation", str(ck / "c1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    streamed = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.sql("select * from rollup_test").collect()
    }
    batch = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in load_all_extra()["events_hourly_windows"].build(spark, "/root/testdata/sf0.001").collect()
    }
    # exact parity on counts and exact-decimal sums (n_users is approx in
    # the stream — excluded by construction)
    assert streamed == batch


def test_exactly_once_resume(spark, tmp_path_factory, events_parquet_dir):
    """availableNow + checkpoint: re-running with the same checkpoint
    processes nothing new (exactly-once), unlike the reference's
    at-least-once consumer (kafka_to_bronze.py:23)."""
    ck = tmp_path_factory.mktemp("ck2")
    out = tmp_path_factory.mktemp("out") / "bronze_events"

    for _ in range(2):  # second run must be a no-op
        stream = stream_events.read_events_stream(spark, events_parquet_dir)
        stream_events.run_to_parquet(stream, str(out), str(ck / "c"))

    total = spark.read.parquet(str(out)).count()
    expected = load_star_table(spark, "/root/testdata/sf0.001", "events").count()
    assert total == expected  # no duplicates from the re-run


def test_dedup_within_watermark(spark, tmp_path_factory, events_parquet_dir):
    """At-least-once input (input dir doubled) → deduped stream output."""
    dup_dir = tmp_path_factory.mktemp("dup") / "events"
    shutil.copytree(events_parquet_dir, dup_dir)
    # duplicate every file (same rows twice)
    for f in list(dup_dir.glob("part-*.parquet")):
        shutil.copy(f, dup_dir / ("dup-" + f.name))

    ck = tmp_path_factory.mktemp("ck3")
    stream = stream_events.read_events_stream(spark, str(dup_dir))
    deduped = stream_events.deduped_stream(stream, watermark="365 days")

    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_test")
        .outputMode("append")
        .option("checkpointLocation", str(ck / "c"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n = spark.sql("select count(distinct event_id) c, count(*) n from dedup_test").collect()[0]
    assert n["n"] == n["c"]  # every event exactly once

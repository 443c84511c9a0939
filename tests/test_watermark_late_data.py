"""Watermark late-data policy, made observable (SURVEY.md §7.4.5).

Files are replayed out of time order (one file per micro-batch). A
conservative watermark must reproduce the batch result exactly; an
aggressive watermark may drop late rows — strictly fewer or equal, and
never fabricated data. This is the property a wrong watermark breaks
*silently* in production, so it gets an explicit test.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from medallion_data_lake_spark.catalog import load_star_table
from medallion_data_lake_spark.streaming import events as se


def _run_rollup(spark, src, ck, watermark):
    stream = se.read_events_stream(spark, str(src), max_files_per_trigger=1)
    rollup = se.hourly_rollup(stream, watermark=watermark)
    q = (
        rollup.writeStream.format("memory")
        .queryName("wm_sink")
        .outputMode("complete")
        .option("checkpointLocation", str(ck))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in spark.sql("select * from wm_sink").collect()
    }


def _shuffled_replay_dir(spark, tmp_path_factory):
    """events split into files by DESCENDING day → arrival order is the
    reverse of event time (every later batch is 'late')."""
    src = tmp_path_factory.mktemp("late") / "events"
    df = load_star_table(spark, "/root/testdata/sf0.001", "events")
    # partition files by reversed day bucket so file order ≠ time order
    df.withColumn("_rev", 31 - F.dayofmonth("ts")).repartitionByRange(4, "_rev").drop(
        "_rev"
    ).write.parquet(str(src))
    return src


def test_conservative_watermark_loses_nothing(spark, tmp_path_factory):
    src = _shuffled_replay_dir(spark, tmp_path_factory)
    got = _run_rollup(spark, src, tmp_path_factory.mktemp("ck1"), watermark="60 days")
    expected = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in load_star_table(spark, "/root/testdata/sf0.001", "events")
        .groupBy(F.window("ts", "1 hour").start.alias("window_start"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .collect()
    }
    assert got == expected  # out-of-order replay, zero loss


def test_aggressive_watermark_only_drops_never_invents(spark, tmp_path_factory):
    src = _shuffled_replay_dir(spark, tmp_path_factory)
    strict = _run_rollup(spark, src, tmp_path_factory.mktemp("ck2"), watermark="1 minute")
    loose = _run_rollup(spark, src, tmp_path_factory.mktemp("ck3"), watermark="60 days")
    # every window the strict run kept must exist in the loose run with
    # at-most-equal counts (late rows dropped, nothing fabricated)
    assert set(strict) <= set(loose)
    assert all(strict[k] <= loose[k] for k in strict)
    total_strict = sum(strict.values())
    total_loose = sum(loose.values())
    assert total_strict <= total_loose == 1000

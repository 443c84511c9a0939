"""Stream-stream interval join: watermarked two-sided join parity.

Contract under test (streaming/joins.py): running the watermarked
signup⋈purchase attribution join availableNow over a file-served copy of
the events fixture yields EXACTLY the pairs the equivalent batch
interval join produces — stream/batch parity for a two-sided stateful
operator, the same discipline tests/test_streaming.py applies to the
windowed rollup.
"""

from __future__ import annotations

from datetime import timedelta

import pytest
from pyspark.sql import functions as F

from medallion_data_lake_spark.catalog import load_star_table
from medallion_data_lake_spark.streaming.events import read_events_stream
from medallion_data_lake_spark.streaming.joins import (
    purchase_attribution_join,
    split_funnel_streams,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_src(spark, tmp_path_factory):
    src = str(tmp_path_factory.mktemp("ssj") / "events")
    load_star_table(spark, SF, "events").write.parquet(src)
    return src


def _run_stream(spark, events_src, tmp_path, how: str, passes: int = 1):
    """Run the join availableNow; ``passes=2`` restarts from the same
    checkpoint so the no-data batch after restart applies the FINAL
    watermark — outer-join NULLs evicted by the last batch's watermark
    are emitted one micro-batch later, which a single availableNow run
    stops short of (the restart is how a production availableNow
    schedule — e.g. hourly cron — picks them up)."""
    out_dir = str(tmp_path / f"out_{how}")

    def one_pass(src):
        stream = read_events_stream(spark, src)
        signups, purchases = split_funnel_streams(stream)
        joined = purchase_attribution_join(signups, purchases, how=how)
        q = (
            joined.writeStream.format("parquet")
            .outputMode("append")
            .option("path", out_dir)
            .option("checkpointLocation", str(tmp_path / f"ck_{how}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    if passes == 1:
        one_pass(events_src)
    else:
        # A restarted availableNow run with NO new files plans zero
        # batches, so the final watermark never applies — exactly like a
        # real stream, eviction needs the clock to move. Run against a
        # private copy of the source (the checkpoint pins the path), then
        # feed a far-future heartbeat on each side (>1h apart so the pair
        # can't match itself) and restart: the second pass advances both
        # watermarks past every original signup's horizon.
        src = str(tmp_path / f"src_{how}")
        base = spark.read.parquet(events_src)
        base.write.parquet(src)
        one_pass(src)
        max_ts = base.agg(F.max("ts")).first()[0]
        hb = spark.createDataFrame(
            [
                (10**9, max_ts + timedelta(hours=10), 10**6, "signup", 0.0, "{}"),
                (10**9 + 1, max_ts + timedelta(hours=12), 10**6 + 1, "purchase", 0.0, "{}"),
            ],
            base.schema,
        )
        hb.write.mode("append").parquet(src)
        one_pass(src)
    out = spark.read.parquet(out_dir)
    out.createOrReplaceTempView(f"ssj_{how}_sink")
    return out


def _batch_pairs(spark, events_src):
    e = spark.read.parquet(events_src).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    s = e.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_event_id"),
        F.col("user_id").alias("s_user"),
        F.col("ts").alias("signup_ts"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_event_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    return s.join(
        p,
        (F.col("p_user") == F.col("s_user"))
        & (F.col("p_ts") > F.col("signup_ts"))
        & (F.col("p_ts") <= F.col("signup_ts") + F.expr("INTERVAL 1 HOUR")),
        "inner",
    )


def test_stream_stream_inner_matches_batch(spark, events_src, tmp_path):
    got = _run_stream(spark, events_src, tmp_path, "inner")
    stream_pairs = {
        (r["signup_event_id"], r["p_event_id"]) for r in got.collect()
    }
    batch_pairs = {
        (r["signup_event_id"], r["p_event_id"])
        for r in _batch_pairs(spark, events_src).collect()
    }
    assert stream_pairs == batch_pairs
    assert len(stream_pairs) > 0  # fixture actually exercises the join


def test_stream_stream_join_derives_latency(spark, events_src, tmp_path):
    got = spark.table("ssj_inner_sink")  # left by the previous test's run
    bad = got.filter(
        (F.col("seconds_to_purchase") <= 0)
        | (F.col("seconds_to_purchase") > 3600)
    ).count()
    assert bad == 0  # every attributed purchase is inside (0, 1h]


def test_stream_stream_left_outer_emits_unmatched(spark, events_src, tmp_path):
    """The outer side: every signup appears at least once; unmatched ones
    carry NULL purchase columns (emitted when the watermark passed their
    horizon — availableNow runs the stream to completion, which advances
    the watermark past the bounded fixture)."""
    got = _run_stream(spark, events_src, tmp_path, "left_outer", passes=2)
    n_signups = (
        spark.read.parquet(events_src)
        .filter(F.col("event_type") == "signup")
        .count()
    )
    matched = got.filter(F.col("p_event_id").isNotNull())
    unmatched = got.filter(F.col("p_event_id").isNull())
    inner = {
        (r["signup_event_id"], r["p_event_id"])
        for r in _batch_pairs(spark, events_src).collect()
    }
    assert {
        (r["signup_event_id"], r["p_event_id"]) for r in matched.collect()
    } == inner
    # every signup with zero matches shows up exactly once with NULLs
    assert unmatched.select("signup_event_id").distinct().count() == unmatched.count()
    # A NULL row is emitted only once the watermark PROVES no match can
    # arrive. The heartbeat pass pushed both watermarks past every
    # original signup's horizon, so coverage is now EXACT: every original
    # signup resolved matched or unmatched; only the far-future heartbeat
    # signup itself stays pending inside its own horizon.
    all_signups = {
        r["event_id"]
        for r in spark.read.parquet(events_src)
        .filter(F.col("event_type") == "signup")
        .select("event_id")
        .collect()
    }
    matched_ids = {r["signup_event_id"] for r in matched.collect()}
    unmatched_ids = {r["signup_event_id"] for r in unmatched.collect()}
    assert unmatched_ids.isdisjoint(matched_ids)
    assert unmatched_ids == all_signups - matched_ids
    assert len(matched_ids) + len(unmatched_ids) == n_signups

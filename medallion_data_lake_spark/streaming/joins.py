"""Stream-stream joins with watermark-bounded state (§2.9).

The reference's streaming layer is a single-topic consumer loop
(``kafka_to_bronze.py:36-93``) — correlating two live streams is outside
its vocabulary entirely. Structured Streaming expresses it declaratively:
both sides carry an event-time watermark, the join condition carries an
explicit TIME RANGE alongside the equi key, and from those two facts the
engine derives exactly how long each side's rows must be buffered before
they can never match again — bounded state, no manual eviction code.

This module instantiates the pattern on the events table's canonical
funnel: signups joined to the purchases that follow within an
attribution window, per user (the streaming twin of the batch query
``purchases_within_hour_of_signup`` — queries/streamlike.py — which is
its oracle in tests/test_streaming_joins.py).

Scale notes (the part that matters at 1000 executors):
- state size is O(rows inside the watermark horizon) per side, NOT
  O(stream history): a signup older than ``window + watermark`` can
  never gain another match and is dropped by the state store;
- the equi key (``user_id``) keeps the join a shuffled hash join on
  key — the range predicate is a residual filter, never a cross
  product, same plan discipline as the batch interval join;
- both sides shuffle once on the key into the same state store
  partitioning; ``spark.sql.shuffle.partitions`` at stream START fixes
  the state partition count (size it to throughput, it cannot be
  re-planned later — same caveat as events.hourly_rollup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_funnel_streams(
    events: DataFrame,
    watermark: str = "2 hours",
) -> tuple[DataFrame, DataFrame]:
    """One events stream → (signups, purchases) sides, each watermarked.

    Filtering a single source twice is the standard Spark idiom for a
    self-join of a stream: both branches share the source scan, and each
    carries its OWN watermark column (renamed, so the join condition can
    reference the two clocks independently)."""
    signups = (
        events.filter(F.col("event_type") == "signup")
        .select(
            F.col("event_id").alias("signup_event_id"),
            F.col("user_id").alias("s_user"),
            F.col("ts").alias("signup_ts"),
        )
        .withWatermark("signup_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("p_event_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    return signups, purchases


def purchase_attribution_join(
    signups: DataFrame,
    purchases: DataFrame,
    window: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream join: each signup paired with every
    purchase by the same user inside ``(signup_ts, signup_ts + window]``.

    The time-range condition is load-bearing, not cosmetic: it is what
    lets the engine expire state (a purchase can only match signups at
    most ``window`` older; a signup only purchases at most ``window``
    newer). ``how='left_outer'`` additionally emits unmatched signups
    with NULL purchase columns — but only once the watermark proves no
    match can still arrive, which is the semantic difference between a
    streaming outer join and a batch one.
    """
    cond = (
        (F.col("p_user") == F.col("s_user"))
        & (F.col("p_ts") > F.col("signup_ts"))
        & (F.col("p_ts") <= F.col("signup_ts") + F.expr(f"INTERVAL {window}"))
    )
    return signups.join(purchases, cond, how).select(
        "signup_event_id",
        F.col("s_user").alias("user_id"),
        "signup_ts",
        "p_event_id",
        "p_ts",
        F.when(
            F.col("p_ts").isNotNull(),
            (F.unix_micros(F.col("p_ts")) - F.unix_micros(F.col("signup_ts")))
            / F.lit(1_000_000),
        ).alias("seconds_to_purchase"),
    )

"""Event-stream analytics in their batch-equivalent form.

The reference micro-batches streams by hand (SURVEY.md §2.9) and has no
event-time windows; our engine's streaming layer (streaming/events.py)
runs these same aggregations as Structured Streaming with watermarks.
Here each is expressed as a batch query over the ``events`` fixture so
the DuckDB oracle can verify the window semantics — Structured
Streaming's availableNow output over the same input must equal these
results (asserted in tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_star_table
from . import query
from ._parity import money_sum, sql_money_sum, sql_stable_round, stable_round

SESSION_GAP_MIN = 30
SQL_SUM_VALUE = sql_money_sum("value")
_SQL_RUNNING = sql_stable_round(
    "CAST(SUM(CAST(value AS DECIMAL(18,6))) "
    "OVER (PARTITION BY user_id ORDER BY ts, event_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)", 2
)


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_star_table(spark, sf_dir, "events")


@query(
    "events_hourly_windows",
    oracle=f"""
    SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT)        AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           {SQL_SUM_VALUE}                 AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Tumbling event-time window agg (streaming analog of A3; "
        "SURVEY.md §2.9 mapping). Batch form of "
        "streaming/events.py::hourly_rollup — epoch-aligned 1h buckets, "
        "identical to F.window(ts, '1 hour').",
    tags=("streaming",),
    extra=True,  # r10 rotation (gated r1-r9, green): calendar buckets stay gated
    # via customer_order_histogram; streaming batch-twin evidence via
    # purchases_within_hour_of_signup + signup_view_purchase_funnel
)
def events_hourly_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _events(spark, sf_dir)
        .groupBy(
            F.window("ts", "1 hour").start.alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            money_sum("value").alias("total_value"),
        )
    )


@query(
    "user_running_totals",
    oracle=f"""
    SELECT event_id, user_id, ts,
           {_SQL_RUNNING} AS running_value
    FROM events
    """,
    doc="Cumulative per-user running total — explicit-frame window "
        "(rowsBetween), the frame-spec capability the reference never uses "
        "(SURVEY.md §2.5). Partitioned by user; ordered summation is "
        "deterministic in both engines.",
    tags=("streaming",),
    # re-gated r11 (oldest-first veteran sweep, r10 verdict #5: gated
    # r1-r3, out since the r4 rotation via sequence_packing_plan twin)
)
def user_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return _events(spark, sf_dir).select(
        "event_id",
        "user_id",
        "ts",
        stable_round(F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double"), 2).alias("running_value"),
    )


@query(
    "user_sessionization",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL {SESSION_GAP_MIN} MINUTES
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sessions AS (
      SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM flagged
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM sessions
    GROUP BY user_id, session_seq
    """,
    doc=f"Gap-based sessionization ({SESSION_GAP_MIN}-min inactivity): "
        "lag-gap flag + running count = session id, then per-session "
        "rollup. Batch analog of a session window "
        "(F.session_window / applyInPandasWithState in the streaming "
        "layer). All windows partitioned by user — no global ordering.",
    tags=("streaming",),
    extra=True,  # r9 rotation (gated r1-r8, green): streaming batch-twin family stays
    # driver-gated via events_hourly_windows + purchases_within_hour_of_signup
    # + weekly_retention_cohorts
)
def user_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_ts = F.lag("ts").over(w)
    gap_expr = prev_ts.isNull() | (
        (F.col("ts") - prev_ts) > F.expr(f"INTERVAL {SESSION_GAP_MIN} MINUTES")
    )
    return (
        _events(spark, sf_dir)
        .withColumn("new_session", F.when(gap_expr, 1).otherwise(0))
        .withColumn("session_seq", F.sum("new_session").over(run))
        .groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


# ---------------------------------------------------------------------------
# As-of join (operator Spark lacks natively — composed from a partitioned
# window; north-star brief: "as-of join, range join" as custom operators)
# ---------------------------------------------------------------------------

@query(
    "asof_last_view_before_purchase",
    oracle="""
    SELECT event_id, user_id, ts,
           last_view_ts,
           CASE WHEN last_view_ts IS NOT NULL
                THEN CAST(date_diff('microseconds', last_view_ts, ts) // 1000000 AS BIGINT)
                END AS seconds_since_view
    FROM (
      SELECT event_id, user_id, ts, event_type,
             MAX(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_view_ts
      FROM events
    )
    WHERE event_type = 'purchase'
    """,
    doc="AS-OF join composed from DataFrame ops (no native Spark operator): "
        "each purchase matched to the most recent PRIOR view by the same "
        "user via a conditional running max over a partitioned ordered "
        "window — one shuffle on the partition key, no row explosion, the "
        "standard Spark formulation of time-series as-of semantics. First "
        "purchase before any view → NULL (no match).",
    tags=("streaming",),
    extra=True,  # r8 rotation: time-interval join semantics stay
    # driver-gated via purchases_within_hour_of_signup; sessionization
    # via user_sessionization
)
def asof_last_view_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_view = F.max(
        F.when(F.col("event_type") == "view", F.col("ts"))
    ).over(w)
    return (
        _events(spark, sf_dir)
        .withColumn("last_view_ts", last_view)
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            "ts",
            "last_view_ts",
            F.when(
                F.col("last_view_ts").isNotNull(),
                F.expr(
                    # whole seconds between the two NTZ instants: micro
                    # difference floored — NTZ has no direct long cast
                    "(unix_micros(cast(ts as timestamp)) - "
                    "unix_micros(cast(last_view_ts as timestamp))) div 1000000"
                ),
            ).alias("seconds_since_view"),
        )
    )


# ---------------------------------------------------------------------------
# Interval/range join (non-equi predicate alongside an equi key)
# ---------------------------------------------------------------------------

@query(
    "purchases_within_hour_of_signup",
    oracle="""
    SELECT s.event_id                 AS signup_event_id,
           s.user_id,
           s.ts                       AS signup_ts,
           CAST(COUNT(p.event_id) AS BIGINT) AS purchases_within_1h
    FROM events s
      LEFT JOIN events p
        ON p.user_id = s.user_id
       AND p.event_type = 'purchase'
       AND p.ts > s.ts
       AND p.ts <= s.ts + INTERVAL 1 HOUR
    WHERE s.event_type = 'signup'
    GROUP BY s.event_id, s.user_id, s.ts
    """,
    doc="Range (interval) join: equi key (user) + time-window predicate — "
        "purchases within one hour after each signup. The equi key keeps "
        "it a hash join with a residual range filter (never a cross "
        "product); at scale, bucketing both sides by the key plus "
        "time-partition pruning bounds each probe.",
    tags=("streaming",),
    extra=True,  # r11 rotation (gated r1-r10, green): time-interval join
    # family stays gated via signup_view_purchase_funnel +
    # weekly_retention_cohorts; running-sum via user_running_totals
    # (re-gated this round)
)
def purchases_within_hour_of_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir)
    signups = e.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_event_id"),
        F.col("user_id").alias("s_user"),
        F.col("ts").alias("signup_ts"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_event_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    joined = signups.join(
        purchases,
        (F.col("p_user") == F.col("s_user"))
        & (F.col("p_ts") > F.col("signup_ts"))
        & (F.col("p_ts") <= F.col("signup_ts") + F.expr("INTERVAL 1 HOUR")),
        "left",
    )
    return (
        joined.groupBy("signup_event_id", "s_user", "signup_ts")
        .agg(F.count("p_event_id").alias("purchases_within_1h"))
        .select(
            "signup_event_id",
            F.col("s_user").alias("user_id"),
            "signup_ts",
            "purchases_within_1h",
        )
    )


# ---------------------------------------------------------------------------
# Hypertable-style cascading rollup (continuous-aggregate pattern)
# ---------------------------------------------------------------------------

@query(
    "events_cascading_rollup",
    oracle=f"""
    WITH hourly AS (
      SELECT time_bucket(INTERVAL 1 HOUR, ts) AS h, event_type,
             COUNT(*) AS n,
             SUM(CAST(value AS DECIMAL(18,6))) AS v
      FROM events GROUP BY 1, 2
    )
    SELECT time_bucket(INTERVAL 1 DAY, h) AS day_start, event_type,
           CAST(SUM(n) AS BIGINT) AS n_events,
           {sql_stable_round("CAST(SUM(v) AS DOUBLE)", 2)} AS total_value,
           CAST(COUNT(*) AS BIGINT) AS n_hourly_buckets
    FROM hourly
    GROUP BY 1, 2
    """,
    doc="Hypertable-style cascading rollup (continuous-aggregate pattern): "
        "the DAY aggregate is computed by MERGING hour-level partials, not "
        "by rescanning raw events — counts and exact decimal sums are "
        "mergeable state, so each coarser granularity costs only the finer "
        "rollup's size. This is the maintenance pattern for materialized "
        "time hierarchies at 100 TB (hour partials persist; day/month "
        "reaggregate from them incrementally).",
    tags=("streaming",),
    # re-gated r12 (out since r6 — oldest-first rotation)
)
def events_cascading_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ._parity import DEC

    hourly = (
        _events(spark, sf_dir)
        .groupBy(F.window("ts", "1 hour").start.alias("h"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast(DEC)).alias("v"),
        )
    )
    return (
        hourly.groupBy(F.window("h", "1 day").start.alias("day_start"), "event_type")
        .agg(
            F.sum("n").cast("long").alias("n_events"),
            stable_round(F.sum("v").cast("double"), 2).alias("total_value"),
            F.count(F.lit(1)).alias("n_hourly_buckets"),
        )
    )


# ---------------------------------------------------------------------------
# Funnel analysis: ordered-stage conversion over the event stream
# ---------------------------------------------------------------------------

@query(
    "signup_view_purchase_funnel",
    oracle="""
    WITH s AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    v AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'view' AND e.ts > s.t1
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'purchase' AND e.ts > v.t2
      GROUP BY e.user_id
    )
    SELECT CAST((SELECT COUNT(*) FROM s) AS BIGINT) AS n_signup,
           CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_signup_then_view,
           CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_full_funnel
    """,
    doc="Ordered-stage funnel: users who signed up, then viewed AFTER "
        "the signup, then purchased AFTER that view — the product-"
        "analytics conversion query. One scan of events (filtered to the "
        "three stage types) + three chained whole-partition window mins "
        "on user_id: t1 = min signup ts, t2 = min view ts > t1, "
        "t3 = min purchase ts > t2 — each stage frontier constrains the "
        "next inside the SAME user partitioning, so the whole funnel is "
        "one exchange + one sort; the per-user reduce reuses that "
        "partitioning and only three counts cross the final single-"
        "partition exchange. (r16, guide §2.4: the previous form built "
        "each stage as agg-join-agg and re-built the s/v subtrees under "
        "every count branch — 6 scans of events, 8 exchanges.)",
    tags=("streaming",),
    # re-gated r14 (gated r9-r12, out since the r13 rotation — oldest-first sweep)
)
def signup_view_purchase_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id")
    staged = (
        _events(spark, sf_dir)
        # only the three stage types participate anywhere in the funnel
        .filter(F.col("event_type").isin("signup", "view", "purchase"))
        .select("user_id", "event_type", "ts")
        .withColumn(
            "t1",
            F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w),
        )
        .withColumn(
            "t2",
            F.min(
                F.when(
                    (F.col("event_type") == "view") & (F.col("ts") > F.col("t1")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "t3",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("t2")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.min("t1").alias("t1"),
        F.min("t2").alias("t2"),
        F.min("t3").alias("t3"),
    )
    return per_user.agg(
        F.count("t1").alias("n_signup"),
        F.count("t2").alias("n_signup_then_view"),
        F.count("t3").alias("n_full_funnel"),
    )


# ---------------------------------------------------------------------------
# Retention cohorts: signup-week cohort × weeks-since activity matrix
# ---------------------------------------------------------------------------

@query(
    "weekly_retention_cohorts",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id,
             f.cohort_week,
             CAST(date_diff('week', f.cohort_week,
                            date_trunc('week', e.ts)) AS BIGINT) AS weeks_since
      FROM events e JOIN first_seen f ON e.user_id = f.user_id
    )
    SELECT cohort_week, weeks_since,
           CAST(COUNT(*) AS BIGINT) AS n_active_users
    FROM activity
    GROUP BY cohort_week, weeks_since
    """,
    doc="Retention matrix: users bucketed by first-seen week (cohort), "
        "counted once per (cohort, weeks-since-first) they were active — "
        "the churn/retention curve per cohort. One agg for the cohort "
        "frontier, a keyed join back, and a distinct-per-cell count that "
        "Catalyst plans as two-stage aggregation on (cohort, week, user) "
        "— both shuffles on user_id or the small cohort grid, fact "
        "scanned twice (frontier + activity); at scale the frontier "
        "table persists and only the activity pass reruns per refresh.",
    tags=("streaming",),
    # driver-gated since r4 (supplier_customer_nation_volume rotated out)
    # re-gated r13 (gated r4-r11, out since the r12 rotation — oldest-first sweep)
)
def weekly_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    e = _events(spark, sf_dir)
    # first-seen via a WINDOW over the one events scan — the aggregate+
    # join-back form scanned events twice for the same user_id exchange
    w = Window.partitionBy("user_id")
    activity = (
        e.select(
            "user_id",
            F.date_trunc("week", F.min("ts").over(w)).alias("cohort_week"),
            F.date_trunc("week", F.col("ts")).alias("_wk"),
        )
        .select(
            "user_id",
            "cohort_week",
            (F.datediff(F.col("_wk"), F.col("cohort_week")) / 7)
            .cast("long").alias("weeks_since"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "weeks_since").agg(
        F.count(F.lit(1)).alias("n_active_users")
    )

"""Silver → gold analytics builders.

The reference's four gold tables (SURVEY.md §1.5, reference
``sakila-data-lake/silver_to_gold.py``) re-expressed with the scale fixes
from SURVEY.md §4.3 and §7.5:

- windows are computed on pre-aggregated or partitioned data, never the
  reference's unpartitioned ``Window.orderBy`` over raw rows
  (``silver_to_gold.py:123,150``),
- ``film_performance`` uses the *correct* film→inventory→rental chain;
  the reference joins ``f.film_id == r.inventory_id`` as written
  (``silver_to_gold.py:92``) — a defined-but-wrong semantic we fix and
  document (SURVEY.md §7.5),
- money sums go through exact decimal aggregation (queries/_parity.py
  rationale) rather than raw double sums.

Each builder takes silver DataFrames and returns the gold DataFrame;
writers live in sources/sinks.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..queries._parity import dsum

# Reference tier ladder (silver_to_gold.py:69-74), original thresholds.
SAKILA_TIERS = (200.0, 100.0, 50.0)


def _money(col) -> F.Column:  # exact sum → display double
    return F.round(dsum(col).cast("double"), 2)


def customer_summary(
    customer: DataFrame,
    payment: DataFrame,
    rental: DataFrame,
    tiers: tuple[float, float, float] = SAKILA_TIERS,
) -> DataFrame:
    """Per-customer lifetime metrics + value tier.

    Reference ``silver_to_gold.py:53-77`` (J1 3-way left join, A1 aggs,
    P5 tier CASE). Join keys are customer_id; both fact sides shuffle on
    it once, the dim side is the grouping side.
    """
    premium, gold, silver = tiers
    # Pre-aggregate each fact side BEFORE joining. The reference joins
    # customer⟕payment⟕rental row-level and then aggregates
    # (silver_to_gold.py:53-68) — a fan-out: a customer with P payments
    # and R rentals contributes P×R joined rows, inflating sums by R×.
    # Pre-aggregation fixes the semantics AND the scale profile: each
    # fact shuffles once on customer_id at its own cardinality, and the
    # final join is dim-sized. (Documented divergence, SURVEY.md §7.5.)
    pay_agg = payment.groupBy(F.col("customer_id")).agg(
        F.count("payment_id").alias("total_payments"),
        _money(F.col("amount")).alias("total_spent"),
        F.round(
            dsum(F.col("amount")).cast("double") / F.count("payment_id"), 2
        ).alias("avg_payment_amount"),
        F.max("payment_date").alias("last_payment_date"),
    )
    rent_agg = rental.groupBy(F.col("customer_id")).agg(
        F.count("rental_id").alias("total_rentals"),
        F.max("rental_date").alias("last_rental_date"),
    )
    agg = (
        customer.select("customer_id", "email", "active")
        .join(pay_agg, "customer_id", "left")
        .join(rent_agg, "customer_id", "left")
        .select(
            "customer_id",
            "email",
            "active",
            F.coalesce("total_payments", F.lit(0)).alias("total_payments"),
            "total_spent",
            "avg_payment_amount",
            F.coalesce("total_rentals", F.lit(0)).alias("total_rentals"),
            "last_payment_date",
            "last_rental_date",
        )
    )
    tier = (
        F.when(F.col("total_spent") >= premium, "Premium")
        .when(F.col("total_spent") >= gold, "Gold")
        .when(F.col("total_spent") >= silver, "Silver")
        .otherwise("Bronze")
    )
    return agg.withColumn("customer_value_tier", tier).withColumn(
        "created_at", F.current_timestamp()
    )


def film_performance(
    film: DataFrame,
    inventory: DataFrame,
    rental: DataFrame,
    payment: DataFrame,
) -> DataFrame:
    """Per-film rental/revenue metrics + popularity rank.

    Corrected join chain film→inventory→rental→payment (the reference
    skips the inventory hop, ``silver_to_gold.py:92`` — see module doc).
    The global popularity rank is computed on the *aggregated* per-film
    rollup (one row per film), so the unpartitioned window touches
    thousands of rows, not the raw fact table (fixes
    ``silver_to_gold.py:122-124`` / SURVEY.md §4.3.1).
    """
    agg = (
        film.alias("f")
        .join(inventory.alias("i"), F.col("f.film_id") == F.col("i.film_id"), "left")
        .join(rental.alias("r"), F.col("i.inventory_id") == F.col("r.inventory_id"), "left")
        .join(payment.alias("p"), F.col("r.rental_id") == F.col("p.rental_id"), "left")
        .groupBy(
            F.col("f.film_id").alias("film_id"),
            F.col("f.title").alias("title"),
            F.col("f.release_year").alias("release_year"),
            F.col("f.rental_rate").alias("rental_rate"),
            F.col("f.rental_duration").alias("rental_duration"),
        )
        .agg(
            F.countDistinct("r.rental_id").alias("total_rentals"),
            _money(F.col("p.amount")).alias("total_revenue"),
            F.round(
                dsum(F.col("p.amount")).cast("double") / F.countDistinct("r.rental_id"), 2
            ).alias("avg_revenue_per_rental"),
            F.countDistinct("r.customer_id").alias("unique_customers"),
        )
    )
    # revenue_per_day guarded by a 1-day floor (reference :114-121)
    days = F.greatest(
        F.datediff(F.current_date(), F.to_date(F.col("release_year").cast("string"), "yyyy")),
        F.lit(1),
    )
    ranked = agg.withColumn(
        "revenue_per_day", F.round(F.col("total_revenue") / days, 4)
    ).withColumn(
        "popularity_rank",
        F.row_number().over(
            Window.orderBy(F.desc("total_rentals"), F.asc("film_id"))
        ),
    )
    return ranked.withColumn("created_at", F.current_timestamp())


def daily_revenue(payment: DataFrame) -> DataFrame:
    """Daily transaction rollup + day-over-day growth.

    Reference ``silver_to_gold.py:139-156`` (A3 + W2). The lag window is
    unpartitioned *by design* but runs on the daily rollup — bounded rows
    at any raw scale (SURVEY.md §4.3.1).
    """
    daily = (
        payment.groupBy(F.to_date("payment_date").alias("payment_date"))
        .agg(
            F.count(F.lit(1)).alias("total_transactions"),
            _money(F.col("amount")).alias("total_revenue"),
            F.round(dsum(F.col("amount")).cast("double") / F.count(F.lit(1)), 2).alias(
                "avg_transaction_amount"
            ),
            F.min("amount").alias("min_transaction"),
            F.max("amount").alias("max_transaction"),
        )
    )
    prev = F.lag("total_revenue").over(Window.orderBy("payment_date"))
    return (
        daily.withColumn(
            "revenue_growth",
            F.round((F.col("total_revenue") - prev) / prev * 100, 2),
        )
        .withColumn("created_at", F.current_timestamp())
        .orderBy("payment_date")
    )


def rental_trends(rental: DataFrame) -> DataFrame:
    """Calendar-bucket rental trends (reference ``silver_to_gold.py:168-182``)."""
    return (
        rental.groupBy(
            F.year("rental_date").alias("year"),
            F.month("rental_date").alias("month"),
            F.dayofweek("rental_date").alias("day_of_week"),
        )
        .agg(
            F.count(F.lit(1)).alias("total_rentals"),
            F.countDistinct("customer_id").alias("unique_customers"),
            F.round(
                F.avg(F.datediff("return_date", "rental_date")), 2
            ).alias("avg_rental_duration"),
        )
        .withColumn("created_at", F.current_timestamp())
    )

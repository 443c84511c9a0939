"""End-to-end medallion tests: bronze JSON fixtures → silver → gold.

Exercises the cleaning rules' edge cases from SURVEY.md §5.2: duplicate
PKs, null keys, whitespace emails, negative amount clamp, tier
boundaries, lag-first-row null, division guards.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from medallion_data_lake_spark.operators import gold
from medallion_data_lake_spark.operators.cleaning import SAKILA_RULES, conform
from medallion_data_lake_spark.sources.batch import read_bronze_json, split_corrupt


def _envelope(table, op, ts, data):
    return json.dumps({"table": table, "operation": op, "timestamp": ts, "data": data})


@pytest.fixture(scope="module")
def bronze_customer_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("bronze") / "customer"
    p.mkdir()
    lines = [
        # duplicate PK: UPDATE with later ts must win (deterministic dedup)
        _envelope("customer", "INSERT", "2024-01-01T10:00:00",
                  {"customer_id": "1", "store_id": "1", "first_name": "Ann",
                   "last_name": "A", "email": "  Ann@X.com ", "address_id": "5",
                   "active": "1", "create_date": "2024-01-01 09:00:00",
                   "last_update": "2024-01-01 09:00:00"}),
        _envelope("customer", "UPDATE", "2024-01-02T10:00:00",
                  {"customer_id": "1", "store_id": "1", "first_name": "Anna",
                   "last_name": "A", "email": "ann.new@x.com", "address_id": "5",
                   "active": "1", "create_date": "2024-01-01 09:00:00",
                   "last_update": "2024-01-02 09:00:00"}),
        # null email -> dropped
        _envelope("customer", "INSERT", "2024-01-01T11:00:00",
                  {"customer_id": "2", "store_id": "1", "first_name": "Bob",
                   "last_name": "B", "email": None, "address_id": "6",
                   "active": "0", "create_date": "2024-01-01 09:00:00",
                   "last_update": "2024-01-01 09:00:00"}),
        # normal row
        _envelope("customer", "INSERT", "2024-01-01T12:00:00",
                  {"customer_id": "3", "store_id": "2", "first_name": "Cy",
                   "last_name": "C", "email": "cy@x.com", "address_id": "7",
                   "active": "true", "create_date": "2024-01-02 09:00:00",
                   "last_update": "2024-01-02 09:00:00"}),
        # malformed JSON -> quarantined, not dropped silently
        '{"table": "customer", "operation": "INSERT", broken',
    ]
    (p / "part-000.json").write_text("\n".join(lines))
    return str(p)


def test_bronze_read_quarantines_corrupt(spark, bronze_customer_path):
    df = read_bronze_json(spark, bronze_customer_path, "customer")
    clean, corrupt = split_corrupt(df)
    assert corrupt.count() == 1
    assert clean.count() == 4


def test_conform_customer_rules(spark, bronze_customer_path):
    clean, _ = split_corrupt(read_bronze_json(spark, bronze_customer_path, "customer"))
    silver = conform(clean, SAKILA_RULES["customer"])
    rows = {r["customer_id"]: r for r in silver.collect()}

    # duplicate PK: the later envelope (UPDATE) won deterministically
    assert set(rows) == {1, 3}
    assert rows[1]["email"] == "ANN.NEW@X.COM"  # upper(trim) + latest wins
    # null email row dropped; 'true' active cast -> int is None or 1?
    assert rows[3]["email"] == "CY@X.COM"
    # types conformed
    assert silver.schema["customer_id"].dataType.typeName() == "long"
    assert silver.schema["active"].dataType.typeName() == "integer"
    assert silver.schema["create_date"].dataType.typeName() == "timestamp"
    assert "processed_date" in silver.columns


def test_conform_payment_clamps_negative(spark):
    data = [
        {"table": "payment", "operation": "INSERT", "timestamp": "2024-01-01T00:00:00",
         "data": {"payment_id": "1", "customer_id": "1", "staff_id": "1",
                  "rental_id": "1", "amount": "-5.00",
                  "payment_date": "2024-01-01 00:00:00",
                  "last_update": "2024-01-01 00:00:00"}},
        {"table": "payment", "operation": "INSERT", "timestamp": "2024-01-01T00:00:00",
         "data": {"payment_id": "2", "customer_id": "1", "staff_id": "1",
                  "rental_id": "2", "amount": "7.50",
                  "payment_date": "2024-01-02 00:00:00",
                  "last_update": "2024-01-02 00:00:00"}},
    ]
    from medallion_data_lake_spark.schemas import BRONZE_PAYLOADS, envelope_schema

    bronze = spark.createDataFrame(
        [json.dumps(d) for d in data], "string"
    ).select(F.from_json("value", envelope_schema(BRONZE_PAYLOADS["payment"])).alias("e")).select("e.*")
    silver = conform(bronze, SAKILA_RULES["payment"])
    amounts = {r["payment_id"]: r["amount"] for r in silver.collect()}
    assert amounts == {1: 0.0, 2: 7.5}  # clamp, not drop (reference :103)


@pytest.fixture(scope="module")
def silver_fixtures(spark):
    customer = spark.createDataFrame(
        [(1, "a@x.com", 1), (2, "b@x.com", 1), (3, "c@x.com", 0), (4, "d@x.com", 1)],
        "customer_id long, email string, active int",
    )
    # tier boundaries: exactly 200 -> Premium, exactly 100 -> Gold,
    # exactly 50 -> Silver, below -> Bronze (reference silver_to_gold.py:69-74)
    payment = spark.createDataFrame(
        [
            (1, 1, 1, "2024-01-01 10:00:00", 200.0),
            (2, 2, 2, "2024-01-01 11:00:00", 100.0),
            (3, 3, 3, "2024-01-02 10:00:00", 50.0),
            (4, 4, 4, "2024-01-02 11:00:00", 49.99),
            (5, 1, 5, "2024-01-03 10:00:00", 0.0),
        ],
        "payment_id long, customer_id long, rental_id long, payment_date_s string, amount double",
    ).withColumn("payment_date", F.to_timestamp("payment_date_s")).drop("payment_date_s")
    rental = spark.createDataFrame(
        [
            (1, 1, 101, "2024-01-01 09:00:00", "2024-01-03 09:00:00"),
            (2, 2, 102, "2024-01-01 10:00:00", "2024-01-06 10:00:00"),
            (3, 3, 103, "2024-01-02 09:00:00", None),
            (5, 1, 104, "2024-01-03 09:00:00", "2024-01-04 09:00:00"),
        ],
        "rental_id long, customer_id long, inventory_id long, rental_date_s string, return_date_s string",
    ).withColumn("rental_date", F.to_timestamp("rental_date_s")).withColumn(
        "return_date", F.to_timestamp("return_date_s")
    ).drop("rental_date_s", "return_date_s")
    film = spark.createDataFrame(
        [(10, "FILM A", 2006, 2.99, 5), (11, "FILM B", None, 0.99, 3)],
        "film_id long, title string, release_year int, rental_rate double, rental_duration int",
    )
    inventory = spark.createDataFrame(
        [(101, 10), (102, 10), (103, 11), (104, 11)],
        "inventory_id long, film_id long",
    )
    return {"customer": customer, "payment": payment, "rental": rental,
            "film": film, "inventory": inventory}


def test_customer_summary_tiers(spark, silver_fixtures):
    g = gold.customer_summary(
        silver_fixtures["customer"], silver_fixtures["payment"], silver_fixtures["rental"]
    )
    rows = {r["customer_id"]: r for r in g.collect()}
    assert rows[1]["customer_value_tier"] == "Premium"   # 200.0 at boundary
    assert rows[2]["customer_value_tier"] == "Gold"      # 100.0 at boundary
    assert rows[3]["customer_value_tier"] == "Silver"    # 50.0 at boundary
    assert rows[4]["customer_value_tier"] == "Bronze"    # 49.99 below
    assert rows[1]["total_payments"] == 2
    assert rows[1]["total_spent"] == 200.0
    assert rows[1]["total_rentals"] == 2


def test_film_performance_joins_through_inventory(spark, silver_fixtures):
    g = gold.film_performance(
        silver_fixtures["film"], silver_fixtures["inventory"],
        silver_fixtures["rental"], silver_fixtures["payment"],
    )
    rows = {r["film_id"]: r for r in g.collect()}
    # film 10 owns inventory 101,102 -> rentals 1,2; film 11 owns 103,104 -> rentals 3,5
    assert rows[10]["total_rentals"] == 2
    assert rows[11]["total_rentals"] == 2
    # rank deterministic with film_id tiebreak
    assert {rows[10]["popularity_rank"], rows[11]["popularity_rank"]} == {1, 2}
    # null release_year -> revenue_per_day guarded (no divide-by-null crash)
    assert rows[11]["revenue_per_day"] is None or rows[11]["revenue_per_day"] >= 0


def test_daily_revenue_growth_first_row_null(spark, silver_fixtures):
    g = gold.daily_revenue(silver_fixtures["payment"]).collect()
    assert g[0]["revenue_growth"] is None  # lag over first row
    assert g[0]["total_revenue"] == 300.0
    assert g[1]["total_revenue"] == 99.99
    assert g[1]["revenue_growth"] == round((99.99 - 300.0) / 300.0 * 100, 2)


def test_rental_trends_null_return_date(spark, silver_fixtures):
    g = gold.rental_trends(silver_fixtures["rental"]).collect()
    # avg_rental_duration ignores null return_date rows (Spark avg skips nulls)
    total = sum(r["total_rentals"] for r in g)
    assert total == 4

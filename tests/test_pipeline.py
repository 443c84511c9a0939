"""Full-pipeline orchestration test: bronze fixtures → silver → gold →
catalog → reconciliation, through pipeline.run_pipeline."""

from __future__ import annotations

import json
import os

import pytest

from medallion_data_lake_spark.pipeline import reconcile, run_pipeline


def _env(table, op, ts, data):
    return json.dumps({"table": table, "operation": op, "timestamp": ts, "data": data})


@pytest.fixture(scope="module")
def bronze_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("lake_bronze")
    specs = {
        "customer": [
            {"customer_id": str(i), "store_id": "1", "first_name": f"F{i}",
             "last_name": f"L{i}", "email": f"c{i}@x.com", "address_id": "1",
             "active": "1", "create_date": "2024-01-01 00:00:00",
             "last_update": "2024-01-01 00:00:00"}
            for i in range(1, 6)
        ],
        "film": [
            {"film_id": str(i), "title": f"FILM {i}", "description": "d",
             "release_year": "2006", "language_id": "1", "rental_duration": "5",
             "rental_rate": "2.99", "length": "90", "replacement_cost": "19.99",
             "rating": "PG", "special_features": "Trailers",
             "last_update": "2024-01-01 00:00:00"}
            for i in range(1, 4)
        ],
        "payment": [
            {"payment_id": str(i), "customer_id": str(i % 5 + 1), "staff_id": "1",
             "rental_id": str(i), "amount": str(round(5 + i * 1.25, 2)),
             "payment_date": f"2024-01-{i % 28 + 1:02d} 10:00:00",
             "last_update": "2024-01-01 00:00:00"}
            for i in range(1, 31)
        ],
        "rental": [
            {"rental_id": str(i), "rental_date": f"2024-01-{i % 28 + 1:02d} 09:00:00",
             "inventory_id": str(i % 3 + 1), "customer_id": str(i % 5 + 1),
             "return_date": f"2024-01-{i % 28 + 2:02d} 09:00:00", "staff_id": "1",
             "last_update": "2024-01-01 00:00:00"}
            for i in range(1, 31)
        ],
        "inventory": [
            {"inventory_id": str(i), "film_id": str(i % 3 + 1), "store_id": "1",
             "last_update": "2024-01-01 00:00:00"}
            for i in range(1, 4)
        ],
    }
    for table, rows in specs.items():
        d = root / table / "year=2024" / "month=1" / "day=1"
        d.mkdir(parents=True)
        (d / "batch.json").write_text(
            "\n".join(_env(table, "INSERT", "2024-01-01T00:00:00", r) for r in rows)
        )
    return str(root)


def test_run_pipeline_end_to_end(spark, bronze_root, tmp_path_factory):
    silver_root = str(tmp_path_factory.mktemp("lake_silver"))
    gold_root = str(tmp_path_factory.mktemp("lake_gold"))
    result = run_pipeline(spark, bronze_root, silver_root, gold_root)

    stages = {(s["stage"], s["table"]): s for s in result["report"]["stages"]}
    assert stages[("silver", "customer")]["rows"] == 5
    assert stages[("silver", "payment")]["rows"] == 30
    assert stages[("gold", "customer_summary")]["rows"] == 5
    assert stages[("gold", "daily_revenue")]["rows"] > 0
    # all FOUR reference gold tables, including the inventory-dependent
    # film_performance (one row per film)
    assert stages[("gold", "film_performance")]["rows"] == 3
    # catalog has every layer registered with the layer-prefix convention
    assert "silver_payment" in result["tables"]["silver"]
    assert "gold_customer_summary" in result["tables"]["gold"]
    # queryable through SQL immediately
    n = spark.sql("SELECT COUNT(*) c FROM gold_customer_summary").collect()[0]["c"]
    assert n == 5
    # no corrupt rows in this fixture
    assert all(s["corrupt_rows"] == 0 for s in result["report"]["stages"] if s["stage"] == "silver")

    rec = {r["layer"]: r for r in reconcile(spark, bronze_root, silver_root, "payment", "amount").collect()}
    assert rec["bronze"]["record_count"] == rec["silver"]["record_count"] == 30
    assert rec["bronze"]["total_amount"] == rec["silver"]["total_amount"]


def test_cli_sql_over_fixtures(capsys):
    """CLI surface: sql verb over the mounted star fixtures."""
    from medallion_data_lake_spark.cli import main

    rc = main(["sql", "SELECT COUNT(*) AS n FROM orders", "--sf", "/root/testdata/sf0.001"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "1500" in out


def test_cli_tables_lists_fixture_views(capsys):
    from medallion_data_lake_spark.cli import main

    rc = main(["tables", "--sf", "/root/testdata/sf0.001"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "orders" in out and "lineitem" in out

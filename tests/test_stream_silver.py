"""Incremental streaming silver: bronze JSON stream → conformed parquet."""

from __future__ import annotations

import json

from medallion_data_lake_spark.operators.cleaning import SAKILA_RULES
from medallion_data_lake_spark.sources.stream import run_silver_stream


def _env(op, ts, data):
    return json.dumps(
        {"table": "payment", "operation": op, "timestamp": ts, "data": data}
    )


def _payment(i, amount):
    return {
        "payment_id": str(i), "customer_id": str(i % 3 + 1), "staff_id": "1",
        "rental_id": str(i), "amount": str(amount),
        "payment_date": "2024-01-05 10:00:00", "last_update": "2024-01-01 00:00:00",
    }


def test_incremental_silver_stream(spark, tmp_path_factory):
    bronze = tmp_path_factory.mktemp("sb") / "payment"
    silver = tmp_path_factory.mktemp("ss") / "payment"
    ck = tmp_path_factory.mktemp("sck")
    bronze.mkdir()

    # batch 1
    (bronze / "b1.json").write_text(
        "\n".join(_env("INSERT", "2024-01-01T00:00:00", _payment(i, 10.0 + i)) for i in range(5))
    )
    run_silver_stream(spark, str(bronze), str(silver), str(ck), SAKILA_RULES["payment"])
    assert spark.read.parquet(str(silver)).count() == 5

    # batch 2 arrives later (incl. a negative amount to clamp) — only the
    # NEW file is processed (checkpointed incremental, not overwrite-world)
    (bronze / "b2.json").write_text(
        "\n".join(
            [_env("INSERT", "2024-01-02T00:00:00", _payment(10, -7.5))]
            + [_env("INSERT", "2024-01-02T00:00:00", _payment(11, 42.0))]
        )
    )
    run_silver_stream(spark, str(bronze), str(silver), str(ck), SAKILA_RULES["payment"])
    out = spark.read.parquet(str(silver))
    assert out.count() == 7
    clamped = out.filter("payment_id = 10").collect()[0]
    assert clamped["amount"] == 0.0  # cleaning rules applied in-stream
    assert clamped["payment_date"] is not None  # timestamps conformed

    # re-run with nothing new: exactly-once no-op
    run_silver_stream(spark, str(bronze), str(silver), str(ck), SAKILA_RULES["payment"])
    assert spark.read.parquet(str(silver)).count() == 7


def test_schema_drift_tolerated(spark, tmp_path_factory):
    """Missing optional payload fields → nulls; extra fields → ignored
    (SURVEY.md §7.4.6: explicit schemas must tolerate ragged bronze)."""
    from medallion_data_lake_spark.sources.batch import read_bronze_json, split_corrupt
    from medallion_data_lake_spark.operators.cleaning import conform

    bronze = tmp_path_factory.mktemp("drift") / "payment"
    bronze.mkdir()
    rows = [
        # missing staff_id + last_update (drifted producer, old version)
        _env("INSERT", "2024-01-01T00:00:00",
             {"payment_id": "1", "customer_id": "2", "rental_id": "3",
              "amount": "5.0", "payment_date": "2024-01-01 00:00:00"}),
        # extra unknown field (drifted producer, new version)
        _env("INSERT", "2024-01-01T00:00:00",
             {**_payment(2, 6.0), "loyalty_points": "12"}),
    ]
    (bronze / "b.json").write_text("\n".join(rows))
    clean, corrupt = split_corrupt(read_bronze_json(spark, str(bronze), "payment"))
    assert corrupt.count() == 0  # drift is not corruption
    silver = conform(clean, SAKILA_RULES["payment"])
    got = {r["payment_id"]: r for r in silver.collect()}
    assert set(got) == {1, 2}
    assert got[1]["staff_id"] is None          # missing → null
    assert "loyalty_points" not in silver.columns  # extra → dropped by schema


def test_expect_or_quarantine_stream(spark, tmp_path_factory):
    """DLT-style expect_or_drop: violating rows land in quarantine with
    the checks they failed; a retried/no-op rerun stays exactly-once."""
    from pyspark.sql import functions as F

    from medallion_data_lake_spark.operators.expectations import (
        in_range,
        not_null,
    )
    from medallion_data_lake_spark.sources.stream import (
        run_silver_stream_with_expectations,
    )

    bronze = tmp_path_factory.mktemp("qb") / "payment"
    silver = tmp_path_factory.mktemp("qs") / "payment"
    quar = tmp_path_factory.mktemp("qq") / "payment"
    ck = tmp_path_factory.mktemp("qck")
    bronze.mkdir()

    contract_factory = lambda: [
        not_null("customer_id"),
        in_range("amount", 0.01, 100.0),  # the clamp leaves 0.0 -> violation
    ]
    (bronze / "b1.json").write_text(
        "\n".join(
            [_env("INSERT", "2024-01-01T00:00:00", _payment(i, 10.0 + i)) for i in range(4)]
            + [_env("INSERT", "2024-01-01T00:00:00", _payment(9, -3.0))]  # clamps to 0.0
        )
    )
    run_silver_stream_with_expectations(
        spark, str(bronze), str(silver), str(quar), str(ck),
        SAKILA_RULES["payment"], contract_factory(),
    )
    clean = spark.read.parquet(str(silver))
    q = spark.read.parquet(str(quar))
    assert clean.count() == 4 and q.count() == 1
    bad = q.first()
    assert bad["payment_id"] == 9
    assert bad["_failed_expectations"] == ["in_range_amount"]

    # second batch + rerun: only new rows processed, counts stay exact
    (bronze / "b2.json").write_text(
        _env("INSERT", "2024-01-02T00:00:00", _payment(20, 55.0))
    )
    run_silver_stream_with_expectations(
        spark, str(bronze), str(silver), str(quar), str(ck),
        SAKILA_RULES["payment"], contract_factory(),
    )
    assert spark.read.parquet(str(silver)).count() == 5
    assert spark.read.parquet(str(quar)).count() == 1
    assert spark.read.parquet(str(silver)).filter(F.col("_batch_id") == 1).count() == 1

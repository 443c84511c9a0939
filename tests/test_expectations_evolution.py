"""Expectations contract + schema evolution policy."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from medallion_data_lake_spark.catalog import load_star_table
from medallion_data_lake_spark.operators.evolution import (
    SchemaDriftError,
    diff_schemas,
    evolve_to_schema,
)
from medallion_data_lake_spark.operators.expectations import (
    foreign_key,
    in_range,
    in_set,
    matches,
    not_null,
    run_expectations,
    split_by_expectations,
    unique,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def dirty(spark):
    return spark.createDataFrame(
        [
            (1, "a@x.com", 10.0, "A"),
            (2, None, 5.0, "B"),          # null email
            (3, "c@x.com", -4.0, "A"),    # negative amount
            (3, "d@x.com", 2.0, "C"),     # dup id + bad status
            (4, "not-an-email", 1.0, None),  # bad email + null status
        ],
        "id long, email string, amount double, status string",
    )


# Column exprs need a live SparkContext -> build per-test, not at import
@pytest.fixture()
def contract(spark):
    return [
        not_null("email"),
        in_range("amount", 0.0, 100.0),
        in_set("status", ["A", "B"]),
        matches("email", r"^[^@]+@[^@]+$"),
    ]


def test_metrics_single_pass(dirty, contract):
    report = run_expectations(dirty, contract + [unique("id")])
    assert report["n_rows"] == 5
    assert report["passed"] is False
    assert report["checks"] == {
        "not_null_email": 1,
        "in_range_amount": 1,
        "in_set_status": 2,   # 'C' and NULL both fail closed
        "matches_email": 2,   # NULL and 'not-an-email'
        "unique_id": 1,       # one extra copy of id=3
    }


def test_row_metrics_do_not_shuffle(dirty, contract):
    row_only = list(contract)
    agg = dirty.agg(
        *[F.sum((~F.coalesce(e.predicate, F.lit(False))).cast("long")).alias(e.name)
          for e in row_only]
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan


def test_split_quarantine_names_violations(dirty, contract):
    clean, quarantine = split_by_expectations(dirty, contract)
    assert clean.count() == 1 and clean.first()["id"] == 1
    q = {r["id"]: set(r["_failed_expectations"]) for r in quarantine.collect()}
    assert q[2] == {"not_null_email", "matches_email"}
    assert q[4] == {"in_set_status", "matches_email"}
    # split + metrics agree
    report = run_expectations(dirty, contract)
    assert quarantine.count() == dirty.count() - clean.count()
    assert report["passed"] is False


def test_foreign_key_broadcast(spark, dirty):
    customer = load_star_table(spark, SF_DIR, "customer")
    orders = load_star_table(spark, SF_DIR, "orders")
    fk = foreign_key("o_custkey", customer, "c_custkey")
    assert fk.dataset_check(orders) == 0  # fixture is referentially whole
    broken = orders.withColumn(
        "o_custkey",
        F.when(F.col("o_orderkey") % 100 == 0, F.lit(10**9)).otherwise(
            F.col("o_custkey")
        ),
    )
    assert fk.dataset_check(broken) == broken.filter(
        F.col("o_custkey") == 10**9
    ).count()


def test_passing_contract_gates_true(spark):
    customer = load_star_table(spark, SF_DIR, "customer")
    report = run_expectations(
        customer,
        [not_null("c_custkey"), unique("c_custkey"),
         in_range("c_nationkey", 0, 24)],
    )
    assert report["passed"] is True


# --- evolution ---------------------------------------------------------

TARGET = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("amount", T.DoubleType()),
        T.StructField("note", T.StringType()),
    ]
)


def test_diff_classifies(spark):
    batch = spark.createDataFrame([(1, 1.5, "x", True)],
                                  "id int, amount double, extra string, flag boolean")
    d = diff_schemas(batch.schema, TARGET)
    assert d["widen"] == ["id"] and d["add"] == ["note"]
    assert sorted(d["extra"]) == ["extra", "flag"] and d["same"] == ["amount"]


def test_evolve_add_widen_drop(spark):
    batch = spark.createDataFrame([(7, 2.0, "junk")], "id int, amount double, extra string")
    out = evolve_to_schema(batch, TARGET)
    assert [f.simpleString() for f in out.schema.fields] == [
        "id:bigint", "amount:double", "note:string"
    ]
    row = out.first()
    assert row["id"] == 7 and row["note"] is None


def test_narrowing_refused_then_opted_in(spark):
    target = T.StructType([T.StructField("id", T.IntegerType())])
    batch = spark.createDataFrame([(2**40,), (5,)], "id long")
    with pytest.raises(SchemaDriftError, match="narrowing id"):
        evolve_to_schema(batch, target)
    out = evolve_to_schema(batch, target, allow_narrowing=("id",))
    vals = {r["id"] for r in out.collect()}
    assert vals == {None, 5}  # overflow -> NULL via try_cast, never garbage


def test_strict_refuses_extras(spark):
    batch = spark.createDataFrame([(1, 2.0, "s", "x")],
                                  "id long, amount double, note string, extra string")
    with pytest.raises(SchemaDriftError, match="unexpected column 'extra'"):
        evolve_to_schema(batch, TARGET, strict=True)
    out = evolve_to_schema(batch, TARGET)  # default: project extras away
    assert out.columns == ["id", "amount", "note"]


def test_parameterized_types_widen_to_string(spark):
    target = T.StructType([T.StructField("d", T.StringType())])
    batch = spark.createDataFrame([(1,)], "x int").select(
        F.col("x").cast("decimal(10,2)").alias("d")
    )
    d = diff_schemas(batch.schema, target)
    assert d["widen"] == ["d"] and d["narrow"] == []
    out = evolve_to_schema(batch, target)
    assert out.first()["d"] == "1.00"


def test_binary_to_string_is_narrowing_not_widening(spark):
    """Arbitrary bytes are not valid UTF-8 — casting binary to string
    mangles them rather than refusing, so the policy must treat it as
    narrowing requiring opt-in (round-3 advice)."""
    target = T.StructType([T.StructField("b", T.StringType())])
    batch = spark.createDataFrame([(bytearray(b"\xff\xfe"),)], "b binary")
    d = diff_schemas(batch.schema, target)
    assert d["narrow"] == ["b"] and d["widen"] == []
    with pytest.raises(SchemaDriftError, match="narrowing b"):
        evolve_to_schema(batch, target)
    # explicit opt-in still works for producers that KNOW it's utf-8 text
    evolve_to_schema(batch, target, allow_narrowing=("b",))

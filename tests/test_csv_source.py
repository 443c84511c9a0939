"""CSV bronze source: explicit schema, PERMISSIVE + quarantine parity
with the JSON path (sources/batch.py:read_csv_table)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from medallion_data_lake_spark.sources.batch import (
    CORRUPT_COL,
    read_csv_table,
    split_corrupt,
)

SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("name", T.StringType()),
    T.StructField("amount", T.DoubleType()),
])


@pytest.fixture()
def csv_dir(tmp_path):
    p = tmp_path / "drop"
    p.mkdir()
    (p / "part1.csv").write_text(
        "id,name,amount\n"
        "1,alice,10.5\n"
        '2,"bob, jr.",20.25\n'          # quoted delimiter
        "3,carol,not_a_number\n"         # malformed: bad double
        '4,"multi\nline name",1.0\n'     # RFC 4180 multiline field
    )
    return str(p)


def test_csv_reads_clean_rows_and_quarantines_malformed(spark, csv_dir):
    df = read_csv_table(spark, csv_dir, SCHEMA)
    clean, corrupt = split_corrupt(df)
    rows = {r["id"]: (r["name"], r["amount"]) for r in clean.collect()}
    assert rows == {
        1: ("alice", 10.5),
        2: ("bob, jr.", 20.25),
        4: ("multi\nline name", 1.0),
    }
    bad = corrupt.collect()
    assert len(bad) == 1
    assert "not_a_number" in bad[0][CORRUPT_COL]


def test_csv_schema_is_declared_not_inferred(spark, csv_dir):
    df = read_csv_table(spark, csv_dir, SCHEMA)
    assert [f.name for f in df.schema.fields] == [
        "id", "name", "amount", CORRUPT_COL]
    assert isinstance(df.schema["amount"].dataType, T.DoubleType)


def test_csv_partition_dirs_prune(spark, tmp_path):
    root = tmp_path / "parted"
    for day in ("2024-01-01", "2024-01-02"):
        d = root / f"day={day}"
        d.mkdir(parents=True)
        (d / "x.csv").write_text("id,name,amount\n1,a,1.0\n2,b,2.0\n")
    df = read_csv_table(spark, str(root), SCHEMA).filter(
        F.col("day") == "2024-01-01"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert df.count() == 2
    # partition filter reached the scan (pruned read, not post-filter)
    assert "PartitionFilters: [isnotnull(day" in plan or "day#" in plan.split("PartitionFilters")[1][:120]

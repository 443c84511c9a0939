"""Layer writers.

Parquet with hive partitioning (Delta-ready: the format string is the
only change on a cluster with Delta, which adds the txn log + MERGE).

DELTA STATUS (verified 2026-08-13, round 2): delta-spark is NOT
installable in this container — no network (``pip install --dry-run
delta-spark`` fails DNS resolution for every index retry: "Failed to
establish a new connection: [Errno -2] Name or service not known" →
"No matching distribution found") and no delta jars ship with the
bundled pyspark 4.1.2 (0 matches in pyspark/jars). On a real cluster:
``fmt="delta"`` here, plus ``sources/cdc.apply_changes`` becomes a
``MERGE INTO`` inside ``foreachBatch`` (its parquet implementation is
the plan-equivalent stand-in and stays as the fallback).
Mirrors the reference's layout choices (S8/S9: silver partitioned by
``processed_date``, gold unpartitioned — reference
``bronze_to_silver.py:122-128``, ``silver_to_gold.py:184-194``,
``config_template.yaml:62-77``) and replaces the pandas-hop Postgres
export (S10, ``gold_to_postgres.py:33-58``) with a direct distributed
JDBC write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: tuple[str, ...] = ("processed_date",),
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Silver-style partitioned write; partition cols become pruning keys."""
    writer = df.write.mode(mode).format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def write_table(df: DataFrame, path: str, mode: str = "overwrite", fmt: str = "parquet") -> None:
    """Gold-style unpartitioned write."""
    df.write.mode(mode).format(fmt).save(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: str,
    n_buckets: int = 32,
    sort_by: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table (`bucketBy` + `saveAsTable`).

    The co-located-join lever at 100 TB: two fact tables bucketed on the
    same key with the same bucket count join WITHOUT a shuffle on either
    side (SortMergeJoin reads bucket i against bucket i directly). Worth
    it for keys joined repeatedly (lineitem⨝orders on orderkey class of
    joins); the bucketing shuffle is paid once at write time instead of
    per query. Requires the session catalog/warehouse (managed tables),
    hence `saveAsTable` rather than a path write.
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_by)
    if sort_by:
        writer = writer.sortBy(sort_by)
    writer.saveAsTable(table)


def write_jdbc(
    df: DataFrame, url: str, table: str, mode: str = "overwrite", **options: str
) -> None:
    """Serving export — distributed JDBC write, no ``toPandas`` hop.

    The reference collects gold to the driver and pushes through pandas
    ``to_sql`` (S10, ``gold_to_postgres.py:43-53``) — a driver-OOM risk
    at scale (SURVEY.md §4.3.4). Spark's JDBC writer inserts from the
    executors in parallel.
    """
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table).mode(mode)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save()


def read_layer(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    return spark.read.format(fmt).load(path)

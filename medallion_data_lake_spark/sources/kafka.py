"""Kafka producer/consumer plumbing: envelope (de)serialization + sinks.

Completes S2 (the reference's producer side, ``mysql_to_kafka.py:55-80``:
every row published as a ``{table, operation, timestamp, data}`` JSON
message keyed by primary key) as engine code rather than a driver
script: the serialization is distributed column expressions — JVM-side
``to_json(struct(...))`` — so producing 100 TB of change messages is a
map-only pass with no Python in the loop, against the reference's
row-at-a-time ``producer.send`` driver loop.

``to_envelope_messages`` is the exact inverse of
``cdc.parse_envelopes`` (round-trip asserted in tests/test_kafka_env.py)
and works identically on batch and streaming DataFrames — Kafka's sink
contract is just (key, value) string/binary columns, so:

    write_kafka(to_envelope_messages(df, "customer", "customer_id"),
                bootstrap="broker:9092", topic="sakila.customer")

No broker exists in this container, so ``write_kafka`` /
``write_kafka_stream`` are exercised to the DataFrameWriter boundary
only (format/options assembly); the serialization itself is fully
tested via the parse_envelopes round-trip.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def to_envelope_messages(
    df: DataFrame,
    table: str,
    key_col: str,
    operation: Column | str = "INSERT",
    timestamp: Column | None = None,
) -> DataFrame:
    """Rows → Kafka-ready (key, value) pairs in the reference envelope.

    ``value`` is the ``{table, operation, timestamp, data}`` JSON
    envelope with ALL payload scalars string-typed, matching the
    producer's ``json.dumps(default=str)`` convention
    (``mysql_to_kafka.py:27``) so the consumer-side explicit schema
    (schemas.envelope_schema) parses both real producer traffic and
    ours identically. ``key`` is the primary key (the reference keys
    messages by ``<table>_id`` for per-key topic ordering — the same
    property the CDC collapse relies on downstream).
    """
    op = F.lit(operation) if isinstance(operation, str) else operation
    ts = timestamp if timestamp is not None else F.date_format(
        F.current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
    )
    payload = F.struct(
        *[F.col(c).cast("string").alias(c) for c in df.columns]
    )
    envelope = F.to_json(
        F.struct(
            F.lit(table).alias("table"),
            op.alias("operation"),
            ts.alias("timestamp"),
            payload.alias("data"),
        )
    )
    return df.select(
        F.col(key_col).cast("string").alias("key"),
        envelope.alias("value"),
    )


def write_kafka(
    messages: DataFrame, bootstrap: str, topic: str, **options: str
):
    """Batch producer sink: (key, value) → Kafka topic.

    Requires the spark-sql-kafka package on the cluster; the writer is
    assembled here and ``save()`` is left to the caller's error handling
    (no broker in this container to integration-test against).
    """
    return (
        messages.write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .options(**options)
    )


def write_kafka_stream(
    messages: DataFrame, bootstrap: str, topic: str, checkpoint: str, **options: str
):
    """Streaming producer sink: checkpointed exactly-once-per-batch
    publish (the streaming twin of ``write_kafka``)."""
    return (
        messages.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .options(**options)
    )

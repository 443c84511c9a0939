"""Producer envelope serialization round-trips through the CDC parser."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from medallion_data_lake_spark.sources.cdc import parse_envelopes
from medallion_data_lake_spark.sources.kafka import (
    to_envelope_messages,
    write_kafka,
)

PAYLOAD = T.StructType(
    [
        T.StructField("customer_id", T.StringType()),
        T.StructField("email", T.StringType()),
    ]
)


def test_envelope_round_trip(spark):
    rows = spark.createDataFrame(
        [(1, "a@x.com"), (2, "b@x.com")], "customer_id int, email string"
    )
    msgs = to_envelope_messages(
        rows, "customer", "customer_id", operation="UPDATE",
        timestamp=F.lit("2024-02-01T00:00:00"),
    )
    assert msgs.columns == ["key", "value"]  # the Kafka sink contract
    keys = {r["key"] for r in msgs.collect()}
    assert keys == {"1", "2"}  # keyed by pk for per-key topic ordering

    parsed = parse_envelopes(msgs, PAYLOAD)
    got = {
        r["data"]["customer_id"]: (r["table"], r["operation"], r["data"]["email"])
        for r in parsed.collect()
    }
    assert got == {
        "1": ("customer", "UPDATE", "a@x.com"),
        "2": ("customer", "UPDATE", "b@x.com"),
    }


def test_envelope_serialization_is_jvm_side(spark):
    rows = spark.createDataFrame([(1, "a@x.com")], "customer_id int, email string")
    plan = to_envelope_messages(rows, "customer", "customer_id")._jdf.queryExecution(
    ).executedPlan().toString()
    # pure projection: no python workers, no shuffle
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_write_kafka_assembles_writer(spark):
    rows = spark.createDataFrame([(1, "a@x.com")], "customer_id int, email string")
    msgs = to_envelope_messages(rows, "customer", "customer_id")
    writer = write_kafka(msgs, bootstrap="broker:9092", topic="sakila.customer")
    # writer boundary only — no broker in this container
    assert writer is not None


def test_kafka_parse_stage_equals_file_source_modulo_source(spark):
    """The Kafka path = source node + events_from_envelopes; everything
    downstream is shared. Proven broker-free: serialize the events
    fixture through the producer envelope, parse it back with the
    EXACT stage read_events_kafka uses, and the hourly rollup must equal
    the oracle-gated batch query row-for-row. Schema identity with the
    file-source stream is asserted directly."""
    from medallion_data_lake_spark.catalog import load_star_table
    from medallion_data_lake_spark.queries import load_all_extra
    from medallion_data_lake_spark.streaming.events import (
        events_from_envelopes,
        hourly_rollup,
        read_events_stream,
    )

    sf = "/root/testdata/sf0.001"
    events = load_star_table(spark, sf, "events")
    msgs = to_envelope_messages(events, "events", "event_id")
    parsed = events_from_envelopes(msgs)

    # schema identical to the file-source stream (the "modulo source" claim)
    import tempfile

    src = tempfile.mkdtemp(prefix="kafka_parity_")
    events.write.mode("overwrite").parquet(src)
    assert parsed.schema == read_events_stream(spark, src).schema

    # envelope round-trip loses nothing the rollup can see: equals the
    # driver-gated batch query on the same fixture
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in hourly_rollup(parsed).collect()
    }
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in load_all_extra()["events_hourly_windows"].build(spark, sf).collect()
    }
    assert got == want

    # and the parse stage is pure JVM projection — no Python, no shuffle
    plan = parsed._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Exchange" not in plan


@pytest.mark.skipif(
    not os.environ.get("MDLS_KAFKA_BOOTSTRAP"),
    reason="set MDLS_KAFKA_BOOTSTRAP=host:port (docker-compose recipe in "
           "README.md) to run the live-broker smoke",
)
def test_kafka_end_to_end_live_broker(spark, tmp_path):
    """Live-broker smoke (cluster/CI with a broker + spark-sql-kafka):
    produce the events fixture through write_kafka, consume with
    read_events_kafka, and the availableNow rollup must equal batch."""
    import uuid

    from medallion_data_lake_spark.catalog import load_star_table
    from medallion_data_lake_spark.streaming.events import (
        hourly_rollup,
        read_events_kafka,
    )

    bootstrap = os.environ["MDLS_KAFKA_BOOTSTRAP"]
    topic = f"mdls-smoke-{uuid.uuid4().hex[:8]}"
    sf = "/root/testdata/sf0.001"
    events = load_star_table(spark, sf, "events")
    write_kafka(
        to_envelope_messages(events, "events", "event_id"), bootstrap, topic
    ).save()

    rollup = hourly_rollup(read_events_kafka(spark, bootstrap, topic))
    q = (
        rollup.writeStream.format("memory")
        .queryName("kafka_smoke_sink")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("kafka_smoke_sink").count()
    want = hourly_rollup(events.withColumn("ts", F.col("ts").cast("timestamp"))).count()
    assert got == want

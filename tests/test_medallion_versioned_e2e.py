"""End-to-end: CDC stream → versioned silver (file-granular MERGE) →
change feed → incremental gold view.

The full medallion story on the round-4 machinery, composed: envelope
changes arrive as a stream, land exactly-once as MERGE commits on a
versioned silver table, and the gold rollup is maintained from silver's
CHANGE FEED — no silver rescan, correct under updates and deletes. Each
piece is unit-tested elsewhere; this pins the composition.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from medallion_data_lake_spark.operators.incremental import refresh_from_changes
from medallion_data_lake_spark.operators.versioned import read_table
from medallion_data_lake_spark.sources.cdc import parse_envelopes, run_cdc_stream

PAYLOAD = T.StructType([
    T.StructField("order_id", T.StringType()),
    T.StructField("status", T.StringType()),
    T.StructField("amount", T.StringType()),  # envelope convention: strings
])


def _msg(op, ts, oid, status, amount):
    return json.dumps({
        "table": "orders", "operation": op, "timestamp": ts,
        "data": {"order_id": oid, "status": status, "amount": amount},
    })


def test_cdc_to_versioned_silver_to_gold_view(spark, tmp_path):
    inp = str(tmp_path / "in")
    os.makedirs(inp)
    silver = str(tmp_path / "silver")
    ck = str(tmp_path / "ck")
    gold = str(tmp_path / "gold")

    def ingest():
        raw = spark.readStream.schema("value string").json(inp)
        changes = parse_envelopes(raw, PAYLOAD)
        run_cdc_stream(spark, changes, silver, "order_id", ck)

    def refresh_gold():
        # silver amounts arrive as strings (envelope convention): cast
        # at the view boundary
        return refresh_from_changes(
            spark, silver, gold,
            grain_exprs={"status": F.col("status")},
            value_exprs={"revenue": F.col("amount").cast("double"),
                         "n_orders": F.lit(1)},
        )

    def gold_state():
        return {r["status"]: (r["revenue"], r["n_orders"])
                for r in read_table(spark, gold).collect()}

    def recompute():
        return {
            r["status"]: (r["revenue"], r["n_orders"])
            for r in read_table(spark, silver)
            .groupBy("status")
            .agg(F.sum(F.col("amount").cast("double")).alias("revenue"),
                 F.count(F.lit(1)).alias("n_orders"))
            .collect()
        }

    # drop 1: three inserts
    with open(f"{inp}/d1.json", "w") as f:
        f.write("\n".join(json.dumps({"value": m}) for m in [
            _msg("INSERT", "2024-01-01T00:00:00", "o1", "open", "10.0"),
            _msg("INSERT", "2024-01-01T00:00:01", "o2", "open", "5.0"),
            _msg("INSERT", "2024-01-01T00:00:02", "o3", "done", "2.0"),
        ]))
    ingest()
    assert refresh_gold() is not None
    assert gold_state() == recompute() == {
        "open": (15.0, 2), "done": (2.0, 1)}

    # drop 2: status transition (update), a delete, a new order
    with open(f"{inp}/d2.json", "w") as f:
        f.write("\n".join(json.dumps({"value": m}) for m in [
            _msg("UPDATE", "2024-01-02T00:00:00", "o1", "done", "10.0"),
            _msg("DELETE", "2024-01-02T00:00:01", "o2", None, None),
            _msg("INSERT", "2024-01-02T00:00:02", "o4", "open", "7.0"),
        ]))
    ingest()
    assert refresh_gold() is not None
    assert gold_state() == recompute() == {
        "open": (7.0, 1), "done": (12.0, 2)}
    # nothing new: refresh is a no-op, not a rebuild
    assert refresh_gold() is None

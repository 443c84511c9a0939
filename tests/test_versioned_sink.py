"""Streaming APPEND into the versioned table (streaming/versioned_sink.py):
exactly-once under checkpoint-loss replay, per-batch time travel,
auto-compaction riding the same loop."""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import functions as F

from medallion_data_lake_spark.operators.versioned import (
    _state_at,
    history,
    read_table,
)
from medallion_data_lake_spark.streaming.versioned_sink import run_append_stream


def _write(inp, name, rows):
    with open(os.path.join(inp, name), "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows))


def test_append_stream_exactly_once_and_time_travel(spark, tmp_path):
    inp = str(tmp_path / "in")
    os.makedirs(inp)
    table = str(tmp_path / "vt")
    ck = str(tmp_path / "ck")
    schema = "event_id long, kind string, value double"

    def run():
        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", "1"
        ).json(inp)
        run_append_stream(
            spark, stream, table, ck, stats_cols=("event_id",),
            auto_compact_files=3,
        )

    _write(inp, "b0.json", [
        {"event_id": i, "kind": "view", "value": float(i)} for i in range(5)])
    run()
    assert read_table(spark, table).count() == 5

    for b in range(1, 5):
        _write(inp, f"b{b}.json", [
            {"event_id": b * 100 + i, "kind": "view", "value": 1.0}
            for i in range(3)])
    run()
    got = read_table(spark, table)
    assert got.count() == 5 + 4 * 3
    # per-batch time travel: version 0 is exactly the first batch
    assert read_table(spark, table, version=0).count() == 5
    # auto-compaction ran inside the loop and bounded the fragments
    ops = [h["operation"] for h in history(table)]
    assert any(o.startswith("OPTIMIZE(") for o in ops)
    assert len(_state_at(table)[0]) < 5  # fewer live files than batches

    # checkpoint loss: same files redeliver with the same batch ids —
    # the commit-log txn watermark makes the replay a no-op
    n = len(history(table))
    shutil.rmtree(ck)
    run()
    assert read_table(spark, table).count() == 17
    assert len(history(table)) == n

"""CDC upsert semantics: out-of-order events, deletes, idempotency."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from medallion_data_lake_spark.schemas import BRONZE_PAYLOADS
from medallion_data_lake_spark.sources.cdc import (
    apply_changes,
    latest_change_per_key,
    parse_envelopes,
)

PAYLOAD = BRONZE_PAYLOADS["customer"]


def _msg(op, ts, cid, email):
    return json.dumps(
        {
            "table": "customer",
            "operation": op,
            "timestamp": ts,
            "data": {"customer_id": cid, "email": email},
        }
    )


def _raw(spark, msgs):
    return spark.createDataFrame([(m,) for m in msgs], "value string")


def test_parse_and_collapse_out_of_order(spark):
    msgs = [
        _msg("UPDATE", "2024-01-03T00:00:00", "1", "newest@x.com"),
        _msg("INSERT", "2024-01-01T00:00:00", "1", "oldest@x.com"),
        _msg("UPDATE", "2024-01-02T00:00:00", "1", "middle@x.com"),
        _msg("INSERT", "2024-01-01T00:00:00", "2", "two@x.com"),
    ]
    changes = parse_envelopes(_raw(spark, msgs), PAYLOAD)
    collapsed = latest_change_per_key(changes, "customer_id")
    rows = {r["data"]["customer_id"]: r for r in collapsed.collect()}
    assert len(rows) == 2
    # max-timestamp winner regardless of arrival order (SURVEY.md §7.4.4)
    assert rows["1"]["data"]["email"] == "newest@x.com"


def test_apply_changes_upsert_and_delete(spark):
    current = spark.createDataFrame(
        [("1", "old@x.com"), ("2", "two@x.com"), ("3", "three@x.com")],
        "customer_id string, email string",
    )
    msgs = [
        _msg("UPDATE", "2024-01-02T00:00:00", "1", "updated@x.com"),
        _msg("DELETE", "2024-01-02T00:00:00", "2", None),
        _msg("INSERT", "2024-01-02T00:00:00", "4", "four@x.com"),
    ]
    changes = latest_change_per_key(
        parse_envelopes(_raw(spark, msgs), PAYLOAD), "customer_id"
    )
    # narrow the envelope payload to the current table's shape
    changes = changes.withColumn(
        "data", F.struct(F.col("data.customer_id"), F.col("data.email"))
    )
    merged = apply_changes(current, changes, "customer_id")
    rows = {r["customer_id"]: r["email"] for r in merged.collect()}
    assert rows == {"1": "updated@x.com", "3": "three@x.com", "4": "four@x.com"}


def test_apply_changes_idempotent(spark):
    current = spark.createDataFrame(
        [("1", "old@x.com")], "customer_id string, email string"
    )
    msgs = [_msg("UPDATE", "2024-01-02T00:00:00", "1", "new@x.com")]
    changes = latest_change_per_key(
        parse_envelopes(_raw(spark, msgs), PAYLOAD), "customer_id"
    )
    changes = changes.withColumn(
        "data", F.struct(F.col("data.customer_id"), F.col("data.email"))
    )
    once = apply_changes(current, changes, "customer_id")
    twice = apply_changes(once, changes, "customer_id")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_same_timestamp_delete_wins(spark):
    msgs = [
        _msg("UPDATE", "2024-01-02T00:00:00", "1", "u@x.com"),
        _msg("DELETE", "2024-01-02T00:00:00", "1", None),
    ]
    collapsed = latest_change_per_key(
        parse_envelopes(_raw(spark, msgs), PAYLOAD), "customer_id"
    )
    assert [r["operation"] for r in collapsed.collect()] == ["DELETE"]


def test_conform_dedup_agrees_with_cdc_precedence(spark):
    # the silver conform dedup and the CDC merge collapse must resolve
    # the same change batch to the same winner: same-timestamp ties break
    # on DELETE > UPDATE > INSERT (terminal operation), not lexicographic
    # operation order (which would pick UPDATE)
    from pyspark.sql import functions as F

    from medallion_data_lake_spark.operators.cleaning import _dedup_latest

    df = spark.createDataFrame(
        [
            (1, "via-update", "2024-01-02 00:00:00", "UPDATE"),
            (1, "via-delete", "2024-01-02 00:00:00", "DELETE"),
            (1, "older", "2024-01-01 00:00:00", "INSERT"),
        ],
        "id int, val string, _envelope_ts string, _operation string",
    ).withColumn("_envelope_ts", F.to_timestamp("_envelope_ts"))
    rows = _dedup_latest(df, "id").collect()
    assert len(rows) == 1
    assert rows[0]["_operation"] == "DELETE"


def test_maintain_derived_table_trigger_semantics(spark):
    # film_text trigger contract (sakila-schema.sql:214-234): the derived
    # projection follows inserts, updates, and deletes of the base table
    from pyspark.sql import types as T

    from medallion_data_lake_spark.sources.cdc import maintain_derived_table

    payload = T.StructType(
        [
            T.StructField("film_id", T.StringType()),
            T.StructField("title", T.StringType()),
            T.StructField("description", T.StringType()),
            T.StructField("rental_rate", T.StringType()),  # NOT projected
        ]
    )

    def msg(op, ts, fid, title, desc):
        import json

        return json.dumps(
            {"table": "film", "operation": op, "timestamp": ts,
             "data": {"film_id": fid, "title": title, "description": desc,
                      "rental_rate": "2.99"}}
        )

    film_text = spark.createDataFrame(
        [("1", "OLD TITLE", "old desc"), ("2", "KEEP", "kept")],
        "film_id string, title string, description string",
    )
    raw = spark.createDataFrame(
        [(msg("UPDATE", "2024-01-02T00:00:00", "1", "NEW TITLE", "new desc"),),
         (msg("INSERT", "2024-01-02T00:00:00", "3", "ADDED", "added desc"),),
         (msg("DELETE", "2024-01-02T00:00:00", "2", None, None),)],
        "value string",
    )
    changes = latest_change_per_key(parse_envelopes(raw, payload), "film_id")
    out = maintain_derived_table(
        film_text, changes, "film_id", ("film_id", "title", "description")
    )
    rows = {r["film_id"]: (r["title"], r["description"]) for r in out.collect()}
    assert rows == {
        "1": ("NEW TITLE", "new desc"),   # upd_film
        "3": ("ADDED", "added desc"),     # ins_film
    }                                      # "2" gone: del_film
    assert out.columns == ["film_id", "title", "description"]  # projection only


def test_apply_changes_versioned_time_travel(spark, tmp_path):
    """MERGE into the versioned table: every applied batch is one atomic
    commit; pre-merge states stay readable; rollback undoes a bad batch
    without data movement."""
    from medallion_data_lake_spark.operators.versioned import (
        history,
        read_table,
        rollback,
    )
    from medallion_data_lake_spark.sources.cdc import apply_changes_versioned

    path = str(tmp_path / "customer_versioned")

    def env(op, ts, cid, email):
        return {"operation": op, "timestamp": ts,
                "data": {"customer_id": cid, "email": email}}

    schema = (
        "operation string, timestamp string, "
        "data struct<customer_id: long, email: string>"
    )
    from pyspark.sql import functions as F

    def with_ts(df):  # parse_envelopes normally derives change_ts
        return df.withColumn("change_ts", F.to_timestamp("timestamp"))

    b1 = with_ts(spark.createDataFrame(
        [env("INSERT", "2024-01-01T00:00:00", 1, "a@x.com"),
         env("INSERT", "2024-01-01T00:00:01", 2, "b@x.com")], schema))
    e1 = apply_changes_versioned(spark, path, b1, "customer_id")
    assert e1["version"] == 0
    assert read_table(spark, path).count() == 2

    b2 = with_ts(spark.createDataFrame(
        [env("UPDATE", "2024-01-02T00:00:00", 1, "a2@x.com"),
         env("DELETE", "2024-01-02T00:00:01", 2, None),
         env("INSERT", "2024-01-02T00:00:02", 3, "c@x.com")], schema))
    e2 = apply_changes_versioned(spark, path, b2, "customer_id")
    assert e2["version"] == 1
    now = {r["customer_id"]: r["email"] for r in read_table(spark, path).collect()}
    assert now == {1: "a2@x.com", 3: "c@x.com"}
    # pre-merge state still time-travelable
    was = {r["customer_id"]: r["email"]
           for r in read_table(spark, path, version=0).collect()}
    assert was == {1: "a@x.com", 2: "b@x.com"}
    # bad batch? rollback is metadata-only and auditable
    rollback(spark, path, to_version=0)
    assert read_table(spark, path).count() == 2
    assert [h["version"] for h in history(path)] == [0, 1, 2]


def test_run_cdc_stream_exactly_once_replay(spark, tmp_path):
    """Streaming CDC apply (run_cdc_stream): envelope files stream in as
    micro-batches, each landing as one idempotent MERGE commit. A replay
    after losing the stream checkpoint (crash between table commit and
    epoch commit) must be a no-op — the batch-id txn watermark in the
    commit log, not the checkpoint, is what guarantees no double-apply."""
    import os
    import shutil

    from medallion_data_lake_spark.operators.versioned import history, read_table
    from medallion_data_lake_spark.sources.cdc import run_cdc_stream

    inp = str(tmp_path / "in")
    os.makedirs(inp)
    table = str(tmp_path / "customer_versioned")
    ck = str(tmp_path / "ck")

    def run():
        raw = spark.readStream.schema("value string").json(inp)
        changes = parse_envelopes(raw, PAYLOAD)
        run_cdc_stream(spark, changes, table, "customer_id", ck)

    def write_batch(name, msgs):
        with open(os.path.join(inp, name), "w") as f:
            f.write("\n".join(json.dumps({"value": m}) for m in msgs))

    write_batch("b1.json", [
        _msg("INSERT", "2024-01-01T00:00:00", "1", "a@x.com"),
        _msg("INSERT", "2024-01-01T00:00:01", "2", "b@x.com"),
    ])
    run()
    assert {r["customer_id"]: r["email"]
            for r in read_table(spark, table).collect()} == {
        "1": "a@x.com", "2": "b@x.com"}

    write_batch("b2.json", [
        _msg("UPDATE", "2024-01-02T00:00:00", "1", "a2@x.com"),
        _msg("DELETE", "2024-01-02T00:00:01", "2", None),
        _msg("INSERT", "2024-01-02T00:00:02", "3", "c@x.com"),
    ])
    run()
    want = {"1": "a2@x.com", "3": "c@x.com"}
    assert {r["customer_id"]: r["email"]
            for r in read_table(spark, table).collect()} == want
    ops = [h["operation"] for h in history(table)]
    assert ops[0] == "WRITE" and any(o.startswith("MERGE(") for o in ops[1:])
    n_versions = len(ops)

    # crash-replay: checkpoint gone, same files re-deliver with the same
    # batch ids and the same derived app id (checkpoint PATH unchanged)
    shutil.rmtree(ck)
    run()
    assert {r["customer_id"]: r["email"]
            for r in read_table(spark, table).collect()} == want
    assert len(history(table)) == n_versions  # skipped, not re-merged

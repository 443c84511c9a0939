"""CDC envelope parsing and keyed upsert application.

The reference ingests Debezium/producer envelopes but has **no apply
logic** — bronze only appends and silver dedups with an arbitrary winner
(SURVEY.md §2.9: "no merge/upsert logic exists"). This module supplies
the missing capability:

- ``parse_envelopes``: Kafka-shaped ``value`` bytes/strings →
  typed envelope rows (explicit schema, never inferred),
- ``latest_change_per_key``: collapse a change batch to one winner per
  key — **max envelope timestamp**, deterministic tiebreak on operation
  then a monotonic sequence column if present (SURVEY.md §7.4.4:
  out-of-order events per key must resolve deterministically),
- ``apply_changes``: merge the collapsed batch into the current table
  state (upsert + delete).

On Delta the same logic is one ``MERGE INTO`` statement inside
``foreachBatch``; this parquet implementation expresses the merge as a
full-outer anti/union plan, which shuffles both sides on the key — the
same shuffle MERGE performs. Idempotent: re-applying a batch is a no-op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import envelope_schema

def _op_rank(col: str = "operation"):
    """Operation precedence for same-timestamp ties: a DELETE at the same
    timestamp as an UPDATE wins (terminal operation), Debezium-style.

    Shared by the CDC merge path and the silver conform dedup
    (operators/cleaning.py) so the same change batch resolves to the
    same winner regardless of which path it flows through.
    """
    return (
        F.when(F.col(col) == "DELETE", 2)
        .when(F.col(col) == "UPDATE", 1)
        .otherwise(0)
    )


def parse_envelopes(raw: DataFrame, payload: T.StructType, value_col: str = "value") -> DataFrame:
    """Kafka ``value`` strings → typed envelope columns (table, operation,
    timestamp, data). Reference envelope shape: ``mysql_to_kafka.py:68-73``."""
    schema = envelope_schema(payload)
    parsed = raw.select(
        F.from_json(F.col(value_col).cast("string"), schema).alias("env")
    )
    return parsed.select(
        "env.table",
        "env.operation",
        F.to_timestamp("env.timestamp").alias("change_ts"),
        "env.data",
    )


def latest_change_per_key(changes: DataFrame, key: str) -> DataFrame:
    """One deterministic winner per key from a (possibly out-of-order,
    possibly duplicated) change batch.

    Tiebreak chain: newest timestamp → terminal operation → canonical
    payload fingerprint. The last leg matters when a producer emits two
    DIFFERENT payloads at the identical timestamp+operation: without it
    the winner depends on arrival order (found by the hypothesis
    property test — reorder+redeliver must be a no-op). The fingerprint
    winner is arbitrary but STABLE, which is the requirement.
    """
    w = Window.partitionBy(F.col(f"data.{key}")).orderBy(
        F.desc("change_ts"),
        _op_rank().desc(),
        F.desc(F.md5(F.to_json(F.col("data")))),
    )
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def apply_changes(current: DataFrame, changes: DataFrame, key: str) -> DataFrame:
    """Merge a collapsed change batch into the current table state.

    Semantics (Delta ``MERGE INTO`` equivalent):
      - DELETE  → key removed,
      - INSERT/UPDATE (upsert) → payload replaces the current row.

    ``current`` holds payload-shaped rows; ``changes`` holds envelopes
    (one per key — call ``latest_change_per_key`` first).
    """
    upserts = (
        changes.filter(F.col("operation") != "DELETE")
        .select("data.*")
    )
    deletes = changes.filter(F.col("operation") == "DELETE").select(
        F.col(f"data.{key}").alias(key)
    )
    changed_keys = changes.select(F.col(f"data.{key}").alias(key))

    untouched = current.join(changed_keys, on=key, how="left_anti")
    # align schemas: upserts may lack audit cols present in current
    for col in current.columns:
        if col not in upserts.columns:
            upserts = upserts.withColumn(col, F.lit(None).cast(current.schema[col].dataType))
    upserts = upserts.select(*current.columns)
    _ = deletes  # deleted keys are simply absent from the union
    return untouched.unionByName(upserts)


def maintain_derived_table(
    derived: DataFrame,
    changes: DataFrame,
    key: str,
    columns: tuple[str, ...],
) -> DataFrame:
    """Trigger-maintained derived table as a declarative CDC merge.

    The reference's source schema keeps ``film_text`` synchronized with
    ``film`` through three row-level triggers — ``ins_film`` (insert the
    projection), ``upd_film`` (update it when a projected column
    changed), ``del_film`` (delete it) — sakila-schema.sql:214-234.
    Spark has no triggers; the same contract is the change-batch merge
    below: project each change's payload to the derived columns, then
    apply insert/update/delete in ONE keyed plan. Per-batch instead of
    per-row, so at 100 TB the maintenance cost is one shuffle per
    micro-batch (``foreachBatch`` on the CDC stream) rather than n
    trigger firings — and the no-op-update optimization in ``upd_film``
    (skip when projected columns unchanged) is subsumed: replacing a row
    with identical values is idempotent.

    ``columns`` must include ``key``. Call ``latest_change_per_key``
    first, as with ``apply_changes``.
    """
    assert key in columns, f"projection {columns} must include key {key}"
    projected = changes.select(
        "operation",
        F.struct(*[F.col(f"data.{c}").alias(c) for c in columns]).alias("data"),
    )
    return apply_changes(derived, projected, key)


def apply_changes_versioned(
    spark,
    table_path: str,
    changes: DataFrame,
    key: str,
    txn_app_id: str | None = None,
    txn_version: int | None = None,
) -> dict | None:
    """CDC merge into a log-structured versioned table
    (operators/versioned.py) — the full MERGE-INTO-on-a-transactional-
    table loop Delta would provide: read the latest snapshot, apply the
    collapsed change batch, publish the new state as ONE atomic commit.
    Readers pinned to an older version are untouched; a bad batch is
    undone with ``versioned.rollback`` (metadata-only) instead of a
    restore-from-backup.

    Returns the commit log entry. First call bootstraps the table from
    the batch's upserts (with per-file key stats recorded). Later
    batches go through ``versioned.merge_into`` — FILE-GRANULAR since
    round 4: only data files whose recorded key range overlaps the
    batch are rewritten, so a batch touching one key neighborhood
    rewrites that neighborhood, not the table — fact-scale CDC on the
    transactional table, the upgrade the round-3 note said real Delta
    exists for.
    """
    from ..operators.versioned import commit, latest_version, merge_into

    collapsed = latest_change_per_key(changes, key)
    src = collapsed.select(
        "data.*",
        (F.col("operation") == "DELETE").alias("__mdls_is_delete"),
    )
    if latest_version(table_path) is None:
        initial = src.filter(~F.col("__mdls_is_delete")).drop("__mdls_is_delete")
        return commit(
            initial, table_path, mode="overwrite", stats_cols=(key,),
            txn_app_id=txn_app_id, txn_version=txn_version,
        )
    return merge_into(
        spark, table_path, src, key=key, delete_col="__mdls_is_delete",
        txn_app_id=txn_app_id, txn_version=txn_version,
    )


def run_cdc_stream(
    spark,
    changes: DataFrame,
    table_path: str,
    key: str,
    checkpoint: str,
    app_id: str | None = None,
    auto_compact_files: int | None = None,
) -> None:
    """Streaming CDC apply: each micro-batch of envelope changes lands as
    ONE idempotent file-granular MERGE commit on the versioned table —
    the Delta streaming-MERGE loop (foreachBatch + txnAppId/txnVersion),
    replacing the reference's consumer-daemon + full-refresh pattern
    (``kafka_to_bronze.py`` consumer loop feeding ``bronze_to_silver``
    overwrites).

    Exactly-once has both legs, like ``run_incremental_rollup``: the
    stream checkpoint stops re-DELIVERY; the batch-id txn watermark in
    the table's commit log stops re-APPLY when a batch replays after its
    commit published but before the checkpoint epoch committed. ``changes``
    is a stream of parsed envelopes (``parse_envelopes`` output — works
    unchanged over a Kafka source). Readers of the table never see a
    partial batch; every batch is one time-travelable version.

    ``auto_compact_files`` bounds the small-files accumulation inherent
    to per-batch MERGE commits: once that many sub-16MB live files
    exist, the batch loop also publishes a subset OPTIMIZE
    (operators/versioned.py:compact_small_files). A compaction losing a
    race to a concurrent writer is skipped, not fatal — the next batch
    retries; auto-compact is maintenance, the MERGE is the contract.
    """
    import os

    txn_app = app_id or f"cdc::{os.path.abspath(checkpoint)}"

    def process(batch: DataFrame, batch_id: int) -> None:
        from ..operators.versioned import (
            CommitConflict,
            compact_small_files,
            latest_txn_version,
        )

        seen = latest_txn_version(table_path, txn_app)
        if seen is not None and batch_id <= seen:
            return  # replayed batch: its merge already published
        if batch.isEmpty():
            return
        apply_changes_versioned(
            spark, table_path, batch, key,
            txn_app_id=txn_app, txn_version=batch_id,
        )
        if auto_compact_files:
            try:
                compact_small_files(
                    spark, table_path,
                    min_files=auto_compact_files,
                    stats_cols=(key,),
                )
            except CommitConflict:
                pass  # a racing writer won; next batch will compact

    q = (
        changes.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

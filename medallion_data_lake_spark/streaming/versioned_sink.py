"""Streaming APPEND into a versioned table — the third write pattern.

The engine's streaming writers now cover the full matrix a lakehouse
needs, all on the same commit log (operators/versioned.py):

- MERGE per batch   — CDC apply (`sources/cdc.py:run_cdc_stream`)
- OVERWRITE per batch — incremental view maintenance
  (`operators/incremental.py:run_incremental_rollup`)
- APPEND per batch  — raw event/bronze ingestion (THIS module)

A plain ``writeStream.format("parquet")`` append gives exactly-once
too, but landing appends as versioned COMMITS buys what raw parquet
cannot: atomic multi-file publication (readers never see a partial
batch), per-batch time travel ("the table as of batch N"), file-level
[min,max] stats for later MERGE/DELETE pruning, retention via
expire_log, and small-file auto-compaction in the same loop.

Exactly-once is the standard two-leg contract: the stream checkpoint
stops re-delivery; the (app, batch_id) txn watermark in the commit log
stops re-APPLY when a batch replays after its commit published but
before the checkpoint epoch committed. Both legs are inherited from
``commit`` — this module is deliberately thin glue.

At 100 TB: each batch touches only its own files (append never rewrites
live data); auto-compaction bounds the fragment count the per-batch
pattern would otherwise accrete; expire_log bounds the metadata. The
maintenance steps run AFTER the batch's commit and are allowed to lose
races — the append is the contract, maintenance is best-effort
per-batch and caught up by the next one.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def run_append_stream(
    spark: SparkSession,
    stream: DataFrame,
    table_path: str,
    checkpoint: str,
    app_id: str | None = None,
    stats_cols: tuple[str, ...] = (),
    analyze_stats: bool | tuple[str, ...] = False,
    auto_compact_files: int | None = None,
    expire_every: int | None = None,
    keep_last: int = 7,
    available_now: bool = True,
):
    """Ingest a stream as one atomic versioned APPEND commit per
    micro-batch. Returns after termination (availableNow) or returns
    the running StreamingQuery (``available_now=False``)."""
    from ..operators.versioned import (
        CommitConflict,
        commit,
        compact_small_files,
        expire_log,
        latest_txn_version,
    )

    txn_app = app_id or f"append::{os.path.abspath(checkpoint)}"

    def process(batch: DataFrame, batch_id: int) -> None:
        seen = latest_txn_version(table_path, txn_app)
        if seen is not None and batch_id <= seen:
            return  # replayed batch: its append already published
        if batch.isEmpty():
            return
        commit(
            batch, table_path, mode="append",
            txn_app_id=txn_app, txn_version=batch_id,
            stats_cols=stats_cols, analyze_stats=analyze_stats,
        )
        if auto_compact_files:
            try:
                compact_small_files(
                    spark, table_path,
                    min_files=auto_compact_files,
                    stats_cols=stats_cols,
                )
            except CommitConflict:
                pass  # a racing writer won; the next batch compacts
        if expire_every and batch_id > 0 and batch_id % expire_every == 0:
            expire_log(table_path, keep_last=keep_last)

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def run_txn_stream(
    spark: SparkSession,
    stream: DataFrame,
    outputs: dict,
    txn_root: str,
    checkpoint: str,
    app_id: str | None = None,
    available_now: bool = True,
    stage_opts: dict | None = None,
):
    """One stream, SEVERAL versioned tables, atomically per micro-batch
    — the streaming face of ``operators/txn.py``.

    ``stage_opts`` maps ``table_path -> extra stage_commit kwargs``
    (e.g. ``{"stats_cols": ("term",), "bloom_cols": ("term",)}``) so a
    streamed table keeps the same file-skipping metadata its batch
    appends record.

    ``outputs`` maps ``table_path -> transform`` where each transform is
    ``(batch_df) -> DataFrame`` (the slice of the batch that table
    ingests; return an empty frame to skip a table for a batch). Every
    micro-batch stages each transform's output on its table
    (``wap.stage_commit``) and publishes the set through ONE
    transaction manifest (``txn.commit_txn``) — a crash between leg
    publishes is repaired by ``txn.recover_txns`` (run it on the same
    maintenance cadence as any coordinator), never by readers seeing a
    half-landed batch forever.

    Exactly-once is the standard two-leg contract, extended across
    tables: the stream checkpoint stops re-DELIVERY of a batch; each
    leg's ``(app, batch_id)`` txn watermark stops re-APPLY when the
    SAME batch replays (restart from the same checkpoint, or a wiped
    checkpoint re-reading the same input set) after some legs published
    but before the checkpoint epoch committed — a replayed batch's
    stage is skipped per table the watermark already covers
    (``stage_commit`` returns None), and a staged duplicate racing an
    in-flight recovery loses inside the publish claim loop.

    The watermark keys on BATCH IDS, like every Spark streaming sink:
    wiping a checkpoint and reusing its path after NEW input arrived
    restarts batch ids at 0, so a low-numbered batch carrying new rows
    would be skipped as "already applied" — if you must discard a
    checkpoint with new data pending, also change ``app_id`` (or the
    checkpoint path, which the default app_id derives from). Same
    contract as ``run_append_stream``/``commit(txn_app_id=...)``.

    A streamed txn that parks ``stuck`` is resolved FORWARD
    (``recover_txns``) — compensation refuses watermarked legs, because
    a restore cannot retract the watermark and the replayed batch would
    then skip one table forever.

    At 100 TB the per-batch cost is the N data writes the tables needed
    anyway plus N+1 metadata puts; the batch is persisted once so the N
    transforms (and their empty-checks) never recompute the source."""
    from ..operators.txn import commit_txn
    from ..operators.wap import stage_commit

    unknown = set(stage_opts or {}) - set(outputs)
    if unknown:
        raise ValueError(
            "run_txn_stream stage_opts keys must match outputs keys "
            f"exactly (same path string): no output for {sorted(unknown)} "
            "— a normalization mismatch here would SILENTLY drop the "
            "stats/bloom options the table's pruned reads depend on"
        )

    txn_app = app_id or f"txn-stream::{os.path.abspath(checkpoint)}"

    def process(batch: DataFrame, batch_id: int) -> None:
        batch.persist()
        try:
            legs = []
            for table_path, transform in outputs.items():
                out = transform(batch)
                if out.isEmpty():
                    continue
                sid = stage_commit(
                    out, table_path,
                    txn_app_id=txn_app, txn_version=batch_id,
                    **(stage_opts or {}).get(table_path, {}),
                )
                if sid is not None:  # None = replay, already applied
                    legs.append((table_path, sid))
            if legs:
                commit_txn(
                    spark, txn_root, legs,
                    note=f"{txn_app} batch {batch_id}",
                )
        finally:
            batch.unpersist()

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()

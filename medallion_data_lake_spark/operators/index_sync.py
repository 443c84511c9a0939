"""Bridge the versioned table's delete path to the persisted ANN index.

The table has a complete GDPR-grade erasure story (keyed deletes,
bloom-pruned rewrites, merge-on-read deletion vectors) and the index
has a complete tombstone story (operators/ann.py: ledger + search
anti-join + bucket-granular compaction) — this module is the connective
tissue: a delete committed to the CORPUS TABLE propagates to the
SERVING INDEX by consuming the table's own change feed, so callers
erase in ONE place and both surfaces forget.

Mechanics:

- ``sync_deletes_to_index`` reads ``table_changes`` from a persisted
  per-index watermark to the log tip, reduces the range to the LAST
  change per id (delete-then-re-add = alive), keeps the ids whose last
  change is a delete from an ERASURE-shaped commit (``delete`` /
  ``delete_dv`` / ``merge`` — an overwrite or restore also emits delete
  rows, but those are REPLACEMENT semantics: the doc population changes
  wholesale and the index is re-ingested alongside, so tombstoning them
  would mask the re-added corpus forever under tombstone-wins), and
  lands them in the index's tombstone ledger.
- Idempotent under crash-replay: the ledger write is a dynamic
  partition overwrite keyed by the processed version range, tombstones
  are additive, and the watermark (in the index's meta sidecar)
  advances ONLY after the ledger write — a crash in between replays the
  same range into the same masking state.
- UPDATES are deliberately out of scope: an embedding update means
  tombstone + re-add, which conflicts with tombstone-wins semantics;
  the supported flow for vector mutation is clear_tombstones + re-append
  or an index rebuild (see operators/ann.py docstring).

At 100 TB: cost per sync is O(changed rows in the processed range) —
the change feed unions only the touched versions' file sets, the id
projection prunes every other column at the scan, and the ledger write
is one small parquet partition. The index data files are untouched
until ``compact_index_tombstones`` runs on maintenance cadence.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from .ann import _tombstones_path, read_tombstones  # noqa: F401
from .versioned import _commit_versions, _entries, latest_version, table_changes

#: commit modes whose CDF delete rows mean ERASURE (tombstone the index)
#: rather than wholesale replacement (re-ingest the index instead)
ERASURE_MODES = ("delete", "delete_dv", "merge")

_STATE_FILE = "_index_sync.json"


def _state_path(index_path: str) -> str:
    return os.path.join(index_path, _STATE_FILE)


def read_sync_watermark(index_path: str, table_path: str) -> int:
    """Highest table version already propagated into this index's
    ledger (−1 when never synced). Keyed by table path so one index fed
    from several tables keeps independent watermarks."""
    p = _state_path(index_path)
    if not os.path.exists(p):
        return -1
    state = json.load(open(p))
    return int(state.get("watermarks", {}).get(os.path.abspath(table_path), -1))


def _advance_watermark(index_path: str, table_path: str, version: int) -> None:
    """Monotonic: a replayed range (stream batch replay, overlapping
    batch/stream syncs) must never REGRESS the watermark — a regression
    followed by expire_log past the true high-water mark would make the
    next sync raise a spurious unrecoverable gap."""
    from ._atomic import atomic_write_json

    p = _state_path(index_path)
    state = {"watermarks": {}}
    if os.path.exists(p):
        state = json.load(open(p))
        state.setdefault("watermarks", {})
    key = os.path.abspath(table_path)
    if int(version) <= int(state["watermarks"].get(key, -1)):
        return
    state["watermarks"][key] = int(version)
    atomic_write_json(p, state)  # same publish discipline as _write_meta


def _doomed_ids(feed, erasure_versions, id_col: str):
    """THE erasure reduction, shared by the batch sync and the
    streaming sync (one rule — the two paths must never diverge on
    which ids die): last change per id wins, ranked by commit version
    then aliveness (insert/update_postimage outranks delete WITHIN one
    version — an overwrite or a rewrite's copied rows arrive as paired
    delete+insert and cancel); survivors whose last change is a delete
    from an ERASURE-shaped commit are the doomed set."""
    from pyspark.sql import Window

    alive_rank = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), 1
    ).otherwise(0)
    w = Window.partitionBy(id_col).orderBy(
        F.col("_commit_version").desc(), alive_rank.desc()
    )
    return (
        feed.filter(
            F.col("_change_type").isin(
                "insert", "update_postimage", "delete"
            )
        )
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .filter(
            (F.col("_change_type") == "delete")
            & F.col("_commit_version").isin(list(erasure_versions))
        )
        .select(F.col(id_col).alias("vec_id"))
        .distinct()
    )


def sync_deletes_to_index(
    spark,
    table_path: str,
    index_path: str,
    id_col: str = "vec_id",
    on_expired_gap: str = "error",
) -> dict:
    """Propagate the table's erasures since the last sync into the
    index's tombstone ledger. Returns
    ``{"from_version", "to_version", "ids_tombstoned"}`` (a no-op sync
    returns ids_tombstoned=0 and leaves the ledger untouched).

    Within the processed range the LAST change per id wins: an id
    deleted and later re-inserted (or re-ingested by an overwrite) in
    the same range is ALIVE and is not tombstoned. Without this, the
    bootstrap sync (watermark −1 replays full history) would tombstone
    a doc that was deleted early and legitimately re-added later — and
    the next compaction would then permanently purge a LIVE document
    from the index (r8 self-review finding). Within one commit version
    an insert outranks a delete (an overwrite both removes and re-adds:
    replacement, not erasure).

    Expired history (``expire_log``): the sync range is clamped to the
    oldest retained log version. On BOOTSTRAP that is sound whenever
    the index was built from a snapshot at or after that version (the
    normal build-then-sync flow — erasures older than the snapshot have
    nothing to mask). On an INCREMENTAL sync a gap means erasure
    commits were expired before this index consumed them —
    unrecoverable, so it raises with guidance; pass
    ``on_expired_gap="skip"`` to accept (the result then carries
    ``"expired_gap": [from, to]``). Same retention contract as any CDC
    consumer: keep log history at least as long as your sync cadence.

    Call on the same maintenance cadence as ``compact_index_tombstones``
    (or from the delete feed's foreachBatch); both are idempotent, so
    over-calling costs one bounded change-feed scan."""
    lv = latest_version(table_path)
    if lv is None:
        raise FileNotFoundError(f"no versioned table at {table_path}")
    wm = read_sync_watermark(index_path, table_path)
    if wm >= lv:
        return {"from_version": wm + 1, "to_version": lv, "ids_tombstoned": 0}

    lo = wm + 1
    versions = _commit_versions(table_path)
    oldest = versions[0] if versions else 0
    gap = None
    if lo < oldest:
        if wm >= 0 and on_expired_gap != "skip":
            raise ValueError(
                f"index-sync gap on {table_path}: versions {lo}.."
                f"{oldest - 1} were expired (expire_log) before this "
                "index consumed them — erasures in that range cannot be "
                "recovered from the change feed. Rebuild the index from "
                "the current snapshot, or pass on_expired_gap='skip' to "
                "accept the gap."
            )
        gap = [lo, oldest - 1]
        lo = oldest
    erasure_versions = [
        e["version"]
        for e in _entries(table_path, lo=lo, hi=lv)
        if e.get("mode") in ERASURE_MODES
    ]
    n = 0
    if erasure_versions:
        feed = table_changes(spark, table_path, lo, lv)
        doomed = _doomed_ids(feed, erasure_versions, id_col)
        n = doomed.count()
        if n:
            # same exactly-once shape as delete_index_batch: the ledger
            # partition is keyed by the processed range, so a crash-replay
            # of [lo, lv] rewrites exactly itself
            (
                doomed.withColumn("_tb_batch", F.lit(f"cdf-{lo}-{lv}"))
                .repartition(1)
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("_tb_batch")
                .parquet(_tombstones_path(index_path))
            )
    # advance ONLY after the ledger is durable (crash => replay, not loss)
    _advance_watermark(index_path, table_path, lv)
    out = {"from_version": lo, "to_version": lv, "ids_tombstoned": int(n)}
    if gap is not None:
        out["expired_gap"] = gap
    return out


def _apply_sync_batch(batch, bid, table_path, index_path, id_col) -> None:
    """One CDF micro-batch -> ledger tombstones, via the SAME reduction
    as the batch sync (:func:`_doomed_ids`), scoped to the batch's
    version range. Idempotent under Structured Streaming's batch
    replay: the ledger partition is keyed by the stream's batch id
    (``_tb_batch=cdfs-<bid>``), so a replay rewrites exactly itself.

    Versions at or below the persisted watermark are dropped first:
    a batch sync may have processed them already WITH the range-wide
    last-wins view (delete@v6 + re-add@v7 = alive) — re-tombstoning
    v6 from a stream micro-batch that happens to split v6 and v7
    would mask a LIVE doc, and the next compaction would purge it."""
    from .ann import delete_index_batch

    wm = read_sync_watermark(index_path, table_path)
    if wm >= 0:
        batch = batch.filter(F.col("_commit_version") > wm)
    versions = [
        r[0] for r in batch.select("_commit_version").distinct().collect()
    ]
    if not versions:
        return
    modes = {
        e["version"]: e.get("mode")
        for e in _entries(table_path, lo=min(versions), hi=max(versions))
    }
    erasure = [v for v in versions if modes.get(v) in ERASURE_MODES]
    if erasure:
        doomed = _doomed_ids(batch, erasure, id_col)
        if doomed.limit(1).count():
            delete_index_batch(doomed, index_path,
                               batch_id=f"cdfs-{bid}")
    # after the ledger: a crash between the two replays this batch into
    # the same masking state (same contract as the batch sync)
    _advance_watermark(index_path, table_path, max(versions))


def run_index_sync_stream(
    spark,
    table_path: str,
    index_path: str,
    id_col: str = "vec_id",
    checkpoint_dir: str | None = None,
    available_now: bool = True,
    trigger_interval: str | None = None,
    max_versions_per_batch: int | None = None,
):
    """The STREAMING form of :func:`sync_deletes_to_index`: tail the
    corpus table's change feed (``sources/lakehouse_source.py``,
    ``readChangeFeed=true``) and propagate erasures into the index's
    tombstone ledger continuously — no polling cadence to tune, and
    progress rides the stream's own exactly-once offset checkpoint.

    ``available_now=True`` (default) is the one-shot maintenance call:
    catch up to the log tip, then stop — a drop-in for the batch sync
    on a cron. Pass ``available_now=False`` with a
    ``trigger_interval`` for a resident stream.

    Semantics match the batch sync per micro-batch (last change per id
    wins; only erasure-shaped commits tombstone). ONE documented
    divergence: a delete and a re-add that land in DIFFERENT
    micro-batches leave the id tombstoned (tombstone-wins is the
    ledger's contract — ``ann.clear_tombstones`` + re-append is the
    supported re-add flow, exactly as for ``delete_index_batch``). The
    batch sync over the same whole range would see the re-add and keep
    the id alive; a resident stream with small batches trades that
    range-wide view for latency. The watermark file still advances so
    batch and stream syncs interoperate on one table.

    At 100 TB: each micro-batch plans one partition per CHANGED file in
    its version range (never a table scan), the reduction shuffles only
    the batch's change rows on ``id_col``, and the ledger write is one
    small keyed partition."""
    import hashlib

    from ..sources.lakehouse_source import read_table_stream

    wm = read_sync_watermark(index_path, table_path)
    start = wm + 1
    if wm < 0:
        # BOOTSTRAP clamp, mirroring the batch sync: a never-synced
        # index starts at version 0, but on a table whose early history
        # was expire_log'd the stream source's expired-gap guard would
        # refuse 0..oldest-1 — a gap that is sound on bootstrap (the
        # index was built from a snapshot at or after the oldest
        # retained version; erasures older than the snapshot have
        # nothing to mask). An INCREMENTAL gap (wm >= 0) still reaches
        # the source guard and raises, same contract as the batch sync.
        versions = _commit_versions(table_path)
        if versions:
            start = max(start, versions[0])
    opts = {
        "read_change_feed": True,
        "starting_version": start,
        # projection pushdown: this consumer needs ONLY the id — never
        # pay the embedding-array I/O per changed file
        "columns": id_col,
    }
    if max_versions_per_batch is not None:
        opts["max_versions_per_batch"] = max_versions_per_batch
    feed = read_table_stream(spark, table_path, **opts)
    if checkpoint_dir is None:
        # keyed per (index, TABLE) like the watermark file: one index
        # fed from several tables must not resume table B's stream
        # from table A's committed offsets
        tkey = hashlib.md5(
            os.path.abspath(table_path).encode()
        ).hexdigest()[:12]
        checkpoint_dir = os.path.join(
            index_path, "_sync_checkpoint", tkey
        )
    writer = feed.writeStream.foreachBatch(
        lambda b, bid: _apply_sync_batch(
            b, bid, table_path, index_path, id_col
        )
    ).option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_interval is not None:
        writer = writer.trigger(processingTime=trigger_interval)
    return writer.start()

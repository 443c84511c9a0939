"""A minimal log-structured table format: atomic commits, time travel,
rollback, vacuum — the Delta Lake core, engine-native.

Delta cannot be installed in this container (verified; see
``sources/sinks.py``), but the two properties the pipeline actually
relies on — ATOMIC publication (readers never see a half-written table)
and TIME TRAVEL (reproduce any historical read) — are log design, not
package magic. This module implements them the way Delta/Iceberg do:

- data files are immutable; a writer lands NEW parquet files under a
  unique commit directory, invisible to readers;
- a commit is ONE json file ``_log/{version:020d}.json`` listing files
  added and removed. Creation uses exclusive-create (``open(..., 'x')``)
  — two racing writers claim the same version, one loses loudly and
  retries on the next number (optimistic concurrency, single-table
  serializability, same contract as Delta's log store);
- a snapshot at version V = replay log entries ≤ V, union adds minus
  removes. Readers list the log (metadata), then read exactly the live
  files — no locks, consistent forever;
- ``overwrite`` removes prior live files LOGICALLY (log entry); bytes
  stay for older versions until ``vacuum`` deletes files no retained
  version references;
- ``rollback`` is a metadata-only commit whose live set equals the old
  version's — instant at any size.

At 100 TB the log stays KB-per-commit (file paths + stats), snapshot
resolution is O(#commits) driver-side metadata (Delta checkpoints this;
trivial to add), and data-file granularity means an append touches only
its own files — never a table rewrite. On a real cluster the exclusive-
create needs an atomic-put store (HDFS, S3 strong consistency + a
conditional put, or a log service) — the same requirement Delta's
LogStore abstracts.
"""

from __future__ import annotations

import json
import math
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


class CommitConflict(RuntimeError):
    """Another writer claimed this version first; retry on the latest."""


def _log_dir(path: str) -> str:
    return os.path.join(path, "_log")


def _entries(path: str) -> list[dict]:
    d = _log_dir(path)
    if not os.path.isdir(d):
        return []
    out = []
    for f in sorted(os.listdir(d)):
        if f.endswith(".json"):
            with open(os.path.join(d, f)) as fh:
                out.append(json.load(fh))
    return out


def latest_version(path: str) -> int | None:
    e = _entries(path)
    return e[-1]["version"] if e else None


def _live_files(entries: list[dict], version: int | None = None) -> list[str]:
    live: list[str] = []
    for e in entries:
        if version is not None and e["version"] > version:
            break
        removed = set(e.get("removed", []))
        live = [f for f in live if f not in removed] + e.get("added", [])
    return live


def commit(
    df: DataFrame,
    path: str,
    mode: str = "append",
    max_retries: int = 5,
) -> dict:
    """Write ``df`` as one atomic commit; returns the log entry.

    Data lands first (invisible), the log entry publishes it. On a
    version race the loser re-reads the log and retries against the
    next number — its already-written data files are reused, so a retry
    costs one metadata round, not a rewrite.
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    commit_dir = f"commit-{uuid.uuid4().hex[:12]}"
    data_path = os.path.join(path, "data", commit_dir)
    df.write.mode("error").parquet(data_path)
    added = sorted(
        os.path.join("data", commit_dir, f)
        for f in os.listdir(data_path)
        if f.endswith(".parquet")
    )
    os.makedirs(_log_dir(path), exist_ok=True)
    for _ in range(max_retries):
        entries = _entries(path)
        version = (entries[-1]["version"] + 1) if entries else 0
        entry = {
            "version": version,
            "timestamp": time.time(),
            "mode": mode,
            "added": added,
            "removed": _live_files(entries) if mode == "overwrite" else [],
            "operation": "WRITE",
        }
        target = os.path.join(_log_dir(path), f"{version:020d}.json")
        try:
            with open(target, "x") as fh:  # exclusive create = the lock
                json.dump(entry, fh)
            return entry
        except FileExistsError:
            continue  # lost the race; recompute against the new log tip
    raise CommitConflict(f"lost {max_retries} version races on {path}")


def read_table(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    as_of_timestamp: float | None = None,
) -> DataFrame:
    """Snapshot read: latest, a pinned ``version``, or the newest commit
    at/before ``as_of_timestamp`` (time travel)."""
    entries = _entries(path)
    if not entries:
        raise FileNotFoundError(f"no versioned table at {path}")
    if as_of_timestamp is not None:
        eligible = [e["version"] for e in entries if e["timestamp"] <= as_of_timestamp]
        if not eligible:
            raise ValueError(f"no commit at or before ts={as_of_timestamp}")
        version = max(eligible)
    files = _live_files(entries, version)
    if not files:
        # a valid-but-empty snapshot (e.g. overwrite with 0 rows)
        return spark.createDataFrame([], _schema_of_latest(spark, path, entries))
    return spark.read.parquet(*[os.path.join(path, f) for f in files])


def _schema_of_latest(spark, path, entries):
    for e in reversed(entries):
        if e.get("added"):
            return spark.read.parquet(os.path.join(path, e["added"][0])).schema
    raise ValueError(f"table {path} has no data files in any version")


def rollback(spark: SparkSession, path: str, to_version: int) -> dict:
    """Publish a NEW commit whose live set equals ``to_version``'s —
    metadata-only, instant at any size, history preserved (this is
    Delta's RESTORE, not a destructive reset)."""
    entries = _entries(path)
    target_live = _live_files(entries, to_version)
    current_live = _live_files(entries)
    version = entries[-1]["version"] + 1
    entry = {
        "version": version,
        "timestamp": time.time(),
        "mode": "restore",
        "added": [f for f in target_live if f not in set(current_live)],
        "removed": [f for f in current_live if f not in set(target_live)],
        "operation": f"RESTORE({to_version})",
    }
    target = os.path.join(_log_dir(path), f"{version:020d}.json")
    with open(target, "x") as fh:
        json.dump(entry, fh)
    return entry


def history(path: str) -> list[dict]:
    """Commit log, oldest first (version/timestamp/operation/file counts)."""
    return [
        {
            "version": e["version"],
            "timestamp": e["timestamp"],
            "operation": e["operation"],
            "mode": e["mode"],
            "n_added": len(e.get("added", [])),
            "n_removed": len(e.get("removed", [])),
        }
        for e in _entries(path)
    ]


def vacuum(path: str, keep_last: int = 1) -> list[str]:
    """Physically delete data files referenced by NO retained version
    (the last ``keep_last`` snapshots stay readable; older time travel
    is given up — exactly Delta's retention trade-off). Returns the
    deleted relative paths."""
    entries = _entries(path)
    if not entries:
        return []
    versions = [e["version"] for e in entries]
    retained = versions[-max(keep_last, 1):]
    keep: set[str] = set()
    for v in retained:
        keep.update(_live_files(entries, v))
    all_files: set[str] = set()
    for e in entries:
        all_files.update(e.get("added", []))
    doomed = sorted(all_files - keep)
    for rel in doomed:
        full = os.path.join(path, rel)
        if os.path.exists(full):
            os.remove(full)
    return doomed


def optimize_table(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Delta-OPTIMIZE semantics: rewrite the CURRENT live set into
    target-sized files and publish the compacted layout as one atomic
    commit (adds the new files, removes the fragmented ones). History is
    untouched — older versions still resolve to the original files until
    ``vacuum`` reclaims them. Readers never see a half-compacted table:
    the swap is the log entry.

    Returns the commit entry plus before/after file counts. Sizing uses
    on-disk bytes-per-row like ``maintenance.compact_table``.
    """
    entries = _entries(path)
    live = _live_files(entries)
    if not live:
        raise ValueError(f"nothing to optimize at {path}")
    full = [os.path.join(path, f) for f in live]
    total_bytes = sum(os.path.getsize(f) for f in full if os.path.exists(f))
    df = spark.read.parquet(*full)
    rows = df.count()
    bytes_per_row = max(total_bytes / max(rows, 1), 1e-6)
    records_per_file = max(int(target_file_bytes / bytes_per_row), 1)
    n_out = max(math.ceil(total_bytes / target_file_bytes), 1)

    commit_dir = f"commit-{uuid.uuid4().hex[:12]}"
    data_path = os.path.join(path, "data", commit_dir)
    (
        df.repartition(n_out)
        .write.mode("error")
        .option("maxRecordsPerFile", records_per_file)
        .parquet(data_path)
    )
    added = sorted(
        os.path.join("data", commit_dir, f)
        for f in os.listdir(data_path)
        if f.endswith(".parquet")
    )
    version = entries[-1]["version"] + 1
    entry = {
        "version": version,
        "timestamp": time.time(),
        "mode": "optimize",
        "added": added,
        "removed": live,
        "operation": f"OPTIMIZE({len(live)}->{len(added)})",
    }
    with open(os.path.join(_log_dir(path), f"{version:020d}.json"), "x") as fh:
        json.dump(entry, fh)
    return {**entry, "files_before": len(live), "files_after": len(added)}

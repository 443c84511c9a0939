"""Cross-table savepoints: pin the exact version of EVERY versioned
table a job read, in one receipt, and re-read that world later.

A training run consumes several versioned tables at once (curated
corpus, benchmark set, embedding source, gold rollups). Each is
individually time-travelable, but reproducing the RUN needs the tuple
of versions it saw — that tuple is nowhere unless someone records it.
A savepoint is that record: ``{name: {path, version, timestamp}}``,
written as one JSON receipt next to the training config (and
fingerprintable by ``release.config_fingerprint`` like any other
config). ``read_savepoint`` then reopens any member AT ITS PINNED
VERSION, years later, regardless of what landed since.

This is bookkeeping, not a transaction: the versions are captured
table-by-table (each one atomic via the log; the set is as consistent
as the moment of capture — capture BEFORE the job starts reading, then
pass the savepoint's frames to the job, and the set is exactly
consistent by construction).

Retention contract: a savepoint only replays while every member's
pinned version survives ``expire_log``/``vacuum`` — same rule as any
time travel, now checkable in one place (``verify_savepoint`` reports
per-member liveness instead of failing mid-train).

Scale: capture and verify are pure log metadata (no data scan);
``read_savepoint`` costs exactly a pinned ``read_table``.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession

from ._atomic import atomic_write_json
from .versioned import latest_version, read_table


def create_savepoint(
    tables: dict[str, str], out_path: str | None = None
) -> dict:
    """Capture ``{name: table_path}`` at each table's CURRENT version.
    Returns the savepoint dict; also writes it to ``out_path`` (JSON,
    atomic) when given."""
    sp: dict = {"created": time.time(), "tables": {}}
    for name, path in tables.items():
        v = latest_version(path)
        if v is None:
            raise FileNotFoundError(f"no versioned table at {path} ({name})")
        sp["tables"][name] = {
            "path": os.path.abspath(path),
            "version": v,
        }
    if out_path:
        atomic_write_json(out_path, sp)
    return sp


def load_savepoint(path: str) -> dict:
    return json.load(open(path))


def read_savepoint(
    spark: SparkSession, savepoint: dict | str, name: str
) -> DataFrame:
    """Open member ``name`` at its pinned version (savepoint dict or
    receipt-file path)."""
    sp = load_savepoint(savepoint) if isinstance(savepoint, str) else savepoint
    m = sp["tables"][name]
    return read_table(spark, m["path"], version=m["version"])


def verify_savepoint(savepoint: dict | str) -> dict:
    """Per-member liveness: can each pinned version still be resolved
    (or has retention expired it)? Returns ``{name: {"ok", "version",
    "latest", "reason"?}}`` — check this BEFORE a long job, not during
    it."""
    from .versioned import _checkpoint_versions, _commit_versions

    sp = load_savepoint(savepoint) if isinstance(savepoint, str) else savepoint
    out: dict = {}
    for name, m in sp["tables"].items():
        path, v = m["path"], m["version"]
        lv = latest_version(path)
        if lv is None:
            out[name] = {"ok": False, "version": v, "latest": None,
                         "reason": "table missing"}
            continue
        known = _commit_versions(path) + _checkpoint_versions(path)
        oldest = min(known)
        if v < oldest:
            out[name] = {"ok": False, "version": v, "latest": lv,
                         "reason": f"expired (history starts at {oldest})"}
        else:
            out[name] = {"ok": True, "version": v, "latest": lv}
    return out

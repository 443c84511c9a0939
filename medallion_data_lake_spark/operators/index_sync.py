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
  per-index watermark to the log tip, keeps ``_change_type='delete'``
  rows from ERASURE-shaped commits only (``delete`` / ``delete_dv`` /
  ``merge`` — an overwrite or restore also emits delete rows, but those
  are REPLACEMENT semantics: the doc population changes wholesale and
  the index is re-ingested alongside, so tombstoning them would mask
  the re-added corpus forever under tombstone-wins), extracts the ids,
  and lands them in the index's tombstone ledger.
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
from .versioned import _entries, latest_version, table_changes

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
    import uuid

    p = _state_path(index_path)
    state = {"watermarks": {}}
    if os.path.exists(p):
        state = json.load(open(p))
        state.setdefault("watermarks", {})
    state["watermarks"][os.path.abspath(table_path)] = int(version)
    tmp = f"{p}.{os.getpid()}.{uuid.uuid4().hex[:8]}.tmp"
    with open(tmp, "w") as fh:
        json.dump(state, fh)
    os.replace(tmp, p)  # same atomic-publish discipline as _write_meta


def sync_deletes_to_index(
    spark,
    table_path: str,
    index_path: str,
    id_col: str = "vec_id",
) -> dict:
    """Propagate the table's erasures since the last sync into the
    index's tombstone ledger. Returns
    ``{"from_version", "to_version", "ids_tombstoned"}`` (a no-op sync
    returns ids_tombstoned=0 and leaves the ledger untouched).

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
    erasure_versions = [
        e["version"]
        for e in _entries(table_path, lo=lo, hi=lv)
        if e.get("mode") in ERASURE_MODES
    ]
    n = 0
    if erasure_versions:
        feed = table_changes(spark, table_path, lo, lv)
        doomed = (
            feed.filter(
                (F.col("_change_type") == "delete")
                & F.col("_commit_version").isin(erasure_versions)
            )
            .select(F.col(id_col).alias("vec_id"))
            .distinct()
        )
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
    return {"from_version": lo, "to_version": lv, "ids_tombstoned": int(n)}

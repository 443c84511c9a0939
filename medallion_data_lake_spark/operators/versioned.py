"""A minimal log-structured table format: atomic commits, time travel,
rollback, vacuum, OPTIMIZE, idempotent writer transactions, and log
checkpoints — the Delta Lake core, engine-native.

Delta cannot be installed in this container (verified; see
``sources/sinks.py``), but the properties the pipeline actually relies
on — ATOMIC publication (readers never see a half-written table) and
TIME TRAVEL (reproduce any historical read) — are log design, not
package magic. This module implements them the way Delta/Iceberg do:

- data files are immutable; a writer lands NEW parquet files under a
  unique commit directory, invisible to readers;
- a commit is ONE json file ``_log/{version:020d}.json`` listing files
  added and removed. Creation uses exclusive-create (``open(..., 'x')``)
  — two racing writers claim the same version, one loses loudly and
  retries on the next number (optimistic concurrency, single-table
  serializability, same contract as Delta's log store). ALL log writers
  (commit, rollback, OPTIMIZE) go through the same claim-retry loop;
- a snapshot at version V = the newest CHECKPOINT at/before V plus a
  replay of the log tail after it. Every ``CHECKPOINT_INTERVAL``-th
  commit also writes ``{version:020d}.checkpoint.json`` holding the full
  live-file set (and writer-txn watermarks), so snapshot resolution
  reads O(1) checkpoint + O(interval) tail entries instead of the whole
  log — Delta's ``_last_checkpoint`` design. Checkpoints are derived,
  redundant state: losing one only means a longer replay;
- ``overwrite`` removes prior live files LOGICALLY (log entry); bytes
  stay for older versions until ``vacuum`` deletes files no retained
  version references;
- ``rollback`` is a metadata-only commit whose live set equals the old
  version's — instant at any size;
- a writer may tag a commit with ``(txn_app_id, txn_version)``; a commit
  whose txn_version is ≤ the app's recorded watermark is SKIPPED. This
  is Delta's txnAppId/txnVersion idempotent-write contract: a replayed
  streaming micro-batch (crash between the table commit and the stream
  checkpoint epoch commit) must not double-merge;
- ``rename_column`` / ``drop_column`` are METADATA-ONLY commits (Delta's
  column-mapping "name" mode): the log speaks logical names, data files
  keep their sticky physical names, reads project one to the other per
  version — so a rename or drop is one log entry at any table size, and
  per-file stats/blooms (keyed physically) keep pruning across renames.

At 100 TB the log stays KB-per-commit (file paths + stats), and
data-file granularity means an append touches only its own files —
never a table rewrite. On a real cluster the exclusive-create needs an
atomic-put store (HDFS, S3 conditional PUT, or a log service) — the
same requirement Delta abstracts as its LogStore, and this module does
too: every log touch goes through ``operators/logstore.py``
(exclusive-put / list / read / delete behind ``get_log_store()``), so
a cluster backend is a LogStore subclass, not a rewrite. Data-file IO
stays on Spark's Hadoop filesystem layer, exactly like Delta.
"""

from __future__ import annotations

import json
import math
import os
import re
import shutil
import time
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .logstore import get_log_store

CHECKPOINT_INTERVAL = 10  # write a log checkpoint every N commits

_ENTRY_RE = re.compile(r"^(\d{20})\.json$")
_CKPT_RE = re.compile(r"^(\d{20})\.checkpoint\.json$")


class CommitConflict(RuntimeError):
    """Another writer claimed this version first; retry on the latest."""


def _log_dir(path: str) -> str:
    return os.path.join(path, "_log")


def _commit_versions(path: str) -> list[int]:
    return sorted(
        int(m.group(1))
        for f in get_log_store().list(_log_dir(path))
        if (m := _ENTRY_RE.match(f))
    )


def _read_entry(path: str, version: int) -> dict:
    return json.loads(get_log_store().read(
        os.path.join(_log_dir(path), f"{version:020d}.json")
    ))


def _entries(path: str, lo: int = 0, hi: int | None = None) -> list[dict]:
    """Commit entries with lo <= version <= hi, oldest first."""
    return [
        _read_entry(path, v)
        for v in _commit_versions(path)
        if v >= lo and (hi is None or v <= hi)
    ]


def latest_version(path: str) -> int | None:
    versions = _commit_versions(path)
    return versions[-1] if versions else None


def _replay(live: list[str], entries: list[dict]) -> list[str]:
    for e in entries:
        removed = set(e.get("removed", []))
        live = [f for f in live if f not in removed] + e.get("added", [])
    return live


def _live_files(entries: list[dict], version: int | None = None) -> list[str]:
    if version is not None:
        entries = [e for e in entries if e["version"] <= version]
    return _replay([], entries)


# ---------------------------------------------------------------------------
# Log checkpoints — snapshot state every N commits so resolution is
# O(1) checkpoint + O(N) tail, not O(#commits)
# ---------------------------------------------------------------------------


def _checkpoint_versions(path: str) -> list[int]:
    return sorted(
        int(m.group(1))
        for f in get_log_store().list(_log_dir(path))
        if (m := _CKPT_RE.match(f))
    )


def _read_checkpoint(path: str, version: int) -> dict:
    """Read one checkpoint, tolerating the non-atomic replace window of
    LogStore backends without atomic overwrite (the default ``replace``
    is delete + exclusive-create): a reader that listed the checkpoint
    just before an upgrader swapped it would otherwise crash on a file
    that exists again milliseconds later. Brief retry, then raise — a
    checkpoint that STAYS missing is real corruption and must be loud."""
    target = os.path.join(_log_dir(path), f"{version:020d}.checkpoint.json")
    store = get_log_store()
    for attempt in range(5):
        try:
            return json.loads(store.read(target))
        except (FileNotFoundError, KeyError):
            if attempt == 4:
                raise
            time.sleep(0.05 * (attempt + 1))


def _state_at(path: str, version: int | None = None) -> tuple[list[str], dict]:
    """(live_files, txn_watermarks) at ``version`` (None = latest),
    resolved from the newest checkpoint at/before it plus the log tail —
    the read path the checkpoints exist for."""
    if version is not None and version < 0:
        return [], {}
    ckpts = [
        v for v in _checkpoint_versions(path)
        if version is None or v <= version
    ]
    if ckpts:
        ck = _read_checkpoint(path, ckpts[-1])
        live, txns = list(ck["live"]), dict(ck.get("txns", {}))
        tail = _entries(path, lo=ckpts[-1] + 1, hi=version)
    else:
        live, txns = [], {}
        tail = _entries(path, hi=version)
    live = _replay(live, tail)
    for e in tail:
        t = e.get("txn")
        if t:
            txns[t["app_id"]] = max(txns.get(t["app_id"], -1), t["version"])
    return live, txns


def _mixed_schema_at(path: str, version: int | None = None) -> bool:
    """True when the snapshot's live files may span >1 schema (an
    evolved append landed at/before ``version``) — the reads must then
    pay mergeSchema. Resolved checkpoint + tail like everything else."""
    if version is not None and version < 0:
        return False
    ckpts = [
        v for v in _checkpoint_versions(path)
        if version is None or v <= version
    ]
    mixed = False
    lo = 0
    if ckpts:
        mixed = bool(_read_checkpoint(path, ckpts[-1]).get("mixed_schema"))
        lo = ckpts[-1] + 1
    for e in _entries(path, lo=lo, hi=version):
        if e.get("unified_schema"):
            # a FULL-rewrite OPTIMIZE compacted every live file to the
            # union schema: single-schema again, mergeSchema off
            mixed = False
        if e.get("mode") in ("overwrite", "restore"):
            # snapshot replaced wholesale: mixedness is exactly what the
            # entry itself records (rollback stamps schema_changed when
            # the RESTORED live set spans >1 schema — without that, a
            # restore of an evolved snapshot after an overwrite read
            # without mergeSchema and nondeterministically dropped the
            # evolved columns)
            mixed = False
        if e.get("schema_changed"):
            mixed = True
    return mixed


def _dv_at(path: str, version: int | None = None) -> dict[str, list[int]]:
    """Deletion-vector state at ``version``: live file → sorted deleted
    row positions (merge-on-read deletes, Delta's DV model). Replay
    rules: a ``delete_dv`` entry unions its positions into the file's
    vector; a file leaving the live set (rewrite/overwrite/OPTIMIZE/
    vacuum-irrelevant) drops its vector with it; a restore adopts the
    TARGET version's vectors (the restored live set is the target's).
    Resolved checkpoint + tail like every other derived state."""
    if version is not None and version < 0:
        return {}
    ckpts = [
        v for v in _checkpoint_versions(path)
        if version is None or v <= version
    ]
    if ckpts:
        dv: dict[str, set[int]] = {
            f: set(ps)
            for f, ps in _read_checkpoint(path, ckpts[-1]).get("dv", {}).items()
        }
        tail = _entries(path, lo=ckpts[-1] + 1, hi=version)
    else:
        dv = {}
        tail = _entries(path, hi=version)
    for e in tail:
        if e.get("mode") == "restore" and e.get("restore_of") is not None:
            dv = {
                f: set(ps)
                for f, ps in _dv_at(path, int(e["restore_of"])).items()
            }
            continue
        for f in e.get("removed", []):
            dv.pop(f, None)
        for f, ps in e.get("dv", {}).items():
            dv.setdefault(f, set()).update(ps)
    live, _ = _state_at(path, version)
    live_set = set(live)
    return {f: sorted(ps) for f, ps in dv.items() if f in live_set and ps}


def _apply_dvs(spark, df, path: str, files: list[str],
               dvs: dict[str, list[int]]):
    """Anti-join the deleted (file, row position) pairs out of a scan of
    ``files``. The DV side is driver-held and bounded by construction
    (``delete_rows_dv`` refuses above ``max_dv_rows``), so this is one
    broadcast anti-join keyed on (file_name, row_index) — part-file
    names are globally unique (uuid per write), which sidesteps URI-
    scheme mismatches between ``_metadata.file_path`` renderings."""
    from pyspark.sql import functions as F

    relevant = {f: ps for f, ps in dvs.items() if f in set(files)}
    if not relevant:
        return df
    pairs = [
        (os.path.basename(f), int(p)) for f, ps in relevant.items() for p in ps
    ]
    dv_df = spark.createDataFrame(pairs, "_dv_fn string, _dv_ri long")
    out = (
        df.withColumn("_dv_fn", F.col("_metadata.file_name"))
        .withColumn("_dv_ri", F.col("_metadata.row_index"))
        .join(F.broadcast(dv_df), ["_dv_fn", "_dv_ri"], "left_anti")
        .drop("_dv_fn", "_dv_ri")
    )
    return out


def _table_schema_json_logged(path: str, version: int | None = None) -> dict | None:
    """table_schema JSON at ``version`` from the LOG + CHECKPOINTS alone
    (no SparkSession, no parquet footers): newest TAIL entry carrying
    the field, else the newest prior checkpoint carrying it, else (for
    pre-field legacy checkpoints only) the remaining entries below the
    checkpoint, else None. Checkpoint + tail like every other resolver
    — this runs on every dtype lookup, so it must not re-parse the
    whole log when a checkpoint already folds the answer."""
    ckpts = [
        v for v in _checkpoint_versions(path)
        if version is None or v <= version
    ]
    tail_lo = (ckpts[-1] + 1) if ckpts else 0
    for e in reversed(_entries(path, lo=tail_lo, hi=version)):
        if e.get("table_schema") is not None:
            return e["table_schema"]
    for cv in reversed(ckpts):
        ts = _read_checkpoint(path, cv).get("table_schema")
        if ts is not None:
            return ts
    if ckpts:  # legacy checkpoints without the field: full-walk fallback
        for e in reversed(_entries(path, hi=ckpts[-1])):
            if e.get("table_schema") is not None:
                return e["table_schema"]
    return None


#: every field a current-generation checkpoint carries; a checkpoint
#: missing any of these was written by an older code generation and must
#: be upgraded before the log below it is expired (the resolvers'
#: legacy fallbacks walk the pre-checkpoint entries, which expire_log
#: deletes)
_CKPT_FIELDS = frozenset(
    {"live", "txns", "file_stats", "mixed_schema", "dv", "table_schema",
     "column_mapping"}
)


def _write_checkpoint(path: str, version: int, upgrade: bool = False) -> None:
    """Materialize derived state at ``version``. Best-effort: a racing
    checkpointer (or a crash here) costs nothing but replay length.

    ``upgrade=True`` (expire_log's path) additionally REPLACES a
    pre-existing checkpoint that lacks any current field: exclusive-
    create alone would keep a legacy (pre-table_schema) checkpoint
    as-is, and once expire_log deletes the entries below it the
    legacy full-walk fallbacks in ``_table_schema_json_logged`` /
    ``_dv_at`` find nothing — the silent-downgrade regression the
    field was added to fix would resurface on migrated tables. The
    replace is atomic on backends that support it (``LogStore.replace``:
    POSIX rename, in-memory swap); on the delete+create fallback a
    reader in the gap retries (``_read_checkpoint``), and it only ever
    runs while the full log below still exists, so even a crash in the
    gap resolves from entries."""
    live, txns = _state_at(path, version)
    stats = _file_stats_at(path, version)
    # resolve ALL derived state before the exclusive-create: the open()
    # below lands an (initially empty) checkpoint file that resolution
    # helpers would otherwise pick up and fail to parse
    mixed = _mixed_schema_at(path, version)
    dv = _dv_at(path, version)
    # persist the table (union) schema so expire_log truncating the log
    # to a schema-less tail (DML/OPTIMIZE entries are schema-neutral)
    # can't silently downgrade _table_schema_at to a one-file footer
    table_schema = _table_schema_json_logged(path, version)
    column_mapping = _column_mapping_at(path, version)
    target = os.path.join(_log_dir(path), f"{version:020d}.checkpoint.json")
    store = get_log_store()
    payload = json.dumps(
        {"version": version, "live": live, "txns": txns,
         "file_stats": stats, "mixed_schema": mixed, "dv": dv,
         "table_schema": table_schema, "column_mapping": column_mapping,
         "timestamp": time.time()},
    )
    try:
        store.put_exclusive(target, payload)
    except FileExistsError:
        if not upgrade:
            return
        try:
            existing = json.loads(store.read(target))
        except Exception:
            existing = {}
        if _CKPT_FIELDS.issubset(existing):
            return  # current-generation checkpoint; keep it
        # atomic where the backend allows (POSIX rename / mutex swap);
        # on backends with only the delete+create fallback, readers
        # tolerate the gap via _read_checkpoint's retry
        store.replace(target, payload)


def latest_txn_version(path: str, app_id: str) -> int | None:
    """Highest txn_version this app has committed, or None — the
    idempotence watermark (Delta's txnAppId/txnVersion)."""
    _, txns = _state_at(path)
    v = txns.get(app_id)
    return int(v) if v is not None else None


# ---------------------------------------------------------------------------
# The one log-claim loop every writer goes through
# ---------------------------------------------------------------------------


def watermark_covered(path: str, tw: dict | None) -> bool:
    """True when the table's recorded watermark for ``tw["app_id"]``
    already covers ``tw["version"]`` — THE coverage predicate, shared
    by the publish gates (``commit``/``wap.publish_staged``), the stage
    fast-path, and the txn coordinator's classifiers so they can never
    diverge (a classifier stricter or looser than the gate mislabels a
    batch as lost or as applied)."""
    if tw is None:
        return False
    seen = latest_txn_version(path, tw["app_id"])
    return seen is not None and tw["version"] <= seen


def _publish(
    path: str,
    build_entry: Callable[[int], dict | None],
    max_retries: int = 5,
    checkpoint_interval: int = CHECKPOINT_INTERVAL,
) -> dict | None:
    """Claim the next version with exclusive-create, retrying on races.

    ``build_entry(version)`` is re-invoked against the fresh log tip on
    every attempt, so added/removed/txn decisions are recomputed after a
    lost race (the bug the round-3 advice flagged in rollback/OPTIMIZE:
    a bare ``open(..., 'x')`` with stale state raises — or worse,
    publishes — instead of recomputing). It may return None to abort
    cleanly (idempotent skip). After a successful claim, every
    ``checkpoint_interval``-th commit also writes a log checkpoint.
    """
    store = get_log_store()
    store.ensure_dir(_log_dir(path))
    for _ in range(max_retries):
        lv = latest_version(path)
        version = 0 if lv is None else lv + 1
        entry = build_entry(version)
        if entry is None:
            return None
        target = os.path.join(_log_dir(path), f"{version:020d}.json")
        try:
            # exclusive create = the lock (LogStore contract: atomic
            # create-if-absent, FileExistsError on conflict)
            store.put_exclusive(target, json.dumps(entry))
        except FileExistsError:
            continue  # lost the race; recompute against the new log tip
        if checkpoint_interval and (version + 1) % checkpoint_interval == 0:
            _write_checkpoint(path, version)
        return entry
    raise CommitConflict(f"lost {max_retries} version races on {path}")


def _collect_file_stats(
    spark: SparkSession,
    path: str,
    data_path: str,
    stats_cols: tuple[str, ...],
) -> dict[str, dict[str, list]]:
    """Per-file [min, max] for ``stats_cols`` over a just-written commit
    directory — one small aggregation over only the NEW files (grouped by
    input_file_name), the metadata every lakehouse format keeps per data
    file. Values are JSON-rendered (numbers stay numbers; everything else
    becomes its ISO string, which compares consistently)."""
    from pyspark.sql import functions as F

    aggs = []
    for c in stats_cols:
        aggs += [F.min(c).alias(f"{c}__min"), F.max(c).alias(f"{c}__max")]
    rows = (
        spark.read.parquet(data_path)
        .groupBy(F.input_file_name().alias("_f"))
        .agg(*aggs)
        .collect()
    )

    def render(v):
        return v if isinstance(v, (int, float, bool)) or v is None else str(v)

    rel_by_base = {
        os.path.basename(f): f
        for f in (
            os.path.join(
                "data", os.path.basename(data_path), name
            )
            for name in os.listdir(data_path)
            if name.endswith(".parquet")
        )
    }
    out: dict[str, dict[str, list]] = {}
    for r in rows:
        base = os.path.basename(r["_f"].split("?")[0])
        rel = rel_by_base.get(base)
        if rel is None:
            continue
        out[rel] = {
            c: [render(r[f"{c}__min"]), render(r[f"{c}__max"])]
            for c in stats_cols
        }
    return out


def _stat_probe(v, dtype=None):
    """Render a RANGE-probe bound exactly as :func:`_collect_file_stats`
    rendered the stored min/max (numbers/bools native, everything else
    its ``str``) so overlap compares never cross Python types — a
    datetime bound against a string-rendered stat raised TypeError
    before this existed. Temporal cross-type probes normalize to the
    COLUMN's grain first: a ``date`` probing a TIMESTAMP column promotes
    to midnight (the instant Spark's implicit cast gives the residual
    row filter), and a ``datetime`` probing a DATE column demotes to its
    date — exact for an upper bound (dates ≤ any instant of day D are
    dates ≤ D) and conservative for a lower bound (reads at most one
    extra date's files; the residual filter keeps results exact).
    Without the demotion the longer timestamp rendering lexically
    exceeds the stored date string and boundary files are SILENTLY
    pruned."""
    import datetime as _dt

    from pyspark.sql.types import DateType, TimestampType

    if (
        dtype is not None and isinstance(dtype, TimestampType)
        and isinstance(v, _dt.date) and not isinstance(v, _dt.datetime)
    ):
        v = _dt.datetime.combine(v, _dt.time.min)
    elif (
        dtype is not None and isinstance(dtype, DateType)
        and isinstance(v, _dt.datetime)
    ):
        v = v.date()
    return v if isinstance(v, (int, float, bool)) or v is None else str(v)


BLOOM_BITS = 4096   # 512 B/file/col in the log — KB-scale at any layout
BLOOM_HASHES = 4    # k=4 at m/n >= 8 keeps FP rate ~2.4%
_ISIN_BLOOM_MAX = 128  # isin lists above this skip bloom probing (see
# read_table_pruned: probe cost grows with the list, skipping yield
# vanishes — range admission + the residual IN keep results exact)


def _bloom_hash(col, seed: int):
    """The one hash both sides share: xxhash64 over the STRING rendering
    (type-insensitive — a read probing id=5 must hash identically whether
    the column is int or long)."""
    from pyspark.sql import functions as F

    return F.xxhash64(F.lit(seed), col.cast("string"))


def _probe_lit(v, dtype=None):
    """Probe-side literal rendered EXACTLY as the build side rendered
    the column: :func:`_collect_bloom_filters` hashes
    ``col.cast("string")`` — SPARK's rendering of the COLUMN's type —
    so the probe must cast the literal to the column's table-schema
    type before the shared string cast. Python's ``str(v)`` is not
    that rendering (``True`` vs ``true``; int ``5`` probing a double
    column vs ``5.0``), and the mismatch makes the bloom answer
    "definitely absent" for values that ARE present: silently missing
    rows on ``eq=`` point reads and silently skipped keyed deletes/
    updates. With no known dtype the native-typed ``F.lit(v)`` still
    beats ``str(v)`` (a bool literal renders ``true``)."""
    from pyspark.sql import functions as F

    lit = F.lit(v)
    return lit.cast(dtype) if dtype is not None else lit


def _column_dtypes(spark, path: str, version: int | None = None) -> dict:
    """{column: DataType} of the table schema at ``version`` — what the
    bloom probe sites need to render literals build-identically."""
    try:
        return {
            f.name: f.dataType
            for f in _table_schema_at(spark, path, version).fields
        }
    except Exception:
        return {}  # schema unresolvable: fall back to native-lit probes


def _collect_bloom_filters(
    spark: SparkSession,
    data_path: str,
    bloom_cols: tuple[str, ...],
    bits: int = BLOOM_BITS,
    k: int = BLOOM_HASHES,
) -> dict[str, dict[str, str]]:
    """Per-file Bloom bitsets for ``bloom_cols`` over a just-written
    commit dir — the point-lookup complement of the [min,max] ranges
    (an equality probe on a high-NDV key where every file's range
    overlaps everything). One aggregation over only the new files:
    collect_set of ≤ bits ints per file per hash — KB-scale. Encoded
    ``"{bits}:{k}:" + base64(bitset)`` under the reserved stats key
    ``"<col>__bloom"`` so it rides the existing file_stats plumbing
    (log entry → checkpoint folding → _file_stats_at) untouched."""
    import base64

    from pyspark.sql import functions as F

    aggs = [
        F.collect_set(
            F.pmod(_bloom_hash(F.col(c), i), F.lit(bits))
        ).alias(f"{c}__{i}")
        for c in bloom_cols
        for i in range(k)
    ]
    rows = (
        spark.read.parquet(data_path)
        .groupBy(F.input_file_name().alias("_f"))
        .agg(*aggs)
        .collect()
    )
    out: dict[str, dict[str, str]] = {}
    commit_dir = os.path.basename(data_path)
    for r in rows:
        base = os.path.basename(r["_f"].split("?")[0])
        rel = os.path.join("data", commit_dir, base)
        enc: dict[str, str] = {}
        for c in bloom_cols:
            bitset = bytearray((bits + 7) // 8)
            for i in range(k):
                for pos in r[f"{c}__{i}"] or []:
                    bitset[pos // 8] |= 1 << (pos % 8)
            enc[f"{c}__bloom"] = (
                f"{bits}:{k}:" + base64.b64encode(bytes(bitset)).decode()
            )
        out[rel] = enc
    return out


def _bloomed_cols(stats: dict[str, dict], files) -> tuple[str, ...]:
    """Columns with a recorded bloom among ``files`` — DML rewrites
    re-record blooms for exactly these so point-skipping survives
    updates/deletes/merges (a rewritten file without its bloom is
    still CORRECT, just conservatively read)."""
    suffix = "__bloom"
    return tuple(sorted({
        k[:-len(suffix)]
        for f in files
        for k in stats.get(f, {})
        if k.endswith(suffix)
    }))


def _bloom_may_contain(encoded: str, raw_hashes: list[int]) -> bool:
    """Probe an encoded bitset with the k raw xxhash64 values (positions
    derive per file from its own recorded bits)."""
    import base64

    bits_s, k_s, b64 = encoded.split(":", 2)
    bits, k = int(bits_s), int(k_s)
    bitset = base64.b64decode(b64)
    for raw in raw_hashes[:k]:
        pos = raw % bits
        if not (bitset[pos // 8] >> (pos % 8)) & 1:
            return False
    return True


def _file_stats_at(path: str, version: int | None = None) -> dict[str, dict]:
    """Per-file stats for the LIVE files at ``version`` — resolved from
    the newest checkpoint + tail like :func:`_state_at`."""
    if version is not None and version < 0:
        return {}
    ckpts = [
        v for v in _checkpoint_versions(path)
        if version is None or v <= version
    ]
    if ckpts:
        ck = _read_checkpoint(path, ckpts[-1])
        stats = dict(ck.get("file_stats", {}))
        tail = _entries(path, lo=ckpts[-1] + 1, hi=version)
    else:
        stats = {}
        tail = _entries(path, hi=version)
    for e in tail:
        stats.update(e.get("file_stats", {}))
    live, _ = _state_at(path, version)
    live_set = set(live)
    return {f: s for f, s in stats.items() if f in live_set}


def _write_stats_partials(
    spark: SparkSession,
    path: str,
    data_path: str,
    analyze_cols: tuple[str, ...] | None,
) -> str:
    """Record PER-FILE mergeable stats partials for a just-written commit
    directory under ``_stats/<commit_dir>/`` — the write-side half of
    :func:`analyze_table`. One columnar scan over only the NEW files
    (operators/stats.py:collect_mergeable_stats_per_file); ``file`` is
    normalized to the log-relative path so snapshot resolution can filter
    partials by the live set. ``analyze_cols=None`` means all columns."""
    from pyspark.sql import functions as F

    from .stats import collect_mergeable_stats_per_file

    commit_dir = os.path.basename(data_path)
    partials = collect_mergeable_stats_per_file(
        spark.read.parquet(data_path),
        tuple(analyze_cols) if analyze_cols else None,
    ).withColumn(
        "file",
        F.concat(
            F.lit(f"data/{commit_dir}/"),
            F.substring_index(
                F.substring_index(F.col("file"), "?", 1), "/", -1
            ),
        ),
    )
    rel = os.path.join("_stats", commit_dir)
    partials.write.mode("error").parquet(os.path.join(path, rel))
    return rel


def analyze_table(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    finalize: bool = True,
) -> tuple[DataFrame, dict]:
    """Snapshot ANALYZE with NO data rescan: merge the per-file stats
    partials of exactly the files LIVE at ``version`` (counts add, HLL
    sketches union, extrema take typed min/max — operators/stats.py
    merge contract). Works for any retained snapshot — time-traveled
    table stats — and stays correct under overwrite/MERGE/OPTIMIZE
    because dead files' partials are filtered out, not un-merged.

    Returns ``(stats_df, report)``: the classic ANALYZE vector (or raw
    mergeable partials when ``finalize=False``) plus a coverage report —
    files committed without ``analyze_stats`` have no partials and are
    surfaced as ``files_missing`` rather than silently treated as empty.

    At 100 TB: reads KBs of partials (one row per file per column), the
    data files themselves are never opened."""
    from .stats import finalize_stats, merge_stats_partials

    live, _ = _state_at(path, version)
    stats_root = os.path.join(path, "_stats")
    report = {"files_total": len(live), "files_covered": 0,
              "files_missing": len(live)}
    if not os.path.isdir(stats_root) or not live:
        raise ValueError(
            f"no stats partials recorded at {path} (commit with "
            "analyze_stats=True first)"
        )
    partials = (
        spark.read.option("recursiveFileLookup", "true").parquet(stats_root)
    )
    from pyspark.sql import functions as F

    # live-set filter as a broadcast join, not an isin literal list — a
    # large table's snapshot can hold 10^5-10^6 files and a million-term
    # IN list does not belong in a plan
    live_df = spark.createDataFrame([(f,) for f in live], "file string")
    alive = partials.join(F.broadcast(live_df), "file")
    covered = {r["file"] for r in alive.select("file").distinct().collect()}
    report["files_covered"] = len(covered)
    report["files_missing"] = len(set(live) - covered)
    merged = merge_stats_partials(alive.drop("file"))
    out = finalize_stats(merged) if finalize else merged
    # partials are keyed by PHYSICAL column names (they were collected
    # over the written files); surface the version's LOGICAL names so a
    # post-rename ANALYZE reads like the table the user queries
    cm = _column_mapping_at(path, version)
    if not _cm_is_identity(cm) and "column" in out.columns:
        rev = spark.createDataFrame(
            [(p, l) for l, p in cm.get("map", {}).items()],
            "column string, _logical string",
        )
        out = (
            out.join(F.broadcast(rev), "column", "left")
            .withColumn("column", F.coalesce("_logical", "column"))
            .drop("_logical")
        )
    return out, report


def _check_append_drift(path, current, batch_schema, allow, what="append"):
    """The table's one schema-enforcement rule, shared by live commits
    (:func:`commit`) and staged ones (``wap.stage_commit`` at stage
    time AND ``wap.publish_staged`` against the fresh tip) — three call
    sites, ONE rule, so a new drift refinement cannot silently let a
    staged batch publish what a direct commit would refuse. Returns
    ``(union_schema, schema_changed)``; raises ``SchemaDriftError`` on
    a type change or non-additive drift without the evolution flag."""
    from .evolution import SchemaDriftError, diff_schemas

    cur_types = {f.name: f.dataType.simpleString() for f in current.fields}
    new_types = {f.name: f.dataType.simpleString()
                 for f in batch_schema.fields}
    table_schema = _union_schema(current, batch_schema)
    if cur_types == new_types:
        return table_schema, False
    changed = [
        n for n in cur_types
        if n in new_types and cur_types[n] != new_types[n]
    ]
    if changed or not allow:
        drift = diff_schemas(batch_schema, current)
        raise SchemaDriftError(
            f"{what} schema drifts from table {path}: {drift}"
            + ("" if changed else
               " (pass allow_schema_evolution=True for additive drift)")
        )
    return table_schema, True


def _derive_cm(prior_cm: dict, mode: str, field_names) -> tuple[dict, bool]:
    """Column-mapping derivation for a write, shared with the WAP
    staging path (same single-rule rationale as
    :func:`_check_append_drift`): an overwrite resets the mapping (its
    snapshot is single-generation, logical == physical again); an
    append keeps it, and a NEW column colliding with a renamed column's
    physical or a retired physical gets a fresh ``col-<uuid>`` physical
    name — rebinding old bytes to a new logical identity is the
    corruption column mapping exists to prevent. Returns
    ``(cm, cm_changed)``."""
    if mode == "overwrite":
        return {"map": {}, "retired": []}, not _cm_is_identity(prior_cm)
    cm = {"map": dict(prior_cm.get("map", {})),
          "retired": list(prior_cm.get("retired", []))}
    cm_changed = False
    if not _cm_is_identity(cm):
        taken = set(cm["map"].values()) | set(cm["retired"])
        mapped = set(cm["map"])
        for name in field_names:
            if name not in mapped and name in taken:
                cm["map"][name] = f"col-{uuid.uuid4().hex[:8]}"
                cm_changed = True
    return cm, cm_changed


def commit(
    df: DataFrame,
    path: str,
    mode: str = "append",
    max_retries: int = 5,
    txn_app_id: str | None = None,
    txn_version: int | None = None,
    stats_cols: tuple[str, ...] = (),
    analyze_stats: bool | tuple[str, ...] = False,
    allow_schema_evolution: bool = False,
    bloom_cols: tuple[str, ...] = (),
) -> dict | None:
    """Write ``df`` as one atomic commit; returns the log entry.

    Data lands first (invisible), the log entry publishes it. On a
    version race the loser re-reads the log and retries against the
    next number — its already-written data files are reused, so a retry
    costs one metadata round, not a rewrite.

    With ``txn_app_id``/``txn_version`` the commit is IDEMPOTENT per
    app: if the app's recorded watermark already covers txn_version the
    write is skipped and None returned (replayed micro-batches must not
    double-apply). The check runs before the data write AND inside the
    claim loop, so a concurrent duplicate loses there too.

    ``stats_cols`` records per-file [min, max] ranges in the log entry
    (one small aggregation over only the new files) — the file-skipping
    metadata :func:`merge_into` prunes with.

    ``analyze_stats`` additionally records per-file MERGEABLE stats
    partials (``True`` = all columns, or a column tuple) under
    ``_stats/`` so :func:`analyze_table` can compute any snapshot's
    ANALYZE vector without rescanning data — stats-at-write, the
    Delta/Iceberg model extended with HLL NDV sketches.

    SCHEMA ENFORCEMENT (Delta's contract): an APPEND whose schema
    drifts from the table's refuses loudly instead of landing files a
    later read silently mis-merges (plain ``spark.read.parquet`` over
    mixed schemas picks one file's schema and DROPS the others'
    columns). ``allow_schema_evolution=True`` permits ADDITIVE drift —
    new columns, or columns the batch omits (read as null) — and marks
    the entry so snapshot reads switch to ``mergeSchema``; a TYPE
    change for an existing column is always refused (that is a rewrite,
    not an evolution). Overwrites may change schema freely: the
    snapshot they create is single-schema by construction.
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")

    schema_changed = False
    table_schema = df.schema
    if mode == "append" and latest_version(path) is not None:
        # diff against the table's UNION schema from the log, not the
        # last commit's first data file: after an evolved append that
        # OMITS column c, a later append re-introducing c with a
        # different type must still be refused as a type change (vs the
        # file footer c would look like a brand-new column and slip
        # through, breaking every subsequent mergeSchema read)
        table_schema, schema_changed = _check_append_drift(
            path, _table_schema_at(df.sparkSession, path), df.schema,
            allow_schema_evolution,
        )
    has_txn = txn_app_id is not None and txn_version is not None

    def _already_applied() -> bool:
        seen = latest_txn_version(path, txn_app_id) if has_txn else None
        return seen is not None and txn_version <= seen

    if _already_applied():  # fast-path: skip before paying the data write
        return None

    _enforce_constraints(df, path)

    # column mapping: users and this API speak LOGICAL names; data files
    # carry PHYSICAL names. Appends translate on write; an overwrite
    # resets the mapping (its snapshot is single-generation by
    # construction, so logical == physical again). A NEW column whose
    # name collides with a renamed column's physical or a dropped
    # column's retired physical gets a fresh col-<uuid> physical name —
    # rebinding old bytes to a new logical identity is the corruption
    # column mapping exists to prevent.
    prior_cm = (
        _column_mapping_at(path) if latest_version(path) is not None
        else {"map": {}, "retired": []}
    )
    cm, cm_changed = _derive_cm(
        prior_cm, mode, [f.name for f in df.schema.fields]
    )
    write_df = _to_physical_names(df, cm)
    stats_phys = tuple(_cm_phys(cm, c) for c in stats_cols)
    bloom_phys = tuple(_cm_phys(cm, c) for c in bloom_cols)

    commit_dir = f"commit-{uuid.uuid4().hex[:12]}"
    data_path = os.path.join(path, "data", commit_dir)
    write_df.write.mode("error").parquet(data_path)
    added = sorted(
        os.path.join("data", commit_dir, f)
        for f in os.listdir(data_path)
        if f.endswith(".parquet")
    )
    file_stats = (
        _collect_file_stats(df.sparkSession, path, data_path, stats_phys)
        if stats_phys and added
        else {}
    )
    if bloom_phys and added:
        # blooms ride the same per-file stats dict (reserved __bloom
        # keys) so checkpoints and resolution need no new plumbing
        for rel, enc in _collect_bloom_filters(
            df.sparkSession, data_path, bloom_phys
        ).items():
            file_stats.setdefault(rel, {}).update(enc)
    stats_rel = (
        _write_stats_partials(
            df.sparkSession, path, data_path,
            None if analyze_stats is True
            else tuple(_cm_phys(cm, c) for c in analyze_stats),
        )
        if analyze_stats and added
        else None
    )

    def build(version: int) -> dict | None:
        if _already_applied():
            return None
        live, _ = _state_at(path, version - 1)
        entry = {
            "version": version,
            "timestamp": time.time(),
            "mode": mode,
            "added": added,
            "removed": live if mode == "overwrite" else [],
            "operation": "WRITE",
            # running union schema (overwrite resets it to the batch's):
            # the reference point append enforcement diffs against
            "table_schema": table_schema.jsonValue(),
        }
        if has_txn:
            entry["txn"] = {"app_id": txn_app_id, "version": txn_version}
        if file_stats:
            entry["file_stats"] = file_stats
        if stats_rel:
            entry["stats_partials"] = stats_rel
        if schema_changed:
            entry["schema_changed"] = True
        if cm_changed:
            entry["column_mapping"] = cm
        return entry

    entry = _publish(path, build, max_retries)
    if entry is None:
        # a concurrent duplicate published first: our data files were
        # never referenced by any log entry — remove the orphans
        shutil.rmtree(data_path, ignore_errors=True)
        if stats_rel:
            shutil.rmtree(os.path.join(path, stats_rel), ignore_errors=True)
    return entry


def version_at_timestamp(path: str, cutoff: float) -> int:
    """THE timestamp-travel rule (newest commit at/before ``cutoff``,
    epoch seconds) — shared by ``read_table(as_of_timestamp=...)`` and
    the ``medallion_lake`` data source's ``timestampAsOf`` option so
    the two surfaces can never resolve the same instant differently."""
    eligible = [
        e["version"] for e in _entries(path) if e["timestamp"] <= cutoff
    ]
    if not eligible:
        raise ValueError(f"no commit at or before ts={cutoff} on {path}")
    return max(eligible)


def read_table(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    as_of_timestamp: float | None = None,
) -> DataFrame:
    """Snapshot read: latest, a pinned ``version``, or the newest commit
    at/before ``as_of_timestamp`` (time travel). Latest/pinned reads
    resolve from the newest log checkpoint + tail; only timestamp travel
    scans entry timestamps."""
    lv = latest_version(path)
    if lv is None:
        raise FileNotFoundError(f"no versioned table at {path}")
    if as_of_timestamp is not None:
        version = version_at_timestamp(path, as_of_timestamp)
    if version is not None:
        known = _commit_versions(path) + _checkpoint_versions(path)
        oldest = min(known)
        if version < oldest:
            raise ValueError(
                f"version {version} expired (history starts at {oldest}; "
                "see expire_log retention)"
            )
    else:
        # Pin 'latest' ONCE and hand the same version to every resolver
        # below. Resolving files / DVs / mixed-schema / column-mapping as
        # four independent 'latest' lookups lets a rewrite commit landing
        # between them pair version-N files with version-N+1 DVs — e.g.
        # OPTIMIZE purging DV'd rows pops a removed file's DV while the
        # stale file list still includes it, transiently resurrecting
        # deleted rows (the unpinned-latest race clone_table pins against).
        version = lv
    files, _ = _state_at(path, version)
    if not files:
        # a valid-but-empty snapshot (e.g. overwrite with 0 rows)
        return spark.createDataFrame([], _table_schema_at(spark, path, version))
    reader = spark.read
    if _mixed_schema_at(path, version):
        # an evolved append landed in this snapshot: without mergeSchema
        # the scan takes ONE file's schema and silently drops the other
        # files' columns. The footer-union cost is paid only for tables
        # that actually evolved — the flag rides the log + checkpoints.
        reader = reader.option("mergeSchema", "true")
    df = reader.parquet(*[os.path.join(path, f) for f in files])
    dvs = _dv_at(path, version)
    if dvs:
        df = _apply_dvs(spark, df, path, files, dvs)
    # physical -> logical names (identity mapping returns df untouched)
    return _apply_column_mapping(spark, df, path, version)


def read_table_pruned(
    spark: SparkSession,
    path: str,
    col: str | None = None,
    lo=None,
    hi=None,
    version: int | None = None,
    predicates: dict[str, tuple] | None = None,
    eq: dict[str, object] | None = None,
    isin: dict[str, list] | None = None,
) -> tuple[DataFrame, dict]:
    """Snapshot read with FILE SKIPPING: live files whose recorded
    [min, max] range excludes the requested range(s) are never opened —
    the read-side payoff of the same per-file stats :func:`merge_into`
    prunes with (Delta/Iceberg data skipping, resolved from the log
    instead of parquet footers, so skipped files cost zero I/O including
    their footers). The residual predicate is still applied to the
    survivors (stats pruning is necessary, not sufficient). Files
    without recorded stats for a column are conservatively read.

    Ranges: either the single-column form (``col``, ``lo``, ``hi``) or
    ``predicates={col: (lo, hi), ...}`` — multiple columns prune
    CONJUNCTIVELY (a file survives only if every range overlaps), which
    is where z-ordered layouts pay off: OPTIMIZE ZORDER BY (a, b) gives
    every file a compact box in BOTH columns, so two-sided skipping
    multiplies instead of degenerating to the primary sort column.

    ``eq={col: value, ...}`` adds POINT-LOOKUP skipping via the
    per-file Bloom filters ``commit(bloom_cols=...)`` records — the
    case ranges cannot help (a high-NDV key whose [min, max] spans
    every file, e.g. unsorted ids: every range overlaps, the bloom
    says "definitely absent" for ~97% of files at the default
    4096-bit/4-hash layout). Both prunings compose; files without a
    recorded bloom are conservatively read, false positives only cost
    an extra file read (the residual equality filter keeps results
    exact — Delta's bloom-index contract).

    ``isin={col: [v1, v2, ...], ...}`` is the SET form of ``eq``: a
    file is read iff SOME value admits (per-value range overlap AND
    bloom maybe-contains — the same disjunctive key_admits the DML
    paths use). One call replaces K separate point-reads: the bloom
    probe hashes for every value compute in ONE tiny job, the survivor
    files are opened ONCE (a file admitting several values is read
    once, where K point-reads re-read it K times), and the residual is
    a single pushed-down IN. ``eq`` and ``isin`` may not name the same
    column.

    Returns ``(df, report)`` where report carries files_read /
    files_skipped so callers and tests can audit the pruning.
    """
    from pyspark.sql import functions as F

    lv = latest_version(path)
    if lv is None:
        raise FileNotFoundError(f"no versioned table at {path}")
    if version is None:
        # same pin-latest-once rule as read_table: stats / dtypes /
        # column-mapping / DV resolution must all see ONE snapshot
        version = lv
    preds = dict(predicates or {})
    if col is not None:
        preds[col] = (lo, hi)
    eq = dict(eq or {})
    isin = {c: list(vs) for c, vs in (isin or {}).items()}
    if set(eq) & set(isin):
        raise ValueError(
            f"columns named in both eq and isin: {sorted(set(eq) & set(isin))}"
        )
    if any(not vs for vs in isin.values()):
        raise ValueError("isin value lists must be non-empty")
    if not preds and not eq and not isin:
        raise ValueError(
            "read_table_pruned needs col/lo/hi, predicates, eq, or isin"
        )
    live, _ = _state_at(path, version)
    stats = _file_stats_at(path, version)
    dtypes = _column_dtypes(spark, path, version)
    # predicates arrive on LOGICAL names; per-file stats/blooms are
    # keyed by PHYSICAL names (sticky across renames, so pruning keeps
    # working after a metadata-only rename with zero stats migration)
    cm = _column_mapping_at(path, version)
    pc = lambda c: _cm_phys(cm, c)  # noqa: E731
    # range compares run against the stats' RENDERED form
    sp = {
        c: (_stat_probe(plo, dtypes.get(c)), _stat_probe(phi, dtypes.get(c)))
        for c, (plo, phi) in preds.items()
    }
    # point probes: eq is the 1-value case of isin — unify so the bloom
    # hash values for EVERY (column, value) pair compute in one tiny
    # job. Columns with MORE than _ISIN_BLOOM_MAX values skip bloom
    # probing (range admission + residual only): the probe is a
    # width-(values*k) projection whose codegen cost grows with the
    # list (measured: a 2,410-id point-read spent ~60s in the probe),
    # while a 4096-bit bloom almost surely admits SOME key out of
    # thousands — the skipping yield vanishes exactly as the probe
    # cost explodes.
    points = {c: [v] for c, v in eq.items()} | isin
    spoint = {
        c: [_stat_probe(v, dtypes.get(c)) for v in vs]
        for c, vs in points.items()
    }

    bloomable = {
        c: vs for c, vs in points.items() if len(vs) <= _ISIN_BLOOM_MAX
    }
    point_hashes: dict[str, list[list[int]]] = {}
    if bloomable:
        probe = spark.range(1).select(
            *[
                _bloom_hash(_probe_lit(v, dtypes.get(c)), i)
                .alias(f"{c}__{j}__{i}")
                for c, vs in bloomable.items()
                for j, v in enumerate(vs)
                for i in range(BLOOM_HASHES)
            ]
        ).first()
        point_hashes = {
            c: [
                [probe[f"{c}__{j}__{i}"] for i in range(BLOOM_HASHES)]
                for j in range(len(vs))
            ]
            for c, vs in bloomable.items()
        }

    def overlaps(rng, plo, phi) -> bool:
        if rng is None or rng[0] is None:
            return True
        fmin, fmax = rng
        if phi is not None and fmin > phi:
            return False
        if plo is not None and fmax < plo:
            return False
        return True

    def point_admits(fstats: dict, c: str) -> bool:
        """Some probe value of ``c`` can live in the file — per-value
        range overlap AND (when probed) bloom maybe-contains,
        disjunctive over the values (conjunctive across columns,
        below)."""
        rng = fstats.get(pc(c))
        encoded = fstats.get(f"{pc(c)}__bloom")
        hashes = point_hashes.get(c)
        for j, sv in enumerate(spoint[c]):
            if not overlaps(rng, sv, sv):
                continue
            if (
                hashes is not None
                and encoded is not None
                and not _bloom_may_contain(encoded, hashes[j])
            ):
                continue
            return True
        return False

    chosen = [
        f for f in live
        if all(
            overlaps(stats.get(f, {}).get(pc(c)), plo, phi)
            for c, (plo, phi) in sp.items()
        )
        and all(point_admits(stats.get(f, {}), c) for c in points)
    ]
    report = {
        "files_total": len(live),
        "files_read": len(chosen),
        "files_skipped": len(live) - len(chosen),
    }
    if not chosen:
        return (
            spark.createDataFrame([], _table_schema_at(spark, path, version)),
            report,
        )
    reader = spark.read
    if _mixed_schema_at(path, version):
        reader = reader.option("mergeSchema", "true")
    df = reader.parquet(*[os.path.join(path, f) for f in chosen])
    dvs = _dv_at(path, version)
    if dvs:
        df = _apply_dvs(spark, df, path, chosen, dvs)
    # project to logical names BEFORE the residual filters, which are
    # expressed (like the predicates) in logical terms
    df = _apply_column_mapping(spark, df, path, version)
    for c, (plo, phi) in preds.items():
        if plo is not None:
            df = df.filter(F.col(c) >= plo)
        if phi is not None:
            df = df.filter(F.col(c) <= phi)
    for c, v in eq.items():
        df = df.filter(F.col(c) == v)
    for c, vs in isin.items():
        df = df.filter(F.col(c).isin(vs))
    return df, report


def _schema_of_latest(spark, path, entries):
    for e in reversed(entries):
        if e.get("added"):
            return spark.read.parquet(os.path.join(path, e["added"][0])).schema
    raise ValueError(f"table {path} has no data files in any version")


def _table_schema_at(spark, path, version=None):
    """The table's UNION schema at ``version`` (Delta's table-level
    schema, not any one file's): resolved from the most recent log
    entry carrying ``table_schema`` — commit() records the running
    union on every append/overwrite, rollback() the restored target's.
    Entries without the field (DML rewrites, OPTIMIZE — schema-neutral
    by construction; pre-field legacy logs) are skipped in the reverse
    walk; then checkpoints (which persist the running schema, so an
    expire_log-truncated tail of schema-neutral entries still
    resolves); a log with no recorded schema anywhere falls back to
    the newest data file's footer (the pre-union behavior)."""
    from pyspark.sql.types import StructType

    ts = _table_schema_json_logged(path, version)
    if ts is not None:
        return StructType.fromJson(ts)
    return _schema_of_latest(spark, path, _entries(path, hi=version))


def _table_schema_json_at(spark, path, version=None):
    return _table_schema_at(spark, path, version).jsonValue()


def _union_schema(base, new):
    """``base`` extended with ``new``'s columns it lacks (order:
    base-first). Callers enforce type agreement on shared names."""
    from pyspark.sql.types import StructType

    have = {f.name for f in base.fields}
    return StructType(
        list(base.fields) + [f for f in new.fields if f.name not in have]
    )


# ---------------------------------------------------------------------------
# Column mapping — metadata-only RENAME / DROP (Delta's column-mapping
# "name" mode). The log's table_schema always speaks LOGICAL names (what
# users query); data files always carry PHYSICAL names (what parquet
# stores). The mapping {logical: physical} lives in log entries /
# checkpoints, so a rename or drop is ONE metadata commit — never a
# table rewrite — and time travel resolves each version's own names.
# Physical names are sticky: the column keeps its first-written physical
# name forever, so every historical file stays readable and per-file
# stats / bloom filters (keyed by physical name) keep pruning across
# renames with zero migration. A column added after a drop/rename whose
# name collides with a live or retired physical name gets a fresh
# ``col-<uuid>`` physical name (Delta's collision rule).
# ---------------------------------------------------------------------------


def _column_mapping_at(path: str, version: int | None = None) -> dict:
    """{"map": {logical: physical (non-identity only)}, "retired":
    [physical, ...]} at ``version`` — newest entry carrying the field,
    else newest prior checkpoint, else identity. Same checkpoint + tail
    walk as ``_table_schema_json_logged``."""
    ckpts = [
        v for v in _checkpoint_versions(path)
        if version is None or v <= version
    ]
    tail_lo = (ckpts[-1] + 1) if ckpts else 0
    for e in reversed(_entries(path, lo=tail_lo, hi=version)):
        if e.get("column_mapping") is not None:
            return e["column_mapping"]
    for cv in reversed(ckpts):
        cm = _read_checkpoint(path, cv).get("column_mapping")
        if cm is not None:
            return cm
    if ckpts:  # legacy checkpoints: walk the remaining entries below
        for e in reversed(_entries(path, hi=ckpts[-1])):
            if e.get("column_mapping") is not None:
                return e["column_mapping"]
    return {"map": {}, "retired": []}


def _cm_is_identity(cm: dict) -> bool:
    return not cm.get("map") and not cm.get("retired")


def _cm_phys(cm: dict, name: str) -> str:
    return cm.get("map", {}).get(name, name)


def _cm_translate_keys(cm: dict, d: dict | None) -> dict:
    """Dict keyed by logical column names -> same dict keyed physical."""
    if not d or _cm_is_identity(cm):
        return dict(d or {})
    return {_cm_phys(cm, k): v for k, v in d.items()}


def _cm_refuse_names(cm: dict, names, what: str) -> None:
    """Structured column NAMES (preds/keys dict keys, SET targets) get
    the same stale-name discipline as raw SQL (:func:`_cm_refuse_expr`):
    a renamed-away old name or a dropped column's retired physical is
    NOT translated by ``_cm_translate_keys`` (it isn't a current logical
    name), yet still names a live column in the data files — so DML
    would silently prune/match/mutate an identity the table no longer
    exposes. Refuse loudly instead (r8 self-review finding)."""
    if not names or _cm_is_identity(cm):
        return
    stale = (
        set(cm.get("map", {}).values()) | set(cm.get("retired", []))
    ) - set(cm.get("map", {}))
    hits = sorted(set(names) & stale)
    if hits:
        raise ValueError(
            f"{what} names column(s) {hits} — the pre-rename (or "
            f"dropped) name(s) under this table's column mapping "
            f"({cm.get('map', {})}; retired {cm.get('retired', [])}). "
            "Use the current logical names."
        )


def _cm_refuse_expr(cm: dict, expr: str | None, what: str) -> None:
    """Raw SQL strings (``where``, SET expressions) written in CURRENT
    logical names resolve fine inside DML rewrites — evaluation runs
    over a dual-name frame (:func:`_with_logical_aliases`). What must
    be refused is a reference to a STALE name: a renamed column's old
    (physical) name, or a dropped column's retired physical. Both still
    exist as columns in the data files, so the expression would silently
    bind to an identity the table no longer exposes.

    The scan ignores quoted STRING LITERALS and comments before
    matching (r8 ADVICE): ``tag = 'old_col'`` compares against a value
    that merely spells the old name — refusing it would reject a valid
    DML expression. Backtick-quoted identifiers still count: they DO
    bind to columns. The literal lexer matches Spark's DEFAULT string
    rules (backslash escapes active, ``''``/``""`` doubling, ``--`` and
    ``/* */`` comments); under the legacy
    ``spark.sql.parser.escapedStringLiterals=true`` conf a ``\\'``
    ENDS a literal instead of escaping a quote, so a stale name in the
    expression tail after such a literal can evade this guard — the
    conservative pre-masking behavior, restored only for that corner."""
    if expr is None or _cm_is_identity(cm):
        return
    stale = (
        set(cm.get("map", {}).values()) | set(cm.get("retired", []))
    ) - set(cm.get("map", {}))
    # mask '...' / "..." literals (backslash and doubled-quote escapes,
    # Spark's default lexing) and comments — occurrences inside them
    # are data, not references
    scanned = re.sub(
        r"'(?:[^'\\]|\\.|'')*'|\"(?:[^\"\\]|\\.|\"\")*\"|--[^\n]*|/\*.*?\*/",
        " ", expr, flags=re.S,
    )
    hits = [s for s in stale if re.search(rf"\b{re.escape(s)}\b", scanned)]
    if hits:
        raise ValueError(
            f"{what} references {sorted(hits)} — the pre-rename (or "
            f"dropped) name(s) of column(s) under this table's column "
            f"mapping ({cm.get('map', {})}; retired "
            f"{cm.get('retired', [])}). Rewrite the expression using the "
            "current logical names."
        )


def _with_logical_aliases(df: DataFrame, cm: dict) -> DataFrame:
    """PHYSICAL frame + evaluation-only alias columns carrying the
    logical names of renamed columns, so structured predicates
    (translated to physical) and raw SQL written in logical terms BOTH
    resolve during DML evaluation. Writers must re-select the physical
    columns afterwards — the aliases never land in files."""
    if _cm_is_identity(cm) or not cm.get("map"):
        return df
    from pyspark.sql import functions as F

    out = df
    for logical, phys in cm["map"].items():
        if phys in df.columns and logical not in df.columns:
            out = out.withColumn(logical, F.col(phys))
    return out


def _to_physical_names(df: DataFrame, cm: dict) -> DataFrame:
    """LOGICAL frame -> PHYSICAL frame for a data-file write: rename the
    mapped columns; everything else passes through. Pure projection."""
    if _cm_is_identity(cm) or not cm.get("map"):
        return df
    from pyspark.sql import functions as F

    m = cm["map"]
    return df.select(
        *[F.col(c).alias(m.get(c, c)) for c in df.columns]
    )


def _apply_column_mapping(spark, df: DataFrame, path: str,
                          version: int | None = None) -> DataFrame:
    """PHYSICAL scan -> LOGICAL frame: project exactly the version's
    logical schema, reading each field from its mapped physical column
    (dropped columns' physicals simply aren't selected; a physical
    absent from every scanned file — possible only mid-evolution —
    reads as typed NULL). Identity mapping returns the frame untouched,
    so unrenamed tables pay nothing."""
    cm = _column_mapping_at(path, version)
    if _cm_is_identity(cm):
        return df
    from pyspark.sql import functions as F

    schema = _table_schema_at(spark, path, version)
    cols = []
    for f in schema.fields:
        phys = _cm_phys(cm, f.name)
        if phys in df.columns:
            cols.append(F.col(phys).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)


def rename_column(spark: SparkSession, path: str, old: str, new: str) -> dict:
    """Metadata-only column RENAME: one log commit updating the logical
    schema and the logical→physical mapping — zero data files touched,
    instant at any size. Queries by the new name work immediately;
    ``read_table(version=v)`` for pre-rename v resolves the OLD name
    (the mapping is versioned state like everything else). Per-file
    stats and bloom filters keep pruning (they are keyed by the
    physical name, which never changes). Declarative constraints on the
    column follow the rename; a raw CHECK constraint mentioning it is
    refused (rewrite the constraint first).

    All validation and schema/mapping derivation run INSIDE the
    ``_publish`` retry loop, against the fresh log tip — a lost version
    race (concurrent schema-evolving append, another DDL) recomputes
    instead of republishing state derived from the stale tip, which
    would silently drop the race winner's schema/mapping change. The
    constraint sidecar is rewritten only AFTER the commit publishes; a
    crash in between leaves a constraint naming the old column, which
    the next write refuses LOUDLY (re-run ``set_table_constraints`` to
    repair) rather than silently enforcing against ghost data."""
    from pyspark.sql.types import StructField, StructType

    renamed_specs: list[dict] | None = None

    def build(version: int) -> dict:
        nonlocal renamed_specs
        schema = _table_schema_at(spark, path)
        names = [f.name for f in schema.fields]
        if old not in names:
            raise ValueError(f"rename_column: no column {old!r} in {names}")
        if new in names:
            raise ValueError(f"rename_column: column {new!r} already exists")
        cm = _column_mapping_at(path)
        taken = set(cm.get("map", {}).values()) | set(cm.get("retired", []))
        # physical names of identity-mapped columns are their logical
        # names — `new` colliding with one was caught by the logical
        # check above; colliding with a RENAMED column's physical or a
        # retired physical would make scans ambiguous. Renaming a column
        # back to its OWN physical name is identity-restoring, always ok.
        own_phys = cm.get("map", {}).get(old, old)
        if new in taken and new != own_phys:
            raise ValueError(
                f"rename_column: {new!r} collides with a physical column "
                "name still present in data files (renamed or dropped "
                "earlier); choose another name"
            )
        for spec in table_constraints(path):
            if spec.get("kind") == "check" and re.search(
                rf"\b{re.escape(old)}\b", spec.get("sql", "")
            ):
                raise ValueError(
                    f"rename_column: CHECK constraint {spec.get('name')!r} "
                    f"references {old!r}; drop or rewrite the constraint "
                    "first"
                )

        new_map = dict(cm.get("map", {}))
        new_map[new] = new_map.pop(old, old)  # physical name is sticky
        if new_map.get(new) == new:
            del new_map[new]  # renamed back to its physical: identity again
        new_cm = {"map": new_map, "retired": list(cm.get("retired", []))}
        new_schema = StructType([
            StructField(new, f.dataType, f.nullable, f.metadata)
            if f.name == old else f
            for f in schema.fields
        ])
        # declarative (col-keyed) constraints follow the logical rename —
        # staged here, applied only after the publish succeeds
        specs = table_constraints(path)
        renamed_specs = (
            [{**s, "col": new} if s.get("col") == old else s for s in specs]
            if any(s.get("col") == old for s in specs)
            else None
        )
        return {
            "version": version,
            "timestamp": time.time(),
            "mode": "alter",
            "added": [],
            "removed": [],
            "operation": f"RENAME COLUMN({old} -> {new})",
            "table_schema": new_schema.jsonValue(),
            "column_mapping": new_cm,
        }

    entry = _publish(path, build)
    if entry is not None and renamed_specs is not None:
        set_table_constraints(path, renamed_specs)
    return entry


def drop_column(spark: SparkSession, path: str, name: str) -> dict:
    """Metadata-only column DROP: one log commit removing the column
    from the logical schema and retiring its physical name — data files
    keep the bytes (history and time travel still read them; OPTIMIZE /
    overwrite rewrites shed them physically), but every current-version
    read stops projecting it. Re-adding a column with this name later
    gets a FRESH physical name (never the retired bytes). Refused while
    any constraint references the column. Validation and derivation run
    inside the ``_publish`` retry loop against the fresh tip (same
    lost-race discipline as :func:`rename_column`)."""
    from pyspark.sql.types import StructType

    def build(version: int) -> dict:
        schema = _table_schema_at(spark, path)
        names = [f.name for f in schema.fields]
        if name not in names:
            raise ValueError(f"drop_column: no column {name!r} in {names}")
        if len(names) == 1:
            raise ValueError("drop_column: cannot drop the only column")
        for spec in table_constraints(path):
            if spec.get("col") == name or (
                spec.get("kind") == "check"
                and re.search(rf"\b{re.escape(name)}\b", spec.get("sql", ""))
            ):
                raise ValueError(
                    f"drop_column: constraint {spec} references {name!r}; "
                    "drop the constraint first"
                )
        cm = _column_mapping_at(path)
        new_map = dict(cm.get("map", {}))
        phys = new_map.pop(name, name)
        retired = sorted(set(cm.get("retired", [])) | {phys})
        new_cm = {"map": new_map, "retired": retired}
        new_schema = StructType([f for f in schema.fields if f.name != name])
        return {
            "version": version,
            "timestamp": time.time(),
            "mode": "alter",
            "added": [],
            "removed": [],
            "operation": f"DROP COLUMN({name})",
            "table_schema": new_schema.jsonValue(),
            "column_mapping": new_cm,
        }

    return _publish(path, build)


def rollback(spark: SparkSession, path: str, to_version: int) -> dict:
    """Publish a NEW commit whose live set equals ``to_version``'s —
    metadata-only, instant at any size, history preserved (this is
    Delta's RESTORE, not a destructive reset). Goes through the shared
    claim loop, so a concurrent writer just costs a retry with both
    live sets recomputed against the new tip."""
    lv = latest_version(path)
    if lv is None:
        raise FileNotFoundError(f"no versioned table at {path}")
    known = _commit_versions(path) + _checkpoint_versions(path)
    oldest = min(known)
    if to_version > lv or to_version < oldest:
        # a beyond-tip target would "succeed" as a no-op commit stamped
        # RESTORE(<nonexistent>), and an expired target would die later
        # with a misleading schema error — refuse up front, with the
        # same message shape as read_table's expired-version refusal
        raise ValueError(
            f"restore target version {to_version} out of range "
            f"(history spans {oldest}..{lv}"
            + ("" if oldest == 0 else "; older expired, see expire_log")
            + ")"
        )
    target_live, _ = _state_at(path, to_version)
    target_mixed = _mixed_schema_at(path, to_version)
    target_schema = _table_schema_json_at(spark, path, to_version)
    target_cm = _column_mapping_at(path, to_version)

    def build(version: int) -> dict:
        current_live, _ = _state_at(path, version - 1)
        entry = {
            "version": version,
            "timestamp": time.time(),
            "mode": "restore",
            "added": [f for f in target_live if f not in set(current_live)],
            "removed": [f for f in current_live if f not in set(target_live)],
            "operation": f"RESTORE({to_version})",
            "restore_of": to_version,
            "table_schema": target_schema,
            # the restored snapshot's names must resolve like they did
            # at to_version — the mapping is versioned state too
            "column_mapping": target_cm,
        }
        if target_mixed:
            # the restored live set spans >1 schema: stamp the entry so
            # _mixed_schema_at's replay re-enables mergeSchema reads
            # (restore, like overwrite, otherwise resets mixedness)
            entry["schema_changed"] = True
        return entry

    entry = _publish(path, build)
    assert entry is not None  # build never skips
    return entry


def clone_table(
    spark: SparkSession,
    src: str,
    dst: str,
    version: int | None = None,
) -> dict:
    """SHALLOW CLONE: a new versioned table at ``dst`` whose v0
    references the SOURCE's data files in place — zero bytes copied,
    instant at any size (Delta's ``CREATE TABLE ... SHALLOW CLONE``).
    The clone is a full first-class table from then on: writes, DML,
    OPTIMIZE, DDL, and time travel on either side never affect the
    other (clone rewrites land under the clone; the shared files are
    only ever dereferenced, never mutated — the log format is
    immutable-files + metadata, which is what makes this free).

    The whole source snapshot state rides the clone's v0 entry:
    file-skipping stats and bloom filters (keys translated to the
    clone-relative paths), deletion vectors, the union schema, the
    column mapping, and the mixed-schema flag; declarative constraints
    copy via their sidecar. ``version`` clones a historical snapshot
    (time-travel clone — the cheap way to hand a team yesterday's
    100 TB table).

    Retention contract (same as Delta's shallow clone): ``vacuum`` on
    the CLONE never deletes files outside its own directory (guarded),
    but ``vacuum``/``expire_log`` on the SOURCE can remove files the
    clone still references — keep source retention ≥ clone lifetime,
    or OPTIMIZE the clone (a full rewrite localizes every referenced
    byte, detaching it from the source)."""
    lv = latest_version(src)
    if lv is None:
        raise FileNotFoundError(f"no versioned table at {src}")
    if latest_version(dst) is not None:
        raise ValueError(f"clone destination {dst} already exists")
    # pin the source version ONCE, then resolve EVERY piece of snapshot
    # state at that pinned version: with version=None, seven independent
    # "latest" lookups would each race a concurrent source writer and
    # the clone could mix v=N files with v=N+1 vectors/stats/schema
    src_v = lv if version is None else version
    known = _commit_versions(src) + _checkpoint_versions(src)
    if src_v > lv or src_v not in range(min(known), lv + 1):
        raise ValueError(
            f"clone source version {src_v} out of range "
            f"(history spans {min(known)}..{lv}"
            + ("" if min(known) == 0 else "; older expired, see expire_log")
            + ")"
        )
    files, _ = _state_at(src, src_v)
    stats = _file_stats_at(src, src_v)
    dv = _dv_at(src, src_v)
    schema = _table_schema_json_at(spark, src, src_v)
    cm = _column_mapping_at(src, src_v)
    mixed = _mixed_schema_at(src, src_v)

    def xlate(rel: str) -> str:
        return os.path.relpath(
            os.path.normpath(os.path.join(src, rel)), dst
        )

    added = [xlate(f) for f in files]

    def build(v: int) -> dict:
        if v != 0:
            # a racer created the destination between the existence
            # check and the claim: publishing v1 here would silently
            # MERGE two unrelated tables (overwrite replay keeps the
            # racer's v0 files live alongside ours)
            raise ValueError(
                f"clone destination {dst} already exists "
                "(created concurrently)"
            )
        entry = {
            "version": v,
            "timestamp": time.time(),
            "mode": "overwrite",
            "added": added,
            "removed": [],
            "operation": f"CLONE({src} @ v{src_v})",
            "clone_of": {"path": os.path.abspath(src), "version": src_v},
            "table_schema": schema,
            "column_mapping": cm,
        }
        if stats:
            entry["file_stats"] = {xlate(f): s for f, s in stats.items()}
        if dv:
            entry["dv"] = {xlate(f): ps for f, ps in dv.items()}
        if mixed:
            entry["schema_changed"] = True
        return entry

    entry = _publish(dst, build)
    src_constraints = table_constraints(src)
    if src_constraints:
        set_table_constraints(dst, src_constraints)
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


def vacuum(path: str, keep_last: int = 1, dry_run: bool = False) -> list[str]:
    """Physically delete data files referenced by NO retained version
    (the last ``keep_last`` snapshots stay readable; older time travel
    is given up — exactly Delta's retention trade-off). Returns the
    deleted relative paths. ``dry_run=True`` returns the doomed list
    without touching anything (Delta's ``VACUUM ... DRY RUN``) — audit
    what a retention change costs before paying it.

    Maintenance path: scans the remaining log plus every checkpoint —
    retained live sets resolve through the checkpoint-aware
    :func:`_state_at` (entry replay alone under-counts once
    :func:`expire_log` has truncated old entries), and the candidate
    universe is entry ``added`` lists ∪ checkpoint live sets."""
    versions = _commit_versions(path)
    if not versions:
        return []
    retained = versions[-max(keep_last, 1):]
    keep: set[str] = set()
    for v in retained:
        live, _ = _state_at(path, v)
        keep.update(live)
    all_files: set[str] = set()
    for e in _entries(path):
        all_files.update(e.get("added", []))
    for cv in _checkpoint_versions(path):
        all_files.update(_read_checkpoint(path, cv).get("live", []))
    # never delete a file outside this table's directory: a shallow
    # clone (clone_table) references the SOURCE's files via ../ paths —
    # dereferencing them here is fine, physically deleting them would
    # corrupt the source table
    root = os.path.abspath(path)
    doomed = sorted(
        f for f in (all_files - keep)
        if os.path.abspath(os.path.join(path, f)).startswith(root + os.sep)
    )
    if dry_run:
        return doomed
    for rel in doomed:
        full = os.path.join(path, rel)
        if os.path.exists(full):
            os.remove(full)
    # stats partials are per-commit-directory; once no retained version
    # references ANY file of a commit dir, its partials can never match a
    # live file again — reclaim them with the data
    stats_root = os.path.join(path, "_stats")
    if os.path.isdir(stats_root):
        alive_dirs = {rel.split(os.sep)[1] for rel in keep}
        for d in os.listdir(stats_root):
            if d not in alive_dirs:
                shutil.rmtree(os.path.join(stats_root, d), ignore_errors=True)
    return doomed


def sweep_orphan_commit_dirs(
    path: str, older_than_sec: float, dry_run: bool = False
) -> list[str]:
    """Reclaim ``data/commit-*`` dirs that NO log entry or checkpoint
    has ever referenced — the leak class every crash-between-write-and-
    publish leaves behind (a writer killed before ``commit()``
    published; a stream-sink driver killed between the task writes and
    the commit leg; a lost-race duplicate whose cleanup itself died).
    These files are invisible to readers (entries name files, not
    dirs) AND to :func:`vacuum` (whose candidate universe is
    log-referenced files), so without this sweep they leak forever.

    Safety rails: a dir survives if ANY of its files is referenced by
    any retained entry or checkpoint (committed data), if a live WAP
    staging manifest claims it (staged-not-yet-published data — that
    lifecycle belongs to ``wap.expire_staged``), or if it is younger
    than ``older_than_sec`` (a write in flight RIGHT NOW). Run it on
    the same maintenance cadence as vacuum, with a horizon comfortably
    above the longest plausible write (hours, not minutes)."""
    data_root = os.path.join(path, "data")
    if not os.path.isdir(data_root):
        return []
    # scan _staging BEFORE the log: publish_staged writes the log entry
    # FIRST and drops the manifest after, so a publish racing this
    # sweep is caught on one side or the other (manifest still present
    # -> staged_dirs protects it; manifest already gone -> the entry
    # exists by the time the log scan below runs). Scanning the log
    # first would leave a window where a just-published dir looks
    # unreferenced AND unmanifested — and gets deleted (data loss).
    staged_dirs: set[str] = set()
    staging_root = os.path.join(path, "_staging")
    if os.path.isdir(staging_root):
        for f in os.listdir(staging_root):
            if f.endswith(".json"):
                try:
                    m = json.load(open(os.path.join(staging_root, f)))
                    staged_dirs.add(os.path.basename(m.get("data_dir", "")))
                except (OSError, ValueError):
                    continue  # unreadable manifest: leave its dir alone
    referenced_dirs: set[str] = set()
    for e in _entries(path):
        for rel in e.get("added", []):
            referenced_dirs.add(rel.split(os.sep)[1])
    for cv in _checkpoint_versions(path):
        for rel in _read_checkpoint(path, cv).get("live", []):
            parts = rel.split(os.sep)
            if len(parts) > 1:
                referenced_dirs.add(parts[1])
    now = time.time()
    swept = []
    stats_root = os.path.join(path, "_stats")

    def _old_enough(full: str) -> bool:
        try:
            return now - os.path.getmtime(full) > older_than_sec
        except OSError:
            return False

    for d in sorted(os.listdir(data_root)):
        if not d.startswith("commit-"):
            continue
        if d in referenced_dirs or d in staged_dirs:
            continue
        full = os.path.join(data_root, d)
        if not _old_enough(full):
            continue
        swept.append(os.path.join("data", d))
        if not dry_run:
            shutil.rmtree(full, ignore_errors=True)
            # the same crash leaks the commit's _stats partials
            # (written pre-publish by analyze_stats) — reclaim together
            shutil.rmtree(os.path.join(stats_root, d), ignore_errors=True)
    # stats partials whose data dir is already gone (e.g. swept by an
    # earlier code generation) leak independently — same rails apply
    if os.path.isdir(stats_root):
        for d in sorted(os.listdir(stats_root)):
            if (
                d.startswith("commit-")
                and d not in referenced_dirs
                and d not in staged_dirs
                and not os.path.isdir(os.path.join(data_root, d))
                and _old_enough(os.path.join(stats_root, d))
            ):
                swept.append(os.path.join("_stats", d))
                if not dry_run:
                    shutil.rmtree(
                        os.path.join(stats_root, d), ignore_errors=True
                    )
    return swept


def expire_log(path: str, keep_last: int = 1) -> dict:
    """Bound table METADATA the way ``vacuum`` bounds data: drop history
    older than the last ``keep_last`` versions — first vacuum the
    unreferenced data files (while the full log still knows about them),
    then write a checkpoint at the oldest retained version and delete
    every log entry and checkpoint below it. This is Delta's
    ``logRetentionDuration`` + checkpoint-cleanup pair: a long-lived
    streaming table with per-batch commits keeps an O(keep_last +
    interval) log forever instead of growing without bound.

    Retained snapshot reads are unaffected (they resolve from the base
    checkpoint + tail, which is how reads already work); txn watermarks
    survive inside the checkpoint; reads of expired versions raise.
    """
    doomed = vacuum(path, keep_last)
    versions = _commit_versions(path)
    if not versions:
        return {"files_deleted": doomed, "entries_deleted": 0, "base": None}
    base = versions[-max(keep_last, 1):][0]
    # upgrade=True: a legacy checkpoint at base (missing table_schema or
    # other later-added fields) must be rewritten BEFORE the entries
    # below it are deleted — its fallback resolution path is exactly
    # those entries (see _write_checkpoint docstring)
    _write_checkpoint(path, base, upgrade=True)  # makes base standalone
    dropped = 0
    store = get_log_store()
    for v in versions:
        if v < base:
            store.delete(os.path.join(_log_dir(path), f"{v:020d}.json"))
            dropped += 1
    for cv in _checkpoint_versions(path):
        if cv < base:
            store.delete(
                os.path.join(_log_dir(path), f"{cv:020d}.checkpoint.json")
            )
    return {"files_deleted": doomed, "entries_deleted": dropped, "base": base}


def optimize_table(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    zorder_by: tuple[str, ...] = (),
    stats_cols: tuple[str, ...] = (),
    analyze_stats: bool | tuple[str, ...] = False,
    files: list[str] | None = None,
    transform: Callable[[DataFrame], DataFrame] | None = None,
) -> dict:
    """Delta-OPTIMIZE semantics: rewrite the CURRENT live set into
    target-sized files and publish the compacted layout as one atomic
    commit (adds the new files, removes the fragmented ones). History is
    untouched — older versions still resolve to the original files until
    ``vacuum`` reclaims them. Readers never see a half-compacted table:
    the swap is the log entry.

    ``zorder_by`` is Delta's ``OPTIMIZE ... ZORDER BY``: the rewrite is
    clustered on the Morton curve of those columns
    (operators/zorder.py — one range shuffle, same cost class as the
    plain repartition), so every output file covers a compact box in
    ALL of them and min-max skipping works for each. Per-file [min,max]
    ranges are recorded in the log entry for ``stats_cols`` (defaulting
    to the zorder columns) — the same metadata :func:`merge_into`
    prunes with, so an optimized table stays merge-prunable.

    Concurrency: publication goes through the shared claim loop. A
    concurrent APPEND costs only a retry (its files stay live beside the
    compacted ones — we remove exactly the files we rewrote). A
    concurrent writer that REMOVED any file we compacted makes our
    rewrite stale: publishing would resurrect deleted data, so we raise
    CommitConflict instead (Delta's ConcurrentDeleteRead rule).

    ``files`` restricts the rewrite to a SUBSET of the live set (callers
    pass e.g. only the small files) — the primitive behind
    :func:`compact_small_files` / streaming auto-compaction: untouched
    files stay live beside the compacted output, so a table with a few
    large well-sized files and a tail of per-batch fragments pays only
    for the fragments.

    ``transform`` rewrites the files' CONTENT, not just their layout:
    the callable maps the rewritten rows to their replacement (e.g.
    folding per-batch delta rows into one row per key for tables whose
    readers aggregate deltas). The concurrency contract is what makes
    this safe where a logical overwrite is not: the commit removes
    exactly the files that were read and folded, so a racing append's
    NEW delta files stay live beside the folded output instead of being
    silently dropped (operators/inverted_index.compact_bm25_stats is
    the motivating caller).

    Returns the commit entry plus before/after file counts. Sizing uses
    on-disk bytes-per-row like ``maintenance.compact_table``.
    """
    from pyspark.sql import functions as F

    # zorder/stats columns arrive logical; the rewrite is physical
    _cm = _column_mapping_at(path)
    zorder_by = tuple(_cm_phys(_cm, c) for c in zorder_by)
    stats_cols = tuple(_cm_phys(_cm, c) for c in stats_cols)
    if not isinstance(analyze_stats, bool) and analyze_stats:
        analyze_stats = tuple(_cm_phys(_cm, c) for c in analyze_stats)

    snapshot, _ = _state_at(path)
    if files is not None:
        unknown = set(files) - set(snapshot)
        if unknown:
            raise ValueError(
                f"optimize subset names {len(unknown)} file(s) not live at "
                f"{path}: {sorted(unknown)[:3]}..."
            )
        live = list(files)
    else:
        live = snapshot
    if not live:
        raise ValueError(f"nothing to optimize at {path}")
    full = [os.path.join(path, f) for f in live]
    total_bytes = sum(os.path.getsize(f) for f in full if os.path.exists(f))
    reader = spark.read
    if _mixed_schema_at(path):
        # evolved table: compact to the UNION schema (missing columns
        # null-filled) — OPTIMIZE doubles as schema compaction, after
        # which the rewritten files are single-schema again
        reader = reader.option("mergeSchema", "true")
    df = reader.parquet(*full)
    dvs = _dv_at(path)
    if dvs:
        # compaction MATERIALIZES deletion vectors: the rewrite excludes
        # the deleted positions and the vectors die with the replaced
        # files (delete_rows_dv's documented materialization step)
        df = _apply_dvs(spark, df, path, live, dvs)
    if transform is not None:
        in_rows = df.count()
        in_schema = [(f.name, f.dataType) for f in df.schema.fields]
        df = transform(df)
        # the transform may only FOLD ROWS — the files it emits replace
        # files of this table's current (possibly physical-named)
        # schema, and a column change would publish a snapshot whose
        # files diverge from the recorded table schema while build()
        # stamps it single-schema. Compare against the INPUT frame
        # (already in physical names under column mapping).
        if [(f.name, f.dataType) for f in df.schema.fields] != in_schema:
            raise ValueError(
                "optimize_table transform must preserve the rewritten "
                f"files' schema (rows may fold, columns may not): input "
                f"was {in_schema}, transform returned "
                f"{[(f.name, f.dataType) for f in df.schema.fields]}"
            )
    rows = df.count()
    if transform is not None:
        # sizing must reflect the TRANSFORMED output: a row-folding
        # transform shrinks cardinality, and input-bytes sizing would
        # fragment the (small) folded result into n_out near-empty
        # files — the opposite of OPTIMIZE's purpose
        bytes_per_row = max(total_bytes / max(in_rows, 1), 1e-6)
        total_bytes = rows * bytes_per_row
    bytes_per_row = max(total_bytes / max(rows, 1), 1e-6)
    records_per_file = max(int(target_file_bytes / bytes_per_row), 1)
    n_out = max(math.ceil(total_bytes / target_file_bytes), 1)

    if zorder_by:
        from .zorder import zorder_value

        out = (
            zorder_value(df, list(zorder_by))
            .repartitionByRange(n_out, F.col("_zvalue"))
            .sortWithinPartitions("_zvalue")
            .drop("_zvalue")
        )
    else:
        out = df.repartition(n_out)

    commit_dir = f"commit-{uuid.uuid4().hex[:12]}"
    data_path = os.path.join(path, "data", commit_dir)
    (
        out.write.mode("error")
        .option("maxRecordsPerFile", records_per_file)
        .parquet(data_path)
    )
    added = sorted(
        os.path.join("data", commit_dir, f)
        for f in os.listdir(data_path)
        if f.endswith(".parquet")
    )
    stats_record = tuple(stats_cols) or tuple(zorder_by)
    file_stats = (
        _collect_file_stats(spark, path, data_path, stats_record)
        if stats_record and added
        else {}
    )
    stats_rel = (
        _write_stats_partials(
            spark, path, data_path,
            None if analyze_stats is True else tuple(analyze_stats),
        )
        if analyze_stats and added
        else None
    )

    compacted = set(live)
    op_suffix = f" ZORDER({','.join(zorder_by)})" if zorder_by else ""

    def build(version: int) -> dict:
        current_live, _ = _state_at(path, version - 1)
        missing = compacted - set(current_live)
        if missing:
            raise CommitConflict(
                f"OPTIMIZE on {path} raced a writer that removed "
                f"{len(missing)} compacted file(s); re-run on the new snapshot"
            )
        # the rewrite materialized the PLAN-time vectors; a vector that
        # landed since would die unmaterialized with the replaced file
        _refuse_dv_drift(path, compacted, dvs, version - 1, "OPTIMIZE")
        entry = {
            "version": version,
            "timestamp": time.time(),
            "mode": "optimize",
            "added": added,
            "removed": sorted(compacted),
            "operation": f"OPTIMIZE({len(live)}->{len(added)}){op_suffix}",
        }
        if set(current_live) == compacted:
            # FULL rewrite: the post-optimize live set is exactly our
            # union-schema output, so the snapshot is single-schema
            # again — record it so reads stop paying mergeSchema (the
            # "OPTIMIZE doubles as schema compaction" payoff; a subset
            # compaction or a raced-in append keeps the flag off,
            # conservatively mixed)
            entry["unified_schema"] = True
        if file_stats:
            entry["file_stats"] = file_stats
        if stats_rel:
            entry["stats_partials"] = stats_rel
        return entry

    try:
        entry = _publish(path, build)
    except CommitConflict:
        shutil.rmtree(data_path, ignore_errors=True)  # stale rewrite: no orphans
        if stats_rel:
            shutil.rmtree(os.path.join(path, stats_rel), ignore_errors=True)
        raise
    assert entry is not None
    return {**entry, "files_before": len(live), "files_after": len(added)}


def table_changes(
    spark: SparkSession,
    path: str,
    from_version: int,
    to_version: int | None = None,
) -> DataFrame:
    """CHANGE DATA FEED, derived from the log at READ time: the
    row-level changes each commit in ``[from_version, to_version]``
    made, tagged ``_change_type`` ∈ {insert, delete, update_preimage,
    update_postimage} + ``_commit_version`` — Delta's CDF surface,
    without writing change files (the log + immutable data files
    already determine every change):

    - append  → added files' rows are inserts;
    - overwrite/restore → removed rows are deletes, added rows inserts
      (an overwrite IS delete-all+insert-all, and a restore's logical
      change is exactly the rows it brings back/drops);
    - OPTIMIZE → no logical change, contributes nothing (compaction
      must be invisible to downstream consumers — the property that
      makes auto-compaction safe to run inside ingest loops);
    - MERGE → the rewritten files' row-level diff (exceptAll both
      ways — exact multiset semantics), classified by the recorded
      merge key: both sides = update (pre+post images), added-only =
      insert, removed-only = delete. Unchanged rows copied during the
      rewrite cancel in the diff;
    - DELETE → removed-minus-added rows are deletes.

    Cost scales with the CHANGED files only (file-granular writers keep
    those proportional to each batch), never the table. This is what
    feeds incremental downstream consumers without reprocessing
    snapshots: `rollup over table_changes(v..w)` instead of re-reading
    the table.

    Vacuum caveat (same as Delta): changes older than the retention
    window lose their data files — resolve feeds before vacuuming past
    them. Plan-size caveat: the feed unions one branch per requested
    version, so ask for bounded ranges (a consumer polling from its
    watermark — ``incremental.refresh_from_changes`` — does this
    naturally); a thousand-version catch-up belongs in a few chunked
    calls, not one plan. Filtering on ``_change_type`` prunes whole
    branches at optimization time (the tag is a literal per branch).
    """
    from pyspark.sql import functions as F

    lv = latest_version(path)
    if lv is None:
        raise FileNotFoundError(f"no versioned table at {path}")
    hi = lv if to_version is None else to_version
    oldest = _commit_versions(path)[0]
    if from_version < oldest:
        # expired history: silently returning a PARTIAL feed would make
        # a consumer's state drift undetectably — fail loudly instead
        # (the consumer must bootstrap from a snapshot at `oldest`)
        raise ValueError(
            f"change feed from {from_version} unavailable: history before "
            f"version {oldest} is expired (expire_log retention). "
            f"Bootstrap from read_table(version={oldest}) and consume "
            f"changes from {oldest + 1}."
        )
    entries = [
        e for e in _entries(path, lo=from_version, hi=hi)
    ]
    if not entries:
        raise ValueError(f"no commits in [{from_version}, {hi}] at {path}")

    _mixed_memo: dict[int, bool] = {}

    def _mixed(at_version: int) -> bool:
        if at_version not in _mixed_memo:
            _mixed_memo[at_version] = _mixed_schema_at(path, at_version)
        return _mixed_memo[at_version]

    # change rows are consumed to rebuild the CURRENT table, so every
    # branch surfaces under the names at the feed's END version: each
    # row's columns resolve physically under ITS version's mapping, then
    # re-label to the end-version logical names (same physical identity
    # = same feed column, across any number of renames). A column
    # dropped by `hi` keeps its physical name and union-nulls.
    cm_hi = _column_mapping_at(path, hi)
    _rev_hi = {p: l for l, p in cm_hi.get("map", {}).items()}

    def to_hi_names(df, at_version):
        cmv = _column_mapping_at(path, at_version)
        if _cm_is_identity(cmv) and _cm_is_identity(cm_hi):
            return df
        m_v = cmv.get("map", {})
        return df.select(*[
            F.col(c).alias(_rev_hi.get(m_v.get(c, c), m_v.get(c, c)))
            for c in df.columns
        ])

    def rows_of(rel_files, at_version):
        """Read one entry's historical file set. Mixedness is evaluated
        AT THAT VERSION, not at the latest: after evolution followed by
        an overwrite (which resets the latest-mixed flag), the
        overwrite's REMOVED set still spans two schemas — reading it
        without mergeSchema silently drops evolved columns from the
        change feed. Deletion vectors at that version are applied too:
        rows a vector had already deleted must not re-appear as the
        overwrite's delete rows."""
        existing = [f for f in rel_files
                    if os.path.exists(os.path.join(path, f))]
        if not existing:
            return None
        reader = spark.read
        if _mixed(at_version):
            reader = reader.option("mergeSchema", "true")
        df = reader.parquet(*[os.path.join(path, f) for f in existing])
        dvs = _dv_at(path, at_version)
        if dvs:
            df = _apply_dvs(spark, df, path, existing, dvs)
        # physical -> the row's version's logical -> end-version names
        return to_hi_names(
            _apply_column_mapping(spark, df, path, at_version), at_version
        )

    def rows_at_positions(dv: dict, at_version):
        """The rows a delete_dv entry removed: its files read at the
        recorded positions (broadcast semi-join on file_name+row_index,
        bounded by the max_dv_rows contract)."""
        existing = [f for f in dv if os.path.exists(os.path.join(path, f))]
        if not existing:
            return None
        reader = spark.read
        if _mixed(at_version):
            reader = reader.option("mergeSchema", "true")
        df = reader.parquet(*[os.path.join(path, f) for f in existing])
        pairs = [
            (os.path.basename(f), int(p))
            for f in existing
            for p in dv[f]
        ]
        pos = spark.createDataFrame(pairs, "_dv_fn string, _dv_ri long")
        picked = (
            df.withColumn("_dv_fn", F.col("_metadata.file_name"))
            .withColumn("_dv_ri", F.col("_metadata.row_index"))
            .join(F.broadcast(pos), ["_dv_fn", "_dv_ri"], "left_semi")
            .drop("_dv_fn", "_dv_ri")
        )
        return to_hi_names(
            _apply_column_mapping(spark, picked, path, at_version), at_version
        )

    def tag(df, change_type, version):
        return df.select(
            "*",
            F.lit(change_type).alias("_change_type"),
            F.lit(version).alias("_commit_version"),
        )

    parts: list[DataFrame] = []
    for e in entries:
        v, mode = e["version"], e.get("mode")
        # added files exist in the v snapshot; removed files come from
        # the PREVIOUS snapshot — each side reads under its own
        # version's mixedness
        added = rows_of(e.get("added", []), v)
        removed = rows_of(e.get("removed", []), v - 1)
        if mode == "optimize":
            continue
        if mode == "delete_dv":
            gone = rows_at_positions(e.get("dv", {}), v - 1)
            if gone is not None:
                parts.append(tag(gone, "delete", v))
            continue
        if mode == "merge":
            key = e.get("merge_key")
            # merge entries record the PHYSICAL key; the change frames
            # carry END-version names — resolve through the hi mapping
            if key is not None:
                key = _rev_hi.get(key, key)
            if added is None or removed is None or key is None:
                raise ValueError(
                    f"version {v}: MERGE entry lacks data for change "
                    "derivation (pre-CDF commit?)"
                )
            new_rows = added.exceptAll(removed)
            old_rows = removed.exceptAll(added)
            upd_keys = (
                new_rows.select(key).intersect(old_rows.select(key))
            )
            parts.append(tag(new_rows.join(upd_keys, key, "left_semi"),
                             "update_postimage", v))
            parts.append(tag(old_rows.join(upd_keys, key, "left_semi"),
                             "update_preimage", v))
            parts.append(tag(new_rows.join(upd_keys, key, "left_anti"),
                             "insert", v))
            parts.append(tag(old_rows.join(upd_keys, key, "left_anti"),
                             "delete", v))
        elif mode == "update":
            # rewritten files hold changed AND copied-unchanged rows;
            # the multiset diff isolates the actual updates (pre/post
            # cannot be PAIRED without a key, but the diff itself is
            # the change — counts are symmetric by construction)
            if added is not None and removed is not None:
                parts.append(tag(added.exceptAll(removed),
                                 "update_postimage", v))
                parts.append(tag(removed.exceptAll(added),
                                 "update_preimage", v))
        elif mode == "delete":
            if removed is not None:
                gone = (
                    removed.exceptAll(added) if added is not None else removed
                )
                parts.append(tag(gone, "delete", v))
        else:  # append / overwrite / restore
            if removed is not None:
                parts.append(tag(removed, "delete", v))
            if added is not None:
                parts.append(tag(added, "insert", v))

    if not parts:
        schema = _table_schema_at(spark, path, hi)
        empty = spark.createDataFrame([], schema)
        return tag(empty, "insert", from_version).limit(0)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out


class ConstraintViolation(ValueError):
    """A committed batch broke the table's declared contract."""


def set_table_constraints(path: str, specs: list[dict]) -> None:
    """Declare the table's row-level contract (Delta's NOT NULL / CHECK
    constraints): a list of declarative specs persisted as
    ``_constraints.json`` and enforced on every subsequent
    :func:`commit`. Declarative (not Column objects) so the contract
    survives restarts and travels with the table:

    - ``{"kind": "not_null", "col": c}``
    - ``{"kind": "in_range", "col": c, "lo": x, "hi": y}``
    - ``{"kind": "in_set",  "col": c, "values": [...]}``
    - ``{"kind": "matches", "col": c, "regex": r}``
    - ``{"kind": "check",   "name": n, "sql": "<boolean expr>"}``
    """
    from .expectations import in_range, in_set, matches, not_null  # noqa: F401

    _constraints_from_specs(specs)  # validate eagerly: bad spec fails HERE
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "_constraints.json"), "w") as fh:
        json.dump({"constraints": specs}, fh)


def table_constraints(path: str) -> list[dict]:
    """The declared specs (empty list when none)."""
    target = os.path.join(path, "_constraints.json")
    if not os.path.exists(target):
        return []
    with open(target) as fh:
        return json.load(fh)["constraints"]


def _constraints_from_specs(specs: list[dict]):
    from pyspark.sql import functions as F

    from .expectations import custom, in_range, in_set, matches, not_null

    out = []
    for s in specs:
        kind = s["kind"]
        if kind == "not_null":
            out.append(not_null(s["col"]))
        elif kind == "in_range":
            out.append(in_range(s["col"], s["lo"], s["hi"]))
        elif kind == "in_set":
            out.append(in_set(s["col"], s["values"]))
        elif kind == "matches":
            out.append(matches(s["col"], s["regex"]))
        elif kind == "check":
            out.append(custom(s["name"], F.expr(s["sql"])))
        else:
            raise ValueError(f"unknown constraint kind {kind!r}")
    return out


def _enforce_constraints(df: DataFrame, path: str) -> None:
    """Gate a batch on the table contract — one aggregation pass over
    the BATCH (never the table), all predicates partial-aggregated in a
    single job (operators/expectations.py). Violations fail CLOSED with
    per-check counts; quarantine-don't-block flows should split with
    ``split_by_expectations`` BEFORE committing (this gate is the
    last line, not the triage tool)."""
    specs = table_constraints(path)
    if not specs:
        return
    from .expectations import run_expectations

    report = run_expectations(df, _constraints_from_specs(specs))
    if not report["passed"]:
        bad = {k: v for k, v in report["checks"].items() if v}
        raise ConstraintViolation(
            f"batch violates table constraints at {path}: {bad} "
            f"(of {report['n_rows']} rows)"
        )


def delete_rows(
    spark: SparkSession,
    path: str,
    predicates: dict[str, tuple] | None = None,
    where: str | None = None,
    txn_app_id: str | None = None,
    txn_version: int | None = None,
    keys: dict[str, list] | None = None,
) -> dict | None:
    """Delta-style DELETE, FILE-GRANULAR: rows matching the predicate
    are removed by rewriting ONLY the live files whose recorded
    [min, max] ranges can contain them; every other file stays live
    untouched (same skipping machinery as :func:`merge_into` /
    :func:`read_table_pruned`). History is preserved — the deletion is
    one commit, old snapshots still show the rows until ``vacuum``.

    The predicate is ``predicates`` ({col: (lo, hi)} ranges — these both
    PRUNE files and delete), optionally AND-ed with ``where`` (an
    arbitrary SQL boolean — applied to rows but unusable for pruning,
    so give range predicates whenever you have them: `WHERE day =
    '2024-01-01' AND user_id = 7` should arrive as
    ``predicates={'day': ('2024-01-01','2024-01-01')}, where="user_id
    = 7"``). A candidate file whose rewrite drops no rows is left live
    as-is (no-op rewrites are skipped, not published). GDPR-style
    per-key erasure is this + a key-range predicate; erasing the
    HISTORY too is ``vacuum`` after retention.

    ``keys={col: [v, ...]}`` is the GDPR point-erasure form: delete
    rows whose column is IN a bounded key list. Files are pruned per
    key through BOTH the [min,max] ranges and the per-file Bloom
    filters (``commit(bloom_cols=...)``) — erasing a handful of ids
    from a million-file table rewrites only the files that can
    actually hold them. The list is driver-held: thousands of keys,
    not millions (a million-key erasure is a MERGE-shaped anti-join
    rewrite, not a point delete).

    Returns the commit entry (+ files_matched / rows audit) or None if
    no row matched anywhere. Idempotent-writer contract via
    ``txn_app_id``/``txn_version`` like every other writer here.
    """
    from pyspark.sql import functions as F

    preds = dict(predicates or {})
    keys = {c: list(vs) for c, vs in (keys or {}).items() if vs}
    if not preds and where is None and not keys:
        raise ValueError("delete_rows needs predicates, keys, and/or where")
    # predicates/keys arrive on LOGICAL names; the rewrite reads and
    # writes PHYSICAL files — translate the structured args, refuse raw
    # SQL that references renamed/dropped names (see _cm_refuse_expr)
    _cm = _column_mapping_at(path)
    _cm_refuse_expr(_cm, where, "delete_rows where=")
    _cm_refuse_names(_cm, {**(preds or {}), **(keys or {})},
                     "delete_rows preds/keys")
    preds = _cm_translate_keys(_cm, preds)
    keys = _cm_translate_keys(_cm, keys)
    has_txn = txn_app_id is not None and txn_version is not None
    if has_txn:
        seen = latest_txn_version(path, txn_app_id)
        if seen is not None and txn_version <= seen:
            return None

    live, _ = _state_at(path)
    if not live:
        raise FileNotFoundError(f"no versioned table at {path}")
    stats = _file_stats_at(path)
    dtypes = {
        _cm_phys(_cm, k): v
        for k, v in _column_dtypes(spark, path).items()
    }
    # range compares run against the stats' RENDERED form (numbers
    # native, temporal/other as their string rendering — _stat_probe)
    sp = {
        c: (_stat_probe(lo, dtypes.get(c)), _stat_probe(hi, dtypes.get(c)))
        for c, (lo, hi) in preds.items()
    }
    skeys = {
        c: [_stat_probe(v, dtypes.get(c)) for v in vs]
        for c, vs in keys.items()
    }

    def overlaps(rng, lo, hi) -> bool:
        if rng is None or rng[0] is None:
            return True
        if hi is not None and rng[0] > hi:
            return False
        if lo is not None and rng[1] < lo:
            return False
        return True

    key_hashes: dict[str, list[list[int]]] = {}
    if keys:
        probe = spark.range(1).select(
            *[
                _bloom_hash(_probe_lit(v, dtypes.get(c)), i)
                .alias(f"{c}__{j}__{i}")
                for c, vs in keys.items()
                for j, v in enumerate(vs)
                for i in range(BLOOM_HASHES)
            ]
        ).first()
        key_hashes = {
            c: [
                [probe[f"{c}__{j}__{i}"] for i in range(BLOOM_HASHES)]
                for j in range(len(vs))
            ]
            for c, vs in keys.items()
        }

    def key_admits(fstats: dict, c: str) -> bool:
        """Some key of ``c`` can live in the file (range AND bloom)."""
        rng = fstats.get(c)
        encoded = fstats.get(f"{c}__bloom")
        for v, hs in zip(skeys[c], key_hashes[c]):
            if not overlaps(rng, v, v):
                continue
            if encoded is not None and not _bloom_may_contain(encoded, hs):
                continue
            return True
        return False

    matched = [
        f for f in live
        if all(
            overlaps(stats.get(f, {}).get(c), lo, hi)
            for c, (lo, hi) in sp.items()
        )
        and all(key_admits(stats.get(f, {}), c) for c in keys)
    ]
    if not matched:
        return None
    _refuse_dv_files(path, matched, "DELETE")

    cond = F.lit(True)
    for c, (lo, hi) in preds.items():
        if lo is not None:
            cond = cond & (F.col(c) >= lo)
        if hi is not None:
            cond = cond & (F.col(c) <= hi)
    for c, vs in keys.items():
        cond = cond & F.col(c).isin(*vs)
    if where is not None:
        cond = cond & F.expr(where)

    reader = spark.read
    if _mixed_schema_at(path):
        reader = reader.option("mergeSchema", "true")
    base = reader.parquet(*[os.path.join(path, f) for f in matched])
    # dual-name evaluation: physical columns + logical aliases, so the
    # raw `where` (written in logical terms) resolves; the rewrite
    # re-selects physical columns only
    aug = _with_logical_aliases(base, _cm)
    n_deleted = aug.filter(cond).count()
    if n_deleted == 0:
        return None  # stats said "maybe"; rows said no — publish nothing
    kept = aug.filter(~F.coalesce(cond, F.lit(False))).select(*base.columns)

    commit_dir = f"commit-{uuid.uuid4().hex[:12]}"
    data_path = os.path.join(path, "data", commit_dir)
    kept.write.mode("error").parquet(data_path)
    added = sorted(
        os.path.join("data", commit_dir, f)
        for f in os.listdir(data_path)
        if f.endswith(".parquet")
    )
    stats_record = tuple(preds) + tuple(k for k in keys if k not in preds)
    file_stats = (
        _collect_file_stats(spark, path, data_path, stats_record)
        if stats_record and added
        else {}
    )
    bloom_keep = _bloomed_cols(stats, matched)
    if bloom_keep and added:
        for rel, enc in _collect_bloom_filters(
            spark, data_path, bloom_keep
        ).items():
            file_stats.setdefault(rel, {}).update(enc)
    rewritten = set(matched)

    def build(version: int) -> dict | None:
        if has_txn:
            _, txns = _state_at(path, version - 1)
            w = txns.get(txn_app_id)
            if w is not None and txn_version <= int(w):
                return None
        current_live, _ = _state_at(path, version - 1)
        missing = rewritten - set(current_live)
        if missing:
            raise CommitConflict(
                f"DELETE on {path} raced a writer that removed "
                f"{len(missing)} rewritten file(s); re-run on the new snapshot"
            )
        # planning's _refuse_dv_files guaranteed the rewritten files
        # were vector-free; a vector landing since must abort us
        _refuse_dv_drift(path, rewritten, {}, version - 1, "DELETE")
        entry = {
            "version": version,
            "timestamp": time.time(),
            "mode": "delete",
            "added": added,
            "removed": sorted(rewritten),
            "operation": f"DELETE({n_deleted} rows, "
                         f"{len(matched)} of {len(live)} files rewritten)",
        }
        if has_txn:
            entry["txn"] = {"app_id": txn_app_id, "version": txn_version}
        if file_stats:
            entry["file_stats"] = file_stats
        return entry

    try:
        entry = _publish(path, build)
    except CommitConflict:
        shutil.rmtree(data_path, ignore_errors=True)
        raise
    if entry is None:
        shutil.rmtree(data_path, ignore_errors=True)
        return None
    return {
        **entry,
        "files_matched": len(matched),
        "files_untouched": len(live) - len(matched),
        "rows_deleted": n_deleted,
    }


def delete_rows_dv(
    spark: SparkSession,
    path: str,
    predicates: dict[str, tuple] | None = None,
    where: str | None = None,
    keys: dict[str, list] | None = None,
    txn_app_id: str | None = None,
    txn_version: int | None = None,
    max_dv_rows: int = 100_000,
) -> dict | None:
    """MERGE-ON-READ delete (Delta's deletion vectors): instead of
    rewriting the matched files, record the deleted ROW POSITIONS in
    the log; reads anti-join them out. Deleting 10 rows from a 1 GB
    file costs a metadata commit, not a gigabyte of write
    amplification — the right tool for small/point deletes on large
    files, with :func:`optimize_table` as the materialization step
    (compaction rewrites without the deleted rows and the vectors die
    with the replaced files).

    Same predicate surface as :func:`delete_rows` (ranges prune AND
    delete, ``keys`` prunes through the Bloom filters, ``where`` is
    row-only). Positions come from ``_metadata.row_index`` over ONLY
    the pruned candidate files; rows already deleted by an earlier
    vector are excluded (re-deleting is a no-op, not a double count).
    Refuses above ``max_dv_rows`` total positions — a large delete
    SHOULD rewrite (``delete_rows``), the vector form would just move
    the cost to every subsequent read.

    Trade-offs (same as Delta's): snapshot reads pay one broadcast
    anti-join while vectors exist; per-file [min,max]/bloom stats
    become upper bounds (pruning stays correct — a skipped file never
    contained the value; a read file just filters more). History and
    time travel are exact: the vector is versioned state, so
    ``read_table(version=v)`` applies exactly the vectors at v.
    """
    from pyspark.sql import functions as F

    preds = dict(predicates or {})
    keys = {c: list(vs) for c, vs in (keys or {}).items() if vs}
    if not preds and where is None and not keys:
        raise ValueError("delete_rows_dv needs predicates, keys, and/or where")
    # logical -> physical, same contract as delete_rows
    _cm = _column_mapping_at(path)
    _cm_refuse_expr(_cm, where, "delete_rows_dv where=")
    _cm_refuse_names(_cm, {**(preds or {}), **(keys or {})},
                     "delete_rows_dv preds/keys")
    preds = _cm_translate_keys(_cm, preds)
    keys = _cm_translate_keys(_cm, keys)
    has_txn = txn_app_id is not None and txn_version is not None
    if has_txn:
        seen = latest_txn_version(path, txn_app_id)
        if seen is not None and txn_version <= seen:
            return None

    live, _ = _state_at(path)
    if not live:
        raise FileNotFoundError(f"no versioned table at {path}")
    stats = _file_stats_at(path)
    dtypes = {
        _cm_phys(_cm, k): v
        for k, v in _column_dtypes(spark, path).items()
    }
    # range compares run against the stats' RENDERED form (numbers
    # native, temporal/other as their string rendering — _stat_probe)
    sp = {
        c: (_stat_probe(lo, dtypes.get(c)), _stat_probe(hi, dtypes.get(c)))
        for c, (lo, hi) in preds.items()
    }
    skeys = {
        c: [_stat_probe(v, dtypes.get(c)) for v in vs]
        for c, vs in keys.items()
    }

    def overlaps(rng, lo, hi) -> bool:
        if rng is None or rng[0] is None:
            return True
        if hi is not None and rng[0] > hi:
            return False
        if lo is not None and rng[1] < lo:
            return False
        return True

    key_hashes: dict[str, list[list[int]]] = {}
    if keys:
        probe = spark.range(1).select(
            *[
                _bloom_hash(_probe_lit(v, dtypes.get(c)), i)
                .alias(f"{c}__{j}__{i}")
                for c, vs in keys.items()
                for j, v in enumerate(vs)
                for i in range(BLOOM_HASHES)
            ]
        ).first()
        key_hashes = {
            c: [
                [probe[f"{c}__{j}__{i}"] for i in range(BLOOM_HASHES)]
                for j in range(len(vs))
            ]
            for c, vs in keys.items()
        }

    def key_admits(fstats: dict, c: str) -> bool:
        rng = fstats.get(c)
        encoded = fstats.get(f"{c}__bloom")
        for v, hs in zip(skeys[c], key_hashes[c]):
            if not overlaps(rng, v, v):
                continue
            if encoded is not None and not _bloom_may_contain(encoded, hs):
                continue
            return True
        return False

    matched = [
        f for f in live
        if all(
            overlaps(stats.get(f, {}).get(c), lo, hi)
            for c, (lo, hi) in sp.items()
        )
        and all(key_admits(stats.get(f, {}), c) for c in keys)
    ]
    if not matched:
        return None

    cond = F.lit(True)
    for c, (lo, hi) in preds.items():
        if lo is not None:
            cond = cond & (F.col(c) >= lo)
        if hi is not None:
            cond = cond & (F.col(c) <= hi)
    for c, vs in keys.items():
        cond = cond & F.col(c).isin(*vs)
    if where is not None:
        cond = cond & F.expr(where)

    reader = spark.read
    if _mixed_schema_at(path):
        reader = reader.option("mergeSchema", "true")
    base = reader.parquet(*[os.path.join(path, f) for f in matched])
    # pull the metadata columns into the frame FIRST (projections drop
    # access to the hidden _metadata struct), then add the logical
    # aliases so a raw `where` in logical terms resolves
    aug = _with_logical_aliases(
        base.select(
            F.col("_metadata.file_name").alias("_fn"),
            F.col("_metadata.row_index").alias("_ri"),
            "*",
        ),
        _cm,
    )
    hits = (
        aug.filter(F.coalesce(cond, F.lit(False)))
        .select("_fn", "_ri")
        .limit(max_dv_rows + 1)
        .collect()
    )
    if len(hits) > max_dv_rows:
        raise ValueError(
            f"delete_rows_dv matched more than max_dv_rows={max_dv_rows} "
            f"rows on {path}; use delete_rows (file rewrite) for large "
            "deletes — a vector this big taxes every subsequent read"
        )
    by_base = {os.path.basename(f): f for f in matched}
    # set-ify ONCE outside the loop: rebuilding per hit is
    # O(hits × vector) — ~10^10 ops at the max_dv_rows bound
    matched_set = set(matched)
    existing_sets = {
        f: set(ps) for f, ps in _dv_at(path).items() if f in matched_set
    }
    new_dv: dict[str, list[int]] = {}
    n_new = 0
    for r in hits:
        rel = by_base.get(r["_fn"])
        if rel is None:
            continue
        if int(r["_ri"]) in existing_sets.get(rel, ()):
            continue  # already deleted by an earlier vector
        new_dv.setdefault(rel, []).append(int(r["_ri"]))
        n_new += 1
    if n_new == 0:
        return None
    new_dv = {f: sorted(ps) for f, ps in new_dv.items()}

    def build(version: int) -> dict | None:
        if has_txn:
            _, txns = _state_at(path, version - 1)
            w = txns.get(txn_app_id)
            if w is not None and txn_version <= int(w):
                return None
        current_live, _ = _state_at(path, version - 1)
        missing = set(new_dv) - set(current_live)
        if missing:
            raise CommitConflict(
                f"DV DELETE on {path} raced a writer that removed "
                f"{len(missing)} file(s); re-run on the new snapshot"
            )
        entry = {
            "version": version,
            "timestamp": time.time(),
            "mode": "delete_dv",
            "added": [],
            "removed": [],
            "dv": new_dv,
            "operation": f"DELETE_DV({n_new} rows in {len(new_dv)} files, "
                         "no rewrite)",
        }
        if has_txn:
            entry["txn"] = {"app_id": txn_app_id, "version": txn_version}
        return entry

    entry = _publish(path, build)
    if entry is None:
        return None
    return {
        **entry,
        "files_matched": len(new_dv),
        "files_untouched": len(live) - len(new_dv),
        "rows_deleted": n_new,
    }


def _refuse_dv_drift(
    path: str,
    files,
    planned: dict[str, list[int]],
    version: int,
    op: str,
) -> None:
    """Publish-time re-check of the planning-time deletion-vector
    snapshot for the files a rewrite replaces. A concurrent
    ``delete_rows_dv`` landing a vector on one of them between plan and
    publish would otherwise be SILENTLY undone: the rewrite's output was
    computed without (or with a stale view of) that vector, and the
    vector dies with the file the commit removes — deleted rows
    resurrect. Delta's ConcurrentDeleteRead rule: refuse, make the
    caller re-plan on the new snapshot. ``version`` is the predecessor
    snapshot the claim loop is publishing on top of."""
    current = _dv_at(path, version)
    for f in files:
        if sorted(current.get(f, [])) != sorted(planned.get(f, [])):
            raise CommitConflict(
                f"{op} on {path}: deletion vector changed on rewritten "
                f"file {f} between plan and publish; re-run on the new "
                "snapshot"
            )


def _refuse_dv_files(path: str, files, op: str) -> None:
    """Rewrite-path guard: a file with a live deletion vector must be
    materialized (optimize_table) before a rewrite touches it —
    otherwise the rewrite copies rows the vector had deleted back to
    life. Bounded scope over silent resurrection."""
    dvs = _dv_at(path)
    hit = sorted(set(files) & set(dvs))
    if hit:
        raise ValueError(
            f"{op} on {path}: {len(hit)} matched file(s) carry deletion "
            "vectors; run optimize_table(files=...) to materialize them "
            f"first (e.g. {hit[:2]}...)"
        )


def update_rows(
    spark: SparkSession,
    path: str,
    set_exprs: dict[str, str],
    predicates: dict[str, tuple] | None = None,
    where: str | None = None,
    txn_app_id: str | None = None,
    txn_version: int | None = None,
    keys: dict[str, list] | None = None,
) -> dict | None:
    """Delta-style UPDATE, FILE-GRANULAR: rows matching the predicate
    get ``set_exprs`` applied ({column: SQL expression over the row,
    e.g. {"status": "'done'", "amount": "amount * 1.1"}}); only live
    files whose recorded [min, max] ranges can contain matches are
    rewritten (same pruning as :func:`delete_rows` — give range
    predicates whenever you have them; ``keys={col: [v, ...]}`` is the
    point-update form, pruned through the per-file Bloom filters
    exactly like keyed deletes). Unmatched rows in rewritten
    files are copied unchanged; untouched files stay live by identity.
    History keeps the pre-update rows until vacuum. The commit lands as
    ``mode="update"`` with constraint enforcement on the REWRITTEN
    output (an UPDATE must not break the table contract) and feeds
    :func:`table_changes` as update_pre/postimage rows.

    Returns the entry (+ rows_updated audit), None when nothing
    matched. Same idempotent-writer txn contract as every writer here.
    """
    from pyspark.sql import functions as F

    if not set_exprs:
        raise ValueError("update_rows needs set_exprs")
    preds = dict(predicates or {})
    keys = {c: list(vs) for c, vs in (keys or {}).items() if vs}
    if not preds and where is None and not keys:
        raise ValueError("update_rows needs predicates, keys, and/or where")
    # logical -> physical, same contract as delete_rows; SET keys
    # translate (the rewrite is physical), SET bodies and where are raw
    # SQL over the physical frame and are refused when they reference
    # renamed/dropped names
    _cm = _column_mapping_at(path)
    _cm_refuse_expr(_cm, where, "update_rows where=")
    for _k, _v in set_exprs.items():
        _cm_refuse_expr(_cm, _v, f"update_rows set_exprs[{_k}]=")
    _cm_refuse_names(
        _cm, {**(preds or {}), **(keys or {}), **set_exprs},
        "update_rows preds/keys/SET targets",
    )
    preds = _cm_translate_keys(_cm, preds)
    keys = _cm_translate_keys(_cm, keys)
    set_exprs = _cm_translate_keys(_cm, set_exprs)
    has_txn = txn_app_id is not None and txn_version is not None
    if has_txn:
        seen = latest_txn_version(path, txn_app_id)
        if seen is not None and txn_version <= seen:
            return None

    live, _ = _state_at(path)
    if not live:
        raise FileNotFoundError(f"no versioned table at {path}")
    stats = _file_stats_at(path)
    dtypes = {
        _cm_phys(_cm, k): v
        for k, v in _column_dtypes(spark, path).items()
    }
    # range compares run against the stats' RENDERED form (numbers
    # native, temporal/other as their string rendering — _stat_probe)
    sp = {
        c: (_stat_probe(lo, dtypes.get(c)), _stat_probe(hi, dtypes.get(c)))
        for c, (lo, hi) in preds.items()
    }
    skeys = {
        c: [_stat_probe(v, dtypes.get(c)) for v in vs]
        for c, vs in keys.items()
    }

    def overlaps(rng, lo, hi) -> bool:
        if rng is None or rng[0] is None:
            return True
        if hi is not None and rng[0] > hi:
            return False
        if lo is not None and rng[1] < lo:
            return False
        return True

    key_hashes: dict[str, list[list[int]]] = {}
    if keys:
        probe = spark.range(1).select(
            *[
                _bloom_hash(_probe_lit(v, dtypes.get(c)), i)
                .alias(f"{c}__{j}__{i}")
                for c, vs in keys.items()
                for j, v in enumerate(vs)
                for i in range(BLOOM_HASHES)
            ]
        ).first()
        key_hashes = {
            c: [
                [probe[f"{c}__{j}__{i}"] for i in range(BLOOM_HASHES)]
                for j in range(len(vs))
            ]
            for c, vs in keys.items()
        }

    def key_admits(fstats: dict, c: str) -> bool:
        """Some key of ``c`` can live in the file (range AND bloom)."""
        rng = fstats.get(c)
        encoded = fstats.get(f"{c}__bloom")
        for v, hs in zip(skeys[c], key_hashes[c]):
            if not overlaps(rng, v, v):
                continue
            if encoded is not None and not _bloom_may_contain(encoded, hs):
                continue
            return True
        return False

    matched = [
        f for f in live
        if all(
            overlaps(stats.get(f, {}).get(c), lo, hi)
            for c, (lo, hi) in sp.items()
        )
        and all(key_admits(stats.get(f, {}), c) for c in keys)
    ]
    if not matched:
        return None
    _refuse_dv_files(path, matched, "UPDATE")

    cond = F.lit(True)
    for c, (lo, hi) in preds.items():
        if lo is not None:
            cond = cond & (F.col(c) >= lo)
        if hi is not None:
            cond = cond & (F.col(c) <= hi)
    for c, vs in keys.items():
        cond = cond & F.col(c).isin(*vs)
    if where is not None:
        cond = cond & F.expr(where)
    cond = F.coalesce(cond, F.lit(False))

    reader = spark.read
    if _mixed_schema_at(path):
        reader = reader.option("mergeSchema", "true")
    base = reader.parquet(*[os.path.join(path, f) for f in matched])
    # dual-name evaluation (physical + logical aliases): SET bodies and
    # `where` written in logical terms resolve; the select below
    # re-projects exactly the physical columns, so the aliases never
    # reach the rewritten files
    aug = _with_logical_aliases(base, _cm)
    unknown = set(set_exprs) - set(base.columns)
    if unknown:
        raise ValueError(f"update_rows SET names unknown column(s) {sorted(unknown)}")
    n_updated = aug.filter(cond).count()
    if n_updated == 0:
        return None
    updated = aug.select(*[
        (F.when(cond, F.expr(set_exprs[c])).otherwise(F.col(c))).alias(c)
        if c in set_exprs else F.col(c)
        for c in base.columns
    ])
    # constraints are declared on LOGICAL names; enforce on the logical
    # overlay of the (physical) rewrite
    _enforce_constraints(
        updated if _cm_is_identity(_cm)
        else _apply_column_mapping(spark, updated, path),
        path,
    )

    commit_dir = f"commit-{uuid.uuid4().hex[:12]}"
    data_path = os.path.join(path, "data", commit_dir)
    updated.write.mode("error").parquet(data_path)
    added = sorted(
        os.path.join("data", commit_dir, f)
        for f in os.listdir(data_path)
        if f.endswith(".parquet")
    )
    stats_record = tuple(preds) + tuple(k for k in keys if k not in preds)
    file_stats = (
        _collect_file_stats(spark, path, data_path, stats_record)
        if stats_record and added
        else {}
    )
    bloom_keep = _bloomed_cols(stats, matched)
    if bloom_keep and added:
        for rel, enc in _collect_bloom_filters(
            spark, data_path, bloom_keep
        ).items():
            file_stats.setdefault(rel, {}).update(enc)
    rewritten = set(matched)

    def build(version: int) -> dict | None:
        if has_txn:
            _, txns = _state_at(path, version - 1)
            w = txns.get(txn_app_id)
            if w is not None and txn_version <= int(w):
                return None
        current_live, _ = _state_at(path, version - 1)
        missing = rewritten - set(current_live)
        if missing:
            raise CommitConflict(
                f"UPDATE on {path} raced a writer that removed "
                f"{len(missing)} rewritten file(s); re-run on the new snapshot"
            )
        _refuse_dv_drift(path, rewritten, {}, version - 1, "UPDATE")
        entry = {
            "version": version,
            "timestamp": time.time(),
            "mode": "update",
            "added": added,
            "removed": sorted(rewritten),
            "operation": f"UPDATE({n_updated} rows, "
                         f"{len(matched)} of {len(live)} files rewritten)",
        }
        if has_txn:
            entry["txn"] = {"app_id": txn_app_id, "version": txn_version}
        if file_stats:
            entry["file_stats"] = file_stats
        return entry

    try:
        entry = _publish(path, build)
    except CommitConflict:
        shutil.rmtree(data_path, ignore_errors=True)
        raise
    if entry is None:
        shutil.rmtree(data_path, ignore_errors=True)
        return None
    return {
        **entry,
        "files_matched": len(matched),
        "files_untouched": len(live) - len(matched),
        "rows_updated": n_updated,
    }


def compact_small_files(
    spark: SparkSession,
    path: str,
    small_bytes: int = 16 * 1024 * 1024,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files: int = 4,
    stats_cols: tuple[str, ...] = (),
    analyze_stats: bool | tuple[str, ...] = False,
) -> dict | None:
    """Delta autoCompact semantics: rewrite ONLY the live files smaller
    than ``small_bytes`` into target-sized ones, and only once at least
    ``min_files`` of them exist (compacting two tiny files into one tiny
    file is churn, not progress). Returns the OPTIMIZE entry, or None
    when there is nothing worth doing — callers (streaming loops) can
    invoke it after every batch for free.

    This is the small-files answer for per-batch commit patterns
    (streaming CDC/ingest): each micro-batch lands its own files; left
    alone a day of 1-minute batches is 1,440 fragments per table and
    every reader pays open-file overhead per fragment. Bounding the
    fragment count keeps reads O(data), not O(batches), while the
    subset rewrite keeps the compaction itself O(fragments).
    """
    live, _ = _state_at(path)
    small = [
        f for f in live
        if os.path.exists(os.path.join(path, f))
        and os.path.getsize(os.path.join(path, f)) < small_bytes
    ]
    if len(small) < min_files:
        return None
    return optimize_table(
        spark, path,
        target_file_bytes=target_file_bytes,
        stats_cols=stats_cols,
        analyze_stats=analyze_stats,
        files=small,
    )


def merge_into(
    spark: SparkSession,
    path: str,
    source: DataFrame,
    key: str,
    delete_col: str | None = None,
    validate_unique: bool = True,
    txn_app_id: str | None = None,
    txn_version: int | None = None,
    analyze_stats: bool | tuple[str, ...] = False,
) -> dict | None:
    """Delta-style MERGE (upsert by ``key``), FILE-GRANULAR: only live
    data files whose recorded [min, max] key range overlaps the source
    batch's key range are rewritten; every other file stays live
    untouched. This is the scale property that separates a MERGE from an
    overwrite — a CDC batch touching one day of keys rewrites one day of
    files, not the table (SCALE.md named this the production upgrade
    real Delta exists for).

    Semantics per key: present in both → source row wins (update);
    source-only → insert; target-only → kept. With ``delete_col``,
    source rows where that boolean column is true DELETE the key
    instead. Files committed without ``stats_cols=(key,)`` have no
    recorded range and are conservatively treated as overlapping.

    The rewrite commit records fresh [min, max] stats for its output
    files, so merge output stays prunable by later merges. Publication
    goes through the shared claim loop; like OPTIMIZE, a concurrent
    writer REMOVING a file this merge rewrote aborts with
    CommitConflict (publishing would resurrect deleted rows), while a
    concurrent append just costs a retry.

    ``txn_app_id``/``txn_version`` give the same idempotent-writer
    contract as :func:`commit` (skip + return None when the watermark
    already covers this version) — what a streaming CDC apply needs to
    survive micro-batch replay.
    """
    has_txn = txn_app_id is not None and txn_version is not None

    def _already_applied() -> bool:
        seen = latest_txn_version(path, txn_app_id) if has_txn else None
        return seen is not None and txn_version <= seen

    if _already_applied():  # skip before paying the source scan + rewrite
        return None

    from pyspark.sql import functions as _F

    # the upsert rows land in the table, so they face the same contract
    # as a commit (delete markers don't land — exempt)
    _enforce_constraints(
        source.filter(~_F.coalesce(_F.col(delete_col), _F.lit(False)))
        if delete_col else source,
        path,
    )

    # source arrives on LOGICAL names; the rewrite reads and writes
    # PHYSICAL files — convert once here, then the whole merge (key
    # range probe, file pruning, union, output stats) runs physically
    _cm = _column_mapping_at(path)
    if not _cm_is_identity(_cm):
        source = _to_physical_names(source, _cm)
        key = _cm_phys(_cm, key)
        if delete_col:
            delete_col = _cm_phys(_cm, delete_col)

    live, _ = _state_at(path)
    if not live:
        raise FileNotFoundError(f"no versioned table at {path}")
    stats = _file_stats_at(path)

    from pyspark.sql import functions as F

    # one bounded job over the source: key range + uniqueness check
    agg_row = source.agg(
        F.min(key).alias("lo"),
        F.max(key).alias("hi"),
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(F.col(key)).alias("nd"),
    ).first()
    if agg_row["n"] == 0:
        raise ValueError("merge_into: empty source batch")
    if validate_unique and agg_row["n"] != agg_row["nd"]:
        raise ValueError(
            f"merge_into: source has duplicate keys "
            f"({agg_row['n']} rows, {agg_row['nd']} distinct {key!r}) — "
            "collapse with latest_change_per_key first"
        )
    # compare in the stats' rendered form — a temporal merge key would
    # otherwise TypeError against the string-rendered min/max
    # (dtypes are keyed logical; key is physical by now)
    _kd = {
        _cm_phys(_cm, k): v for k, v in _column_dtypes(spark, path).items()
    }.get(key)
    lo, hi = _stat_probe(agg_row["lo"], _kd), _stat_probe(agg_row["hi"], _kd)

    def overlaps(rng) -> bool:
        if rng is None or rng[0] is None:
            return True  # unknown range: must assume it matches
        fmin, fmax = rng
        return not (fmax < lo or fmin > hi)

    matched = [f for f in live if overlaps(stats.get(f, {}).get(key))]
    untouched_set = set(live) - set(matched)
    _refuse_dv_files(path, matched, "MERGE")

    if matched:
        base_reader = spark.read
        if _mixed_schema_at(path):
            base_reader = base_reader.option("mergeSchema", "true")
        base = base_reader.parquet(*[os.path.join(path, f) for f in matched])
        # column set from the (possibly merged) base schema, NOT the
        # first file — on an evolved table a narrow first file would
        # silently drop the evolved columns from the rewrite
        cols = base.columns
    else:
        cols = source.columns
    out_cols = [c for c in cols if c != delete_col]
    lacking = [c for c in out_cols if c != key and c not in source.columns]
    if lacking:
        raise ValueError(
            f"merge_into source lacks table column(s) {lacking} — an upsert "
            "row must state every column's value (pass explicit nulls); on "
            "an evolved table the source must carry the UNION schema"
        )
    if matched:
        s = source.select(
            F.col(key).alias("__sk"),
            *[F.col(c).alias(f"__s_{c}") for c in source.columns if c != key],
        )
        joined = base.join(s, base[key] == s["__sk"], "full_outer")
        from_source = F.col("__sk").isNotNull()
        merged = joined.select(
            *[
                F.when(
                    from_source,
                    F.col("__sk") if c == key else F.col(f"__s_{c}"),
                ).otherwise(F.col(c)).alias(c)
                for c in out_cols
            ],
            *( [F.when(from_source, F.coalesce(F.col(f"__s_{delete_col}"), F.lit(False)))
                 .otherwise(F.lit(False)).alias("__del")]
               if delete_col else
               [F.lit(False).alias("__del")] ),
        )
        merged = merged.filter(~F.col("__del")).drop("__del")
    else:
        merged = source.filter(
            ~F.coalesce(F.col(delete_col), F.lit(False)) if delete_col else F.lit(True)
        ).select(*out_cols)

    commit_dir = f"commit-{uuid.uuid4().hex[:12]}"
    data_path = os.path.join(path, "data", commit_dir)
    merged.write.mode("error").parquet(data_path)
    added = sorted(
        os.path.join("data", commit_dir, f)
        for f in os.listdir(data_path)
        if f.endswith(".parquet")
    )
    try:
        file_stats = (
            _collect_file_stats(spark, path, data_path, (key,))
            if added else {}
        )
        stats_rel = (
            _write_stats_partials(
                spark, path, data_path,
                # analyze_stats arrives in LOGICAL names; the files just
                # written carry physical columns (same translation as
                # commit()/optimize_table — merge_into was missed, r8
                # self-review finding)
                None if analyze_stats is True
                else tuple(_cm_phys(_cm, c) for c in analyze_stats),
            )
            if analyze_stats and added
            else None
        )
    except Exception:
        # stats collection failed after the data write: drop the
        # unpublished commit dir instead of stranding orphan files
        shutil.rmtree(data_path, ignore_errors=True)
        raise
    rewritten = set(matched)

    def build(version: int) -> dict | None:
        if _already_applied():
            return None
        current_live, _ = _state_at(path, version - 1)
        missing = rewritten - set(current_live)
        if missing:
            raise CommitConflict(
                f"MERGE on {path} raced a writer that removed "
                f"{len(missing)} rewritten file(s); re-run on the new snapshot"
            )
        _refuse_dv_drift(path, rewritten, {}, version - 1, "MERGE")
        entry = {
            "version": version,
            "timestamp": time.time(),
            "mode": "merge",
            "added": added,
            "removed": sorted(rewritten),
            "merge_key": key,  # lets table_changes classify row changes
            "operation": f"MERGE({len(matched)} of {len(live)} files rewritten)",
        }
        if has_txn:
            entry["txn"] = {"app_id": txn_app_id, "version": txn_version}
        if file_stats:
            entry["file_stats"] = file_stats
        if stats_rel:
            entry["stats_partials"] = stats_rel
        return entry

    def _drop_orphans() -> None:
        shutil.rmtree(data_path, ignore_errors=True)
        if stats_rel:
            shutil.rmtree(os.path.join(path, stats_rel), ignore_errors=True)

    try:
        entry = _publish(path, build)
    except CommitConflict:
        _drop_orphans()
        raise
    if entry is None:  # concurrent duplicate txn published first
        _drop_orphans()
        return None
    return {
        **entry,
        "files_matched": len(matched),
        "files_untouched": len(untouched_set),
    }

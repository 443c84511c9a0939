"""Cross-PROCESS semantic conflict matrix (r7 verdict item 7).

test_logstore proves put_exclusive is one-winner across OS processes;
this suite lifts the proof to the SEMANTIC layer: two writers in
separate interpreters (separate JVMs, page caches, no shared GIL) drive
append / OPTIMIZE / DV-delete / keyed UPDATE pairs against one table
through the file LogStore. The contract under test — every attempt ends
in exactly one of the documented outcomes:

  ok           entry published (claim loop may have retried internally)
  noop         the op matched nothing (None — a legal result)
  conflict     CommitConflict (concurrent remove of a file this op read)
  dv_refusal   the documented materialize-first refusal on rewrites

and NEVER silent loss: afterwards the version chain is gap-free, every
reported-successful append's rows are present exactly once, every
reported-successful DV-delete's keys are gone, and every
reported-successful update is reflected in the row.

One spawned Spark JVM per pair (~20 s startup each) — the matrix is
10 pairs (6 classic + 4 involving the medallion_lake sink's commit
leg), so this file is the slowest in the suite by design; it buys the
only evidence that the optimistic-concurrency story holds between real
OS processes, not threads.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import threading
import time

import pytest
from pyspark.sql import functions as F

from medallion_data_lake_spark.operators.versioned import (
    CommitConflict,
    _commit_versions,
    commit,
    delete_rows_dv,
    optimize_table,
    read_table,
    update_rows,
)

# key spaces are DISJOINT so each op's effect is independently checkable:
# seed rows 0..99; DV-deletes target 0..2; updates target 50..52;
# appends land at 2000+.
_ATTEMPTS = 3


def _run_op(spark, table: str, op: str, side: int) -> list[dict]:
    out = []
    for i in range(_ATTEMPTS):
        try:
            if op == "append":
                ids = [2000 + side * 500 + i * 10 + j for j in range(5)]
                df = spark.createDataFrame(
                    [(k, f"a{side}_{i}") for k in ids], "id long, tag string"
                )
                entry = commit(df, table, stats_cols=("id",))
                out.append({"op": op, "outcome": "ok", "ids": ids,
                            "version": entry["version"]})
            elif op == "optimize":
                entry = optimize_table(spark, table,
                                       target_file_bytes=1 << 30)
                out.append({"op": op, "outcome": "ok",
                            "version": entry["version"]})
            elif op == "dv_delete":
                r = delete_rows_dv(spark, table, keys={"id": [side * 10 + i]})
                out.append({"op": op, "outcome": "ok" if r else "noop",
                            "key": side * 10 + i,
                            "rows": (r or {}).get("rows_deleted", 0)})
            elif op == "sink":
                # the native format's commit leg racing other writers:
                # same claim loop as commit(), pure-log checks, so the
                # documented outcomes are identical
                import pyarrow as pa
                from pyspark.sql.types import (
                    LongType,
                    StringType,
                    StructField,
                    StructType,
                )

                from medallion_data_lake_spark.sources.lakehouse_source import (  # noqa: E501
                    MedallionLakeStreamWriter,
                )

                ids = [3000 + side * 500 + i * 10 + j for j in range(5)]
                st = StructType([StructField("id", LongType()),
                                 StructField("tag", StringType())])
                w = MedallionLakeStreamWriter(
                    table, st, False, {"txnAppId": f"xproc-{side}"}
                )
                m = w.write(iter([pa.record_batch(
                    {"id": ids, "tag": [f"s{side}_{i}"] * 5}
                )]))
                w.commit([m], i)
                out.append({"op": "append", "outcome": "ok", "ids": ids,
                            "version": -1})
            elif op == "update":
                r = update_rows(
                    spark, table,
                    set_exprs={"tag": f"concat(tag, '_u{side}')"},
                    keys={"id": [50 + i]},
                )
                out.append({"op": op, "outcome": "ok" if r else "noop",
                            "key": 50 + i,
                            "rows": (r or {}).get("rows_updated", 0)})
        except CommitConflict as e:
            out.append({"op": op, "outcome": "conflict", "err": str(e)[:80]})
        except ValueError as e:
            if "deletion vector" in str(e):
                out.append({"op": op, "outcome": "dv_refusal"})
            else:
                raise
    return out


def _worker(table: str, op: str, ready: str, go: str, result: str) -> None:
    """Runs in a SPAWNED process: own Spark JVM, own page cache."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from medallion_data_lake_spark.session import get_spark

    spark = get_spark(
        app_name="xproc-writer", master="local[4]",
        extra_conf={"spark.sql.shuffle.partitions": 4},
    )
    spark.sparkContext.setLogLevel("ERROR")
    open(ready, "w").write("1")
    deadline = time.time() + 120
    while not os.path.exists(go):
        if time.time() > deadline:
            raise TimeoutError("go signal never arrived")
        time.sleep(0.05)
    try:
        out = _run_op(spark, table, op, side=1)
        json.dump({"ok": True, "results": out}, open(result, "w"))
    except Exception as e:  # any undocumented outcome fails the test
        json.dump({"ok": False, "err": repr(e)}, open(result, "w"))
    finally:
        spark.stop()


_PAIRS = [
    ("append", "optimize"),
    ("append", "dv_delete"),
    ("append", "update"),
    ("optimize", "dv_delete"),
    ("optimize", "update"),
    ("dv_delete", "update"),
    # the medallion_lake sink's commit leg vs the classic writers
    ("sink", "append"),
    ("sink", "dv_delete"),
    ("sink", "optimize"),
    ("sink", "update"),
]


@pytest.mark.parametrize("op_main,op_worker", _PAIRS)
def test_semantic_conflict_matrix_cross_process(
    spark, tmp_path, op_main, op_worker
):
    table = str(tmp_path / "vt")
    commit(
        spark.createDataFrame(
            [(i, f"t{i}") for i in range(100)], "id long, tag string"
        ),
        table, stats_cols=("id",),
    )

    ready = str(tmp_path / "ready")
    go = str(tmp_path / "go")
    result = str(tmp_path / "result.json")
    ctx = mp.get_context("spawn")  # no inherited state — a real stranger
    proc = ctx.Process(
        target=_worker, args=(table, op_worker, ready, go, result)
    )
    proc.start()
    deadline = time.time() + 180
    while not os.path.exists(ready):
        assert time.time() < deadline, "worker Spark never came up"
        assert proc.is_alive() or proc.exitcode == 0
        time.sleep(0.1)

    main_results: list[dict] = []
    errs: list[BaseException] = []

    def run_main():
        try:
            main_results.extend(_run_op(spark, table, op_main, side=0))
        except BaseException as e:  # noqa: BLE001 — re-raised below
            errs.append(e)

    t = threading.Thread(target=run_main)
    open(go, "w").write("1")  # fire both sides as close together as files allow
    t.start()
    t.join(timeout=240)
    proc.join(timeout=240)
    assert not t.is_alive() and proc.exitcode == 0
    if errs:
        raise errs[0]
    worker_out = json.load(open(result))
    assert worker_out["ok"], worker_out  # no undocumented outcome
    results = main_results + worker_out["results"]

    # 1. every attempt ended in a documented outcome (encoding enforced
    #    above); the version chain has no gaps and no duplicates
    versions = _commit_versions(table)
    assert versions == list(range(len(versions)))

    # 2. no silent loss: reported-ok appends are present exactly once
    now = read_table(spark, table)
    appended = [i for r in results
                if r["op"] == "append" and r["outcome"] == "ok"
                for i in r["ids"]]
    if appended:
        got = now.filter(F.col("id") >= 2000).groupBy("id").count()
        by_id = {r["id"]: r["count"] for r in got.collect()}
        assert by_id == {i: 1 for i in appended}

    # 3. reported-ok DV-deletes: the key is gone
    deleted = [r["key"] for r in results
               if r["op"] == "dv_delete" and r["outcome"] == "ok"
               and r["rows"] > 0]
    if deleted:
        assert now.filter(F.col("id").isin(deleted)).count() == 0

    # 4. reported-ok updates: the suffix landed (once per success)
    upd = {}
    for r in results:
        if r["op"] == "update" and r["outcome"] == "ok" and r["rows"] > 0:
            upd[r["key"]] = upd.get(r["key"], 0) + 1
    for k, n in upd.items():
        row = now.filter(F.col("id") == k).collect()
        assert len(row) == 1
        assert row[0]["tag"].count("_u") == n, (k, row[0]["tag"], results)

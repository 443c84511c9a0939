"""Log-structured versioned tables: atomicity, time travel, rollback,
vacuum, and the optimistic-concurrency contract."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from medallion_data_lake_spark.operators.versioned import (
    commit,
    history,
    latest_version,
    read_table,
    rollback,
    vacuum,
)


def _df(spark, lo, hi, tag):
    return spark.range(lo, hi).select(
        F.col("id"), F.lit(tag).alias("tag")
    )


def test_append_overwrite_time_travel(spark, tmp_path):
    path = str(tmp_path / "t")
    e0 = commit(_df(spark, 0, 5, "a"), path)                  # v0: 5 rows
    e1 = commit(_df(spark, 5, 8, "b"), path)                  # v1: +3
    e2 = commit(_df(spark, 100, 102, "c"), path, mode="overwrite")  # v2: =2
    assert (e0["version"], e1["version"], e2["version"]) == (0, 1, 2)
    assert latest_version(path) == 2

    assert read_table(spark, path).count() == 2               # latest
    assert read_table(spark, path, version=1).count() == 8    # pre-overwrite
    assert read_table(spark, path, version=0).count() == 5
    # time travel by timestamp: as-of v1's commit time sees v1
    assert read_table(spark, path, as_of_timestamp=e1["timestamp"]).count() == 8
    tags = {r["tag"] for r in read_table(spark, path, version=1).collect()}
    assert tags == {"a", "b"}


def test_readers_never_see_partial_state(spark, tmp_path):
    """Data lands before the log entry: a table with data written but no
    commit published is simply not visible at all."""
    path = str(tmp_path / "t")
    commit(_df(spark, 0, 4, "a"), path)
    # simulate a crashed writer: data directory exists, no log entry
    stray = os.path.join(path, "data", "commit-deadbeef")
    _df(spark, 90, 95, "ghost").write.parquet(stray)
    assert read_table(spark, path).count() == 4  # ghost files invisible
    tags = {r["tag"] for r in read_table(spark, path).collect()}
    assert tags == {"a"}


def test_version_race_loses_loudly_then_retries(spark, tmp_path):
    path = str(tmp_path / "t")
    commit(_df(spark, 0, 3, "a"), path)
    # occupy the next version number to force one lost race
    log = os.path.join(path, "_log")
    with open(os.path.join(log, f"{1:020d}.json"), "x") as fh:
        json.dump({"version": 1, "timestamp": 0.0, "mode": "append",
                   "added": [], "removed": [], "operation": "SQUATTER"}, fh)
    entry = commit(_df(spark, 3, 6, "b"), path)   # must retry past v1
    assert entry["version"] == 2
    assert read_table(spark, path).count() == 6


def test_rollback_is_metadata_only_and_history_survives(spark, tmp_path):
    path = str(tmp_path / "t")
    commit(_df(spark, 0, 6, "good"), path)
    commit(_df(spark, 0, 2, "bad"), path, mode="overwrite")
    entry = rollback(spark, path, to_version=0)
    assert entry["operation"] == "RESTORE(0)"
    assert read_table(spark, path).count() == 6
    assert {r["tag"] for r in read_table(spark, path).collect()} == {"good"}
    # the bad version remains time-travelable (RESTORE, not reset)
    assert read_table(spark, path, version=1).count() == 2
    ops = [h["operation"] for h in history(path)]
    assert ops == ["WRITE", "WRITE", "RESTORE(0)"]


def test_vacuum_deletes_only_unreferenced(spark, tmp_path):
    path = str(tmp_path / "t")
    commit(_df(spark, 0, 4, "a"), path)
    commit(_df(spark, 10, 14, "b"), path, mode="overwrite")
    commit(_df(spark, 20, 24, "c"), path, mode="overwrite")
    doomed = vacuum(path, keep_last=2)
    assert doomed  # v0's files physically gone
    # retained snapshots still read
    assert read_table(spark, path).count() == 4
    assert read_table(spark, path, version=1).count() == 4
    # v0 is no longer materializable
    with pytest.raises(Exception):
        read_table(spark, path, version=0).count()


def test_empty_overwrite_keeps_schema(spark, tmp_path):
    path = str(tmp_path / "t")
    commit(_df(spark, 0, 3, "a"), path)
    empty = _df(spark, 0, 3, "a").filter(F.lit(False))
    commit(empty, path, mode="overwrite")
    out = read_table(spark, path)
    assert out.count() == 0
    assert out.columns == ["id", "tag"]


def test_optimize_compacts_live_set_atomically(spark, tmp_path):
    path = str(tmp_path / "t")
    # many small commits -> fragmented live set
    for i in range(6):
        commit(_df(spark, i * 10, i * 10 + 10, f"b{i}"), path)
    from medallion_data_lake_spark.operators.versioned import optimize_table

    before = read_table(spark, path)
    n_before = before.count()
    stats = optimize_table(spark, path, target_file_bytes=1 << 30)
    assert stats["files_after"] < stats["files_before"]
    after = read_table(spark, path)
    assert after.count() == n_before
    assert (
        after.agg(F.sum("id")).first()[0] == before.agg(F.sum("id")).first()[0]
    )
    # pre-optimize version still resolves to the original files
    assert read_table(spark, path, version=5).count() == n_before
    assert history(path)[-1]["operation"].startswith("OPTIMIZE(")
    # vacuum now reclaims the fragmented files; optimized snapshot survives
    vacuum(path, keep_last=1)
    assert read_table(spark, path).count() == n_before

"""Shallow clone (operators/versioned.py clone_table): a zero-copy
first-class table referencing the source's files in place. Contract:
identical rows with zero bytes copied; full snapshot state rides the
clone's v0 (stats/bloom, DVs, schema, column mapping, constraints);
writes on either side never affect the other; vacuum on the clone can
never delete source bytes; OPTIMIZE on the clone detaches it."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from medallion_data_lake_spark.operators.versioned import (
    clone_table,
    commit,
    delete_rows,
    delete_rows_dv,
    optimize_table,
    read_table,
    rename_column,
    set_table_constraints,
    table_constraints,
    vacuum,
)


def _parquets(path):
    return sorted(glob.glob(os.path.join(path, "**", "*.parquet"),
                            recursive=True))


def _mk(spark, tmp_path):
    src = str(tmp_path / "src")
    commit(
        spark.createDataFrame(
            [(i, f"t{i}", float(i)) for i in range(10)],
            "id long, tag string, score double",
        ),
        src, stats_cols=("id",), bloom_cols=("id",),
    )
    return src


def test_clone_is_zero_copy_and_equal(spark, tmp_path):
    src = _mk(spark, tmp_path)
    dst = str(tmp_path / "dst")
    entry = clone_table(spark, src, dst)
    assert entry["version"] == 0 and entry["clone_of"]["version"] == 0
    assert _parquets(dst) == []  # zero bytes copied
    assert (
        {tuple(r) for r in read_table(spark, dst).collect()}
        == {tuple(r) for r in read_table(spark, src).collect()}
    )
    # stats/bloom rode along (translated keys point at real files)
    for f, s in entry["file_stats"].items():
        assert os.path.exists(os.path.join(dst, f)) and "id" in s


def test_divergence_is_two_way_isolated(spark, tmp_path):
    src = _mk(spark, tmp_path)
    dst = str(tmp_path / "dst")
    clone_table(spark, src, dst)
    commit(spark.createDataFrame([(100, "c", 1.0)],
                                 "id long, tag string, score double"), dst)
    delete_rows(spark, dst, predicates={"id": (0, 4)})
    commit(spark.createDataFrame([(200, "s", 2.0)],
                                 "id long, tag string, score double"), src)
    assert {r["id"] for r in read_table(spark, src).collect()} \
        == set(range(10)) | {200}
    assert {r["id"] for r in read_table(spark, dst).collect()} \
        == set(range(5, 10)) | {100}


def test_clone_carries_dvs_and_historical_version(spark, tmp_path):
    src = _mk(spark, tmp_path)
    delete_rows_dv(spark, src, keys={"id": [3, 4]})        # v1 (DV)
    commit(spark.createDataFrame([(50, "x", 5.0)],
                                 "id long, tag string, score double"), src)

    dst_now = str(tmp_path / "dnow")
    clone_table(spark, src, dst_now)
    assert {r["id"] for r in read_table(spark, dst_now).collect()} \
        == (set(range(10)) - {3, 4}) | {50}

    dst_v0 = str(tmp_path / "dv0")
    clone_table(spark, src, dst_v0, version=0)  # pre-delete snapshot
    assert {r["id"] for r in read_table(spark, dst_v0).collect()} \
        == set(range(10))


def test_clone_vacuum_never_deletes_source_bytes(spark, tmp_path):
    src = _mk(spark, tmp_path)
    dst = str(tmp_path / "dst")
    clone_table(spark, src, dst)
    # clone drops every inherited file, then vacuums aggressively
    commit(spark.createDataFrame([(99, "o", 9.0)],
                                 "id long, tag string, score double"),
           dst, mode="overwrite")
    doomed = vacuum(dst, keep_last=1, dry_run=True)
    assert doomed == []  # foreign files are not candidates
    vacuum(dst, keep_last=1)
    # the source is byte-for-byte intact and readable
    assert read_table(spark, src).count() == 10


def test_optimize_detaches_clone_from_source(spark, tmp_path):
    src = _mk(spark, tmp_path)
    dst = str(tmp_path / "dst")
    clone_table(spark, src, dst)
    optimize_table(spark, dst, target_file_bytes=1 << 30)
    assert len(_parquets(dst)) > 0  # bytes localized
    # now the source's files can disappear without hurting the clone
    rows = {r["id"] for r in read_table(spark, dst).collect()}
    import shutil

    shutil.rmtree(src)
    assert {r["id"] for r in read_table(spark, dst).collect()} == rows


def test_clone_carries_mapping_and_constraints(spark, tmp_path):
    src = _mk(spark, tmp_path)
    rename_column(spark, src, "score", "rating")
    set_table_constraints(
        src, [{"kind": "not_null", "col": "tag", "name": "tag_nn"}]
    )
    dst = str(tmp_path / "dst")
    clone_table(spark, src, dst)
    assert "rating" in read_table(spark, dst).columns
    assert table_constraints(dst) == table_constraints(src)
    # the contract is live on the clone
    from medallion_data_lake_spark.operators.versioned import (
        ConstraintViolation,
    )

    with pytest.raises(ConstraintViolation):
        commit(spark.createDataFrame([(1, None, 0.0)],
                                     "id long, tag string, rating double"),
               dst)


def test_clone_refuses_existing_destination(spark, tmp_path):
    src = _mk(spark, tmp_path)
    dst = str(tmp_path / "dst")
    clone_table(spark, src, dst)
    with pytest.raises(ValueError, match="already exists"):
        clone_table(spark, src, dst)


def test_clone_of_clone(spark, tmp_path):
    src = _mk(spark, tmp_path)
    d1 = str(tmp_path / "d1")
    d2 = str(tmp_path / "d2")
    clone_table(spark, src, d1)
    clone_table(spark, d1, d2)
    assert _parquets(d2) == []
    assert read_table(spark, d2).count() == 10


def test_clone_refuses_out_of_range_versions(spark, tmp_path):
    from medallion_data_lake_spark.operators.versioned import expire_log

    src = _mk(spark, tmp_path)
    commit(spark.createDataFrame([(50, "x", 5.0)],
                                 "id long, tag string, score double"), src)
    with pytest.raises(ValueError, match="out of range"):
        clone_table(spark, src, str(tmp_path / "d1"), version=999)
    commit(spark.createDataFrame([(51, "y", 5.0)],
                                 "id long, tag string, score double"), src)
    expire_log(src, keep_last=1)
    with pytest.raises(ValueError, match="out of range"):
        clone_table(spark, src, str(tmp_path / "d2"), version=0)


def test_clone_creation_race_refuses_not_merges(spark, tmp_path):
    """A racer creating the destination between the existence check and
    the claim must make the clone REFUSE — publishing at v1 would
    silently merge two unrelated tables (r8 second-pass review
    finding)."""
    import json as _json

    from medallion_data_lake_spark.operators import logstore

    src = _mk(spark, tmp_path)
    dst = str(tmp_path / "dst")
    inner = logstore.get_log_store()

    class OneRace(logstore.LogStore):
        fired = False

        def list(self, d):
            return inner.list(d)

        def read(self, f):
            return inner.read(f)

        def ensure_dir(self, d):
            inner.ensure_dir(d)

        def delete(self, f):
            inner.delete(f)

        def put_exclusive(self, f, text):
            if not OneRace.fired and '"CLONE(' in text:
                OneRace.fired = True
                mine = _json.loads(text)
                inner.put_exclusive(f, _json.dumps({
                    "version": mine["version"], "timestamp": 0.0,
                    "mode": "append",
                    "added": ["data/commit-racer/r.parquet"],
                    "removed": [],
                    "operation": "APPEND(racer)",
                }))
                raise FileExistsError(f)
            inner.put_exclusive(f, text)

    prev = logstore.set_log_store(OneRace())
    try:
        with pytest.raises(ValueError, match="already exists"):
            clone_table(spark, src, dst)
    finally:
        logstore.set_log_store(prev)
    assert OneRace.fired

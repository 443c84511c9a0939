"""Cross-table savepoints (operators/savepoint.py): one receipt pins
every table's version; reads replay that world after arbitrary later
writes; verify reports retention liveness per member."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from medallion_data_lake_spark.operators.savepoint import (
    create_savepoint,
    load_savepoint,
    read_savepoint,
    verify_savepoint,
)
from medallion_data_lake_spark.operators.versioned import (
    commit,
    delete_rows,
    expire_log,
)


def _mk(spark, tmp_path, name, ids):
    path = str(tmp_path / name)
    commit(
        spark.createDataFrame([(i, f"{name}{i}") for i in ids],
                              "id long, tag string"),
        path,
    )
    return path


def test_savepoint_replays_the_captured_world(spark, tmp_path):
    corpus = _mk(spark, tmp_path, "corpus", range(5))
    bench = _mk(spark, tmp_path, "bench", range(3))
    receipt = str(tmp_path / "run1.savepoint.json")
    sp = create_savepoint({"corpus": corpus, "bench": bench}, receipt)
    assert sp["tables"]["corpus"]["version"] == 0

    # the world moves on
    commit(spark.createDataFrame([(99, "late")], "id long, tag string"),
           corpus)
    delete_rows(spark, bench, predicates={"id": (0, 0)})

    # ...but the savepoint replays exactly what the run saw, from disk
    got = {r["id"] for r in read_savepoint(spark, receipt, "corpus").collect()}
    assert got == set(range(5))
    got = {r["id"] for r in read_savepoint(spark, receipt, "bench").collect()}
    assert got == set(range(3))

    v = verify_savepoint(receipt)
    assert v["corpus"] == {"ok": True, "version": 0, "latest": 1}
    assert v["bench"]["ok"] is True


def test_verify_reports_expired_members(spark, tmp_path):
    t = _mk(spark, tmp_path, "t", range(3))
    receipt = str(tmp_path / "sp.json")
    create_savepoint({"t": t}, receipt)
    commit(spark.createDataFrame([(9, "x")], "id long, tag string"), t)
    commit(spark.createDataFrame([(10, "y")], "id long, tag string"), t)
    expire_log(t, keep_last=1)
    v = verify_savepoint(receipt)
    assert v["t"]["ok"] is False and "expired" in v["t"]["reason"]
    # and the read fails loudly, matching the verdict
    with pytest.raises(ValueError, match="expired"):
        read_savepoint(spark, receipt, "t").collect()


def test_savepoint_refuses_unversioned_member(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        create_savepoint({"nope": str(tmp_path / "missing")})


def test_savepoint_roundtrip_dict_or_file(spark, tmp_path):
    t = _mk(spark, tmp_path, "t", range(2))
    receipt = str(tmp_path / "sp.json")
    sp = create_savepoint({"t": t}, receipt)
    assert load_savepoint(receipt)["tables"] == sp["tables"]
    # dict form works without any file
    assert read_savepoint(spark, sp, "t").count() == 2

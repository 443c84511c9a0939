"""Stats-at-write on the versioned table: snapshot ANALYZE without rescans.

Contract (operators/versioned.py:analyze_table + operators/stats.py
per-file partials): every commit records mergeable per-file stats for its
own files; ANALYZE of ANY retained snapshot is then a KB-scale merge of
the live files' partials — counts/extrema exact, NDV via HLL union —
with no data file opened. Checked against a direct full-scan ANALYZE of
the same snapshot.
"""

from __future__ import annotations

import os

import pytest

from medallion_data_lake_spark.operators.stats import collect_column_stats
from medallion_data_lake_spark.operators.versioned import (
    analyze_table,
    commit,
    merge_into,
    read_table,
    vacuum,
)


def _batch(spark, lo, hi, tag):
    return spark.createDataFrame(
        [(i, float(i) * 1.5, f"{tag}{i}") for i in range(lo, hi)],
        "id long, score double, name string",
    )


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "vt")
    commit(_batch(spark, 0, 50, "a"), path, stats_cols=("id",), analyze_stats=True)
    commit(_batch(spark, 50, 120, "b"), path, stats_cols=("id",), analyze_stats=True)
    return path


def _vector(stats_df):
    return {
        r["column"]: (r["n_rows"], r["n_nulls"], r["min"], r["max"])
        for r in stats_df.collect()
    }


def test_analyze_matches_full_scan(spark, table):
    got, report = analyze_table(spark, table)
    assert report["files_missing"] == 0
    direct = collect_column_stats(read_table(spark, table))
    gv, dv = _vector(got), _vector(direct)
    assert set(gv) == {"id", "score", "name"}
    for c in gv:
        assert gv[c][:2] == dv[c][:2], c          # counts exact
        assert gv[c][2:] == dv[c][2:], c          # typed extrema exact
    # NDV is HLL-approx on both paths; 120 distinct ids ±5%
    ndv = {r["column"]: r["ndv"] for r in got.collect()}
    assert abs(ndv["id"] - 120) <= 6


def test_analyze_time_travel_and_after_merge(spark, table):
    # snapshot v0 = first 50 rows only
    got0, rep0 = analyze_table(spark, table, version=0)
    v0 = _vector(got0)
    assert v0["id"] == (50, 0, "0", "49")
    assert rep0["files_missing"] == 0

    # a MERGE rewrites overlapping files; analyze of the NEW snapshot
    # reflects the upsert (id 200 added), and v0's stays unchanged
    merge_into(
        spark, table,
        spark.createDataFrame(
            [(0, 999.0, "patched"), (200, 1.0, "new")],
            "id long, score double, name string",
        ),
        key="id",
        analyze_stats=True,
    )
    got2, rep2 = analyze_table(spark, table)
    v2 = _vector(got2)
    assert rep2["files_missing"] == 0
    assert v2["id"] == (121, 0, "0", "200")
    assert v2["score"][3] == "999.0"
    assert _vector(analyze_table(spark, table, version=0)[0])["id"] == (
        50, 0, "0", "49")


def test_uncovered_files_are_reported_not_invented(spark, table):
    commit(_batch(spark, 200, 210, "c"), table)  # no analyze_stats
    got, report = analyze_table(spark, table)
    assert report["files_missing"] >= 1
    # the vector covers only the covered files — counts must NOT include
    # the uncovered commit's 10 rows
    assert _vector(got)["id"][0] == 120


def test_vacuum_reclaims_dead_partials(spark, table):
    commit(
        _batch(spark, 0, 10, "z"), table, mode="overwrite",
        analyze_stats=True,
    )
    stats_root = os.path.join(table, "_stats")
    assert len(os.listdir(stats_root)) == 3
    vacuum(table, keep_last=1)
    # only the overwrite's own commit dir keeps partials
    assert len(os.listdir(stats_root)) == 1
    got, report = analyze_table(spark, table)
    assert report["files_missing"] == 0
    assert _vector(got)["id"] == (10, 0, "0", "9")


# ---------------------------------------------------------------------------
# Schema enforcement + evolution on append (commit contract)
# ---------------------------------------------------------------------------


def test_append_schema_drift_is_refused(spark, tmp_path):
    from medallion_data_lake_spark.operators.evolution import SchemaDriftError

    path = str(tmp_path / "vt")
    commit(spark.createDataFrame([(1, "a")], "id long, tag string"), path)
    # silent column loss is the failure mode being prevented here
    with pytest.raises(SchemaDriftError):
        commit(
            spark.createDataFrame([(2, "b", 1.5)],
                                  "id long, tag string, score double"),
            path,
        )
    # type change for an existing column: refused even with evolution on
    with pytest.raises(SchemaDriftError):
        commit(
            spark.createDataFrame([("2", "b")], "id string, tag string"),
            path, allow_schema_evolution=True,
        )


def test_additive_evolution_reads_merged(spark, tmp_path):
    path = str(tmp_path / "vt")
    commit(spark.createDataFrame([(1, "a")], "id long, tag string"), path)
    commit(
        spark.createDataFrame([(2, "b", 1.5)],
                              "id long, tag string, score double"),
        path, allow_schema_evolution=True,
    )
    got = read_table(spark, path)
    assert set(got.columns) == {"id", "tag", "score"}  # nothing dropped
    rows = {r["id"]: (r["tag"], r["score"]) for r in got.collect()}
    assert rows == {1: ("a", None), 2: ("b", 1.5)}
    # pre-evolution snapshot keeps its own (narrower) schema
    assert set(read_table(spark, path, version=0).columns) == {"id", "tag"}
    # a later batch that OMITS the evolved column is additive drift too
    commit(
        spark.createDataFrame([(3, "c")], "id long, tag string"),
        path, allow_schema_evolution=True,
    )
    rows = {r["id"]: r["score"] for r in read_table(spark, path).collect()}
    assert rows == {1: None, 2: 1.5, 3: None}
    # overwrite resets to a single schema; reads drop mergeSchema again
    commit(spark.createDataFrame([(9, 2)], "id long, n long"), path,
           mode="overwrite")
    assert set(read_table(spark, path).columns) == {"id", "n"}


def test_merge_and_optimize_respect_evolved_schema(spark, tmp_path):
    """MERGE on an evolved table rewrites with the UNION schema (no
    silent column loss regardless of which file is first); OPTIMIZE
    doubles as schema compaction."""
    from medallion_data_lake_spark.operators.versioned import optimize_table

    path = str(tmp_path / "vt")
    commit(spark.createDataFrame([(1, "a")], "id long, tag string"), path,
           stats_cols=("id",))
    commit(
        spark.createDataFrame([(2, "b", 1.5)],
                              "id long, tag string, score double"),
        path, allow_schema_evolution=True, stats_cols=("id",),
    )
    # source must carry the union schema — a narrow source is refused
    with pytest.raises(ValueError, match="UNION schema"):
        merge_into(
            spark, path,
            spark.createDataFrame([(1, "patched")], "id long, tag string"),
            key="id",
        )
    merge_into(
        spark, path,
        spark.createDataFrame([(1, "patched", None)],
                              "id long, tag string, score double"),
        key="id",
    )
    rows = {r["id"]: (r["tag"], r["score"])
            for r in read_table(spark, path).collect()}
    assert rows == {1: ("patched", None), 2: ("b", 1.5)}

    out = optimize_table(spark, path, target_file_bytes=1 << 30)
    assert out["files_after"] >= 1
    rows = {r["id"]: (r["tag"], r["score"])
            for r in read_table(spark, path).collect()}
    assert rows == {1: ("patched", None), 2: ("b", 1.5)}


# ---------------------------------------------------------------------------
# Table constraints (Delta NOT NULL / CHECK) enforced at commit/merge
# ---------------------------------------------------------------------------


def test_table_constraints_gate_commit_and_merge(spark, tmp_path):
    from medallion_data_lake_spark.operators.versioned import (
        ConstraintViolation,
        set_table_constraints,
        table_constraints,
    )

    path = str(tmp_path / "vt")
    set_table_constraints(path, [
        {"kind": "not_null", "col": "tag"},
        {"kind": "in_range", "col": "id", "lo": 0, "hi": 10_000},
        {"kind": "check", "name": "tag_not_empty", "sql": "length(tag) > 0"},
    ])
    assert len(table_constraints(path)) == 3

    commit(spark.createDataFrame([(1, "a")], "id long, tag string"), path,
           stats_cols=("id",))
    # violating batch: refused with per-check counts, nothing lands
    with pytest.raises(ConstraintViolation, match="not_null_tag"):
        commit(spark.createDataFrame([(2, None), (3, "c")],
                                     "id long, tag string"), path)
    assert read_table(spark, path).count() == 1
    with pytest.raises(ConstraintViolation, match="range_id"):
        commit(spark.createDataFrame([(99_999, "z")], "id long, tag string"),
               path)

    # MERGE upserts face the same contract; delete markers are exempt
    with pytest.raises(ConstraintViolation):
        merge_into(
            spark, path,
            spark.createDataFrame([(1, "")], "id long, tag string"),
            key="id",
        )
    merge_into(
        spark, path,
        spark.createDataFrame([(1, None, True)],
                              "id long, tag string, is_del boolean"),
        key="id", delete_col="is_del",
    )
    assert read_table(spark, path).count() == 0

    # a bad spec fails at declaration time, not at first commit
    with pytest.raises(ValueError):
        set_table_constraints(path, [{"kind": "nope", "col": "x"}])


def test_analyze_feeds_stats_aware_join_planner(spark, table):
    """The integration the stats pair exists for: a versioned table's
    rescan-free ANALYZE vector drops straight into the join planner
    (profile_from_stats consumes analyze_table's output schema)."""
    from medallion_data_lake_spark.operators.stats import (
        choose_join_strategy,
        profile_from_stats,
    )

    stats, report = analyze_table(spark, table)
    assert report["files_missing"] == 0
    profile = profile_from_stats(stats, "id")
    assert profile.n_rows == 120 and profile.key_ndv > 100
    # both sides tiny -> the planner calls broadcast
    assert choose_join_strategy(profile, profile).startswith("broadcast")


def test_vacuum_dry_run_is_side_effect_free(spark, tmp_path):
    from medallion_data_lake_spark.operators.versioned import vacuum

    path = str(tmp_path / "vt")
    commit(_batch(spark, 0, 10, "a"), path)
    commit(_batch(spark, 0, 10, "b"), path, mode="overwrite")
    doomed = vacuum(path, keep_last=1, dry_run=True)
    assert doomed  # v0's files are reclaimable
    # nothing was touched: the old snapshot still reads
    assert read_table(spark, path, version=0).count() == 10
    assert vacuum(path, keep_last=1) == doomed  # the real run deletes them
    with pytest.raises(Exception):
        read_table(spark, path, version=0).count()

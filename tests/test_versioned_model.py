"""Model-based property test for the versioned-table core.

Hypothesis drives random operation sequences (append / merge / delete /
overwrite / optimize) against BOTH the real table and a plain Python
dict model; after every sequence the table snapshot must equal the
model, every historical version must equal its recorded model state,
and replaying the change feed from zero must reconstruct the final
snapshot. This is the strongest correctness artifact the log format
has: not hand-picked scenarios, but arbitrary interleavings.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from medallion_data_lake_spark.operators.versioned import (
    commit,
    delete_rows,
    merge_into,
    optimize_table,
    read_table,
    table_changes,
    update_rows,
)

# op alphabet: (kind, key-subset seed, tag seed)
_ops = st.lists(
    st.tuples(
        st.sampled_from(["append", "merge", "delete", "overwrite", "optimize",
                         "update"]),
        st.integers(min_value=0, max_value=9),
        st.integers(min_value=0, max_value=99),
    ),
    min_size=1,
    max_size=6,
)


def _rows_for(seed_k: int, seed_t: int, fresh_base: int):
    """2-3 deterministic (id, tag) rows derived from the seeds."""
    ids = sorted({seed_k, seed_k + 3, fresh_base + seed_k})
    return [(i, f"t{seed_t}_{i}") for i in ids]


@settings(
    max_examples=6, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture,
                           HealthCheck.too_slow],
)
@given(ops=_ops)
def test_versioned_table_matches_reference_model(spark, tmp_path_factory, ops):
    path = str(tmp_path_factory.mktemp("model") / "vt")
    model: dict[int, str] = {}
    snapshots: list[dict[int, str]] = []  # model state per version
    fresh = 100  # id offset so appends also add never-seen keys

    def apply_real(kind, seed_k, seed_t):
        nonlocal fresh
        rows = _rows_for(seed_k, seed_t, fresh)
        df = spark.createDataFrame(rows, "id long, tag string")
        if kind == "append":
            # append must not duplicate keys the table already holds —
            # route through merge when any key exists (the model is a
            # keyed dict; a keyed table is the realistic shape)
            if model and any(i in model for i, _ in rows):
                kind = "merge"
            else:
                commit(df, path, stats_cols=("id",))
                model.update(dict(rows))
                snapshots.append(dict(model))
                fresh += 100
                return
        if kind == "merge":
            if not model:
                commit(df, path, stats_cols=("id",))
            else:
                merge_into(spark, path, df, key="id")
            model.update(dict(rows))
            snapshots.append(dict(model))
            fresh += 100
        elif kind == "delete":
            if not model:
                return
            lo = seed_k
            hi = seed_k + 4
            doomed = [i for i in model if lo <= i <= hi]
            out = delete_rows(spark, path, predicates={"id": (lo, hi)})
            if doomed:
                assert out is not None and out["rows_deleted"] == len(doomed)
                for i in doomed:
                    del model[i]
                snapshots.append(dict(model))
            else:
                assert out is None
        elif kind == "overwrite":
            commit(df, path, mode="overwrite", stats_cols=("id",))
            model.clear()
            model.update(dict(rows))
            snapshots.append(dict(model))
            fresh += 100
        elif kind == "update":
            if not model:
                return
            lo, hi = seed_k, seed_k + 4
            hit = [i for i in model if lo <= i <= hi]
            out = update_rows(
                spark, path,
                set_exprs={"tag": f"concat(tag, '_u{seed_t}')"},
                predicates={"id": (lo, hi)},
            )
            if hit:
                assert out is not None and out["rows_updated"] == len(hit)
                for i in hit:
                    model[i] = f"{model[i]}_u{seed_t}"
                snapshots.append(dict(model))
            else:
                assert out is None
        elif kind == "optimize":
            if not model:
                return
            optimize_table(spark, path, target_file_bytes=1 << 30)
            snapshots.append(dict(model))  # logical no-op, new version

    for kind, seed_k, seed_t in ops:
        apply_real(kind, seed_k, seed_t)

    if not snapshots:
        return  # sequence was all no-ops on an empty table

    def as_dict(df):
        return {r["id"]: r["tag"] for r in df.collect()}

    # 1. current snapshot == model
    assert as_dict(read_table(spark, path)) == model
    # 2. every historical version == its recorded model state
    for v, state in enumerate(snapshots):
        assert as_dict(read_table(spark, path, version=v)) == state, v
    # 3. change-feed replay from zero reconstructs the final snapshot
    feed = table_changes(spark, path, 0)
    plus = feed.filter(
        F.col("_change_type").isin("insert", "update_postimage"))
    minus = feed.filter(
        F.col("_change_type").isin("delete", "update_preimage"))
    rebuilt = plus.select("id", "tag").exceptAll(minus.select("id", "tag"))
    now = read_table(spark, path).select("id", "tag")
    assert rebuilt.exceptAll(now).count() == 0
    assert now.exceptAll(rebuilt).count() == 0

"""Declarative data-quality expectations over any DataFrame.

The medallion cleaning rules (``operators/cleaning.py``) FIX records;
expectations JUDGE them: a contract of named checks evaluated against a
batch, yielding per-check pass/violation metrics, an overall gate, and
a pass/quarantine row split — the dbt-tests / Delta Live Tables
``expect_or_drop`` pattern, engine-side.

Scale shape: all row-level checks compile to ONE boolean column each and
are measured in ONE aggregation pass (map-side partial counts, no
shuffle of data rows); the split reuses the same predicates, so a full
expectations run costs two scans of the batch (one if you only want
metrics), independent of how many checks the contract holds. The only
check that shuffles is ``unique`` (a groupBy on the key — unavoidable:
uniqueness is a global property); ``foreign_key`` broadcasts the
reference side's distinct keys.

Row-level checks (compose freely):
    not_null(col), in_range(col, lo, hi), in_set(col, values),
    matches(col, regex), custom(name, Column)
Dataset-level checks:
    unique(cols), foreign_key(col, ref_df, ref_col)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    name: str
    # row-level: Column predicate, True = row passes.
    predicate: Column | None = None
    # dataset-level: df -> violation count (can shuffle; documented).
    dataset_check: Callable[[DataFrame], int] | None = None


def not_null(col: str) -> Expectation:
    return Expectation(f"not_null_{col}", F.col(col).isNotNull())


def in_range(col: str, lo, hi) -> Expectation:
    # NULL fails closed: an absent value cannot attest to being in range
    return Expectation(
        f"in_range_{col}",
        F.col(col).isNotNull() & F.col(col).between(F.lit(lo), F.lit(hi)),
    )


def in_set(col: str, values) -> Expectation:
    return Expectation(
        f"in_set_{col}",
        F.col(col).isNotNull() & F.col(col).isin(*list(values)),
    )


def matches(col: str, regex: str) -> Expectation:
    return Expectation(
        f"matches_{col}",
        F.col(col).isNotNull() & F.col(col).rlike(regex),
    )


def custom(name: str, predicate: Column) -> Expectation:
    return Expectation(name, predicate)


def unique(*cols: str) -> Expectation:
    """Global uniqueness of a key — the one check that must shuffle
    (groupBy on the key; partial counts keep it one exchange)."""

    def check(df: DataFrame) -> int:
        dup_groups = (
            df.groupBy(*cols).count().filter(F.col("count") > 1)
        )
        row = dup_groups.agg(
            F.coalesce(F.sum(F.col("count") - 1), F.lit(0)).alias("extra")
        ).first()
        return int(row["extra"])

    return Expectation(f"unique_{'_'.join(cols)}", dataset_check=check)


def foreign_key(col: str, ref: DataFrame, ref_col: str) -> Expectation:
    """Referential integrity: every non-null value exists in the
    reference. Anti-join against the DISTINCT reference keys (dim-sized
    by construction) — broadcast, no fact shuffle."""

    def check(df: DataFrame) -> int:
        keys = ref.select(F.col(ref_col).alias(col)).distinct()
        return (
            df.filter(F.col(col).isNotNull())
            .join(F.broadcast(keys), col, "left_anti")
            .count()
        )

    return Expectation(f"fk_{col}", dataset_check=check)


def run_expectations(
    df: DataFrame, expectations: list[Expectation]
) -> dict:
    """Evaluate the contract; returns
    ``{"n_rows", "passed" (gate), "checks": {name: violations}}``.

    All row-level checks ride one aggregation (a count per predicate —
    partial-aggregated, zero data shuffle); dataset-level checks run
    their own bounded jobs.
    """
    row_level = [e for e in expectations if e.predicate is not None]
    # coalesce(pred, False): a NULL predicate result fails CLOSED — a
    # three-valued ~NULL would otherwise vanish from the sum and a null
    # row would silently count as passing
    # outer coalesce: SUM over an EMPTY batch is NULL, and an empty
    # batch violates nothing
    aggs = [F.count(F.lit(1)).alias("_n")] + [
        F.coalesce(
            F.sum((~F.coalesce(e.predicate, F.lit(False))).cast("long")),
            F.lit(0),
        ).alias(e.name)
        for e in row_level
    ]
    row = df.agg(*aggs).first()
    checks = {e.name: int(row[e.name]) for e in row_level}
    for e in expectations:
        if e.dataset_check is not None:
            checks[e.name] = int(e.dataset_check(df))
    return {
        "n_rows": int(row["_n"]),
        "passed": all(v == 0 for v in checks.values()),
        "checks": checks,
    }


def split_by_expectations(
    df: DataFrame, expectations: list[Expectation]
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine) split on the ROW-LEVEL checks; quarantine
    rows carry ``_failed_expectations`` naming every violated check.

    Dataset-level checks don't identify rows (a duplicate pair is
    symmetric; FK misses do, but belong to the metrics pass) — they
    gate the batch via ``run_expectations``, not the split.
    """
    row_level = [e for e in expectations if e.predicate is not None]
    failed = F.array_compact(
        F.array(
            *[
                F.when(~F.coalesce(e.predicate, F.lit(False)), F.lit(e.name))
                for e in row_level
            ]
        )
    )
    tagged = df.withColumn("_failed_expectations", failed)
    clean = tagged.filter(F.size("_failed_expectations") == 0).drop(
        "_failed_expectations"
    )
    quarantine = tagged.filter(F.size("_failed_expectations") > 0)
    return clean, quarantine

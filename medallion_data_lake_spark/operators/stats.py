"""ANALYZE-style table statistics and a stats-driven join planner.

Catalyst's cost-based decisions (auto-broadcast, AQE skew splits) see
only what the session knows: file sizes at planning time, runtime map
output sizes under AQE. A lakehouse additionally wants PERSISTED table
stats — computed once after a write, consulted by every later job —
because plan-time file size is a poor proxy (a 10 GB parquet dim can be
a 300 MB broadcast after projection, or a 100 GB explode after one).

``collect_column_stats`` is one full-scan aggregation producing the
classic ANALYZE vector per column: count / nulls / NDV (HLL-approx) /
min / max / avg width. ``choose_join_strategy`` turns two stats rows
into a join plan the way an optimizer's cost model does — broadcast
under the threshold, salted when key skew is provable from stats
(rows/NDV ratio), plain shuffle otherwise. ``stats_aware_join`` applies
the choice with the repo's existing levers (``F.broadcast``,
``functions.salted_join``).

At 100 TB: the stats scan is one pass over the table (columnar, no
shuffle — partial aggregates merge map-side) and is amortized over
every subsequent query; this is exactly Spark's own
``ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS`` but as a DataFrame
operator that works on bare paths (no metastore required) and persists
to a parquet stats table the planner helpers read back.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Spark's own spark.sql.autoBroadcastJoinThreshold default.
BROADCAST_BYTES_DEFAULT = 10 * 1024 * 1024
# rows/NDV beyond this marks a provably hot key distribution; matches
# the spirit of AQE's skewedPartitionFactor (median-multiple) test.
SKEW_RATIO_DEFAULT = 64.0


def collect_column_stats(
    df: DataFrame,
    columns: tuple[str, ...] | None = None,
    rsd: float = 0.05,
) -> DataFrame:
    """One-pass ANALYZE: per-column count/nulls/NDV/min/max/avg width.

    Single wide aggregation — every statistic is a partial-aggregatable
    expression, so the whole vector costs one scan with map-side
    combine, no shuffle of data rows (only the 1-row partials). NDV is
    HyperLogLog++ (``approx_count_distinct``, rsd 5%) — the same sketch
    ANALYZE uses; exact NDV would force a shuffle per column.

    Returns one row per column: (column, n_rows, n_nulls, ndv, min, max,
    avg_len) with min/max aggregated in the column's NATIVE type and only
    then rendered as strings (schema-stable across heterogeneous column
    types). Aggregating over string-cast values would take lexicographic
    extremes — wrong for numerics ({2,9,10} would report min='10',
    max='9').
    """
    cols = list(columns) if columns is not None else list(df.columns)
    aggs: list[Column] = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        col = F.col(c)
        aggs += [
            F.sum(col.isNull().cast("long")).alias(f"{c}__nulls"),
            F.approx_count_distinct(c, rsd).alias(f"{c}__ndv"),
            F.min(col).cast("string").alias(f"{c}__min"),
            F.max(col).cast("string").alias(f"{c}__max"),
            F.avg(F.length(col.cast("string"))).alias(f"{c}__len"),
        ]
    wide = df.agg(*aggs)
    arms = []
    for c in cols:
        arms.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").alias("n_rows"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__ndv").alias("ndv"),
                F.col(f"{c}__min").alias("min"),
                F.col(f"{c}__max").alias("max"),
                F.round(F.col(f"{c}__len"), 2).alias("avg_len"),
            )
        )
    return wide.select(F.explode(F.array(*arms)).alias("s")).select("s.*")


def write_stats(stats: DataFrame, path: str, table: str) -> None:
    """Persist a stats vector under the stats table path, tagged by
    table name + collection time — the read side takes the latest."""
    (
        stats.withColumn("table", F.lit(table))
        .withColumn("collected_at", F.current_timestamp())
        .write.mode("append")
        .parquet(path)
    )


def read_latest_stats(spark: SparkSession, path: str, table: str) -> DataFrame:
    """Latest stats vector for a table (newest collected_at wins)."""
    from pyspark.sql import Window

    all_stats = spark.read.parquet(path).filter(F.col("table") == table)
    w = Window.partitionBy("column").orderBy(F.desc("collected_at"))
    return (
        all_stats.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .drop("_r")
    )


@dataclass(frozen=True)
class TableProfile:
    """What the join planner needs about one side, derived from stats."""

    n_rows: int
    est_bytes: int  # n_rows x sum(avg_len) — in-plan width, not on-disk
    key_ndv: int
    key_skew_ratio: float  # n_rows / key_ndv (avg rows per key)


def profile_from_stats(stats: DataFrame, key: str) -> TableProfile:
    """Collapse a stats vector (small: one row per column) to a profile."""
    rows = stats.collect()
    by_col = {r["column"]: r for r in rows}
    if key not in by_col:
        raise ValueError(f"no stats row for join key {key!r}")
    n = int(by_col[key]["n_rows"])
    width = sum(float(r["avg_len"] or 0.0) for r in rows)
    ndv = max(int(by_col[key]["ndv"]), 1)
    return TableProfile(
        n_rows=n,
        est_bytes=int(n * width),
        key_ndv=ndv,
        key_skew_ratio=n / ndv,
    )


def choose_join_strategy(
    left: TableProfile,
    right: TableProfile,
    broadcast_bytes: int = BROADCAST_BYTES_DEFAULT,
    skew_ratio: float = SKEW_RATIO_DEFAULT,
) -> str:
    """The cost-model decision, smallest-hammer first:

    - ``broadcast_right``/``broadcast_left``: either side's estimated
      in-plan size fits the broadcast budget — no shuffle at all.
      Estimated size uses row width AFTER projection, which is the
      number plan-time file size gets wrong.
    - ``salted``: both sides big AND the bigger side's key distribution
      is provably hot (avg rows per key over ``skew_ratio``) while the
      other side stays replicable. A hot key would stall one reducer
      for the whole stage; salting fans it out deterministically.
    - ``shuffle``: the default sort-merge/shuffled-hash path; AQE still
      splits residual skew at runtime.
    """
    if right.est_bytes <= broadcast_bytes:
        return "broadcast_right"
    if left.est_bytes <= broadcast_bytes:
        return "broadcast_left"
    big, small = (left, right) if left.n_rows >= right.n_rows else (right, left)
    if big.key_skew_ratio >= skew_ratio and small.est_bytes <= broadcast_bytes * 8:
        return "salted"
    return "shuffle"


def stats_aware_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_stats: DataFrame,
    right_stats: DataFrame,
    how: str = "inner",
    broadcast_bytes: int = BROADCAST_BYTES_DEFAULT,
    skew_ratio: float = SKEW_RATIO_DEFAULT,
) -> tuple[DataFrame, str]:
    """Join with the strategy the stats call for; returns (df, strategy)
    so callers/tests can audit the decision."""
    from ..functions import salted_join

    lp = profile_from_stats(left_stats, key)
    rp = profile_from_stats(right_stats, key)
    strategy = choose_join_strategy(lp, rp, broadcast_bytes, skew_ratio)
    if strategy == "salted" and how != "inner":
        # Salting swaps which side is exploded; under outer joins that
        # changes semantics, and AQE's runtime skew split handles those.
        strategy = "shuffle"
    if strategy == "broadcast_right":
        out = left.join(F.broadcast(right), key, how)
    elif strategy == "broadcast_left":
        out = F.broadcast(left).join(right, key, how)
    elif strategy == "salted":
        skewed, other = (left, right) if lp.n_rows >= rp.n_rows else (right, left)
        out = salted_join(skewed, other, key, how=how)
    else:
        out = left.join(right, key, how)
    return out, strategy


# ---------------------------------------------------------------------------
# Mergeable stats — incremental ANALYZE for append-only tables
# ---------------------------------------------------------------------------
#
# The scalar vector above is a snapshot: appending a batch invalidates it
# and the whole table must rescan. Storing the NDV as an HLL SKETCH
# (binary) instead of a number makes the stats row MERGEABLE: per-batch
# (or per-partition) stats union into table stats without rescanning old
# data — the same contract Delta/Iceberg keep per data file. count/nulls
# add; min/max take extrema; avg_len recombines from (sum_len, count).

def _mergeable_stats_plan(
    df: DataFrame,
    columns: tuple[str, ...] | None,
    lg_k: int,
    group: Column | None,
) -> DataFrame:
    """Shared plan for table- and per-file-grain mergeable partials:
    one wide aggregation (optionally grouped) then an explode into one
    row per column. Extrema are aggregated in NATIVE type (lexicographic
    string extremes are wrong for numerics); numeric columns also persist
    double companions (``min_num``/``max_num``) so partials stay
    order-correct across a parquet round-trip (merge_stats_partials
    orders by those via min_by/max_by)."""
    from pyspark.sql.types import NumericType

    cols = list(columns) if columns is not None else list(df.columns)
    aggs: list[Column] = [F.count(F.lit(1)).alias("_n")]
    numeric = {
        c: isinstance(df.schema[c].dataType, NumericType) for c in cols
    }
    for c in cols:
        col = F.col(c)
        num_min = (
            F.min(col).cast("double")
            if numeric[c]
            else F.lit(None).cast("double")
        )
        num_max = (
            F.max(col).cast("double")
            if numeric[c]
            else F.lit(None).cast("double")
        )
        aggs += [
            F.sum(col.isNull().cast("long")).alias(f"{c}__nulls"),
            F.hll_sketch_agg(col.cast("string"), F.lit(lg_k)).alias(f"{c}__hll"),
            F.min(col).cast("string").alias(f"{c}__min"),
            F.max(col).cast("string").alias(f"{c}__max"),
            num_min.alias(f"{c}__minn"),
            num_max.alias(f"{c}__maxn"),
            F.sum(F.length(col.cast("string"))).alias(f"{c}__len"),
        ]
    wide = df.groupBy(group).agg(*aggs) if group is not None else df.agg(*aggs)
    arms = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("_n").alias("n_rows"),
            F.col(f"{c}__nulls").alias("n_nulls"),
            F.col(f"{c}__hll").alias("ndv_sketch"),
            F.col(f"{c}__min").alias("min"),
            F.col(f"{c}__max").alias("max"),
            F.col(f"{c}__minn").alias("min_num"),
            F.col(f"{c}__maxn").alias("max_num"),
            F.lit(numeric[c]).alias("is_numeric"),
            F.col(f"{c}__len").alias("sum_len"),
        )
        for c in cols
    ]
    keys = ["file"] if group is not None else []
    return wide.select(
        *keys, F.explode(F.array(*arms)).alias("s")
    ).select(*keys, "s.*")


def collect_mergeable_stats(
    df: DataFrame,
    columns: tuple[str, ...] | None = None,
    lg_k: int = 12,
) -> DataFrame:
    """Per-column mergeable stats partials: (column, n_rows, n_nulls,
    ndv_sketch (HLL binary), min, max, min_num, max_num, is_numeric,
    sum_len). One scan, no shuffle of data rows — same plan shape as
    collect_column_stats; see :func:`_mergeable_stats_plan` for the
    native-type extrema rationale."""
    return _mergeable_stats_plan(df, columns, lg_k, group=None)


def collect_mergeable_stats_per_file(
    df: DataFrame,
    columns: tuple[str, ...] | None = None,
    lg_k: int = 12,
) -> DataFrame:
    """:func:`collect_mergeable_stats` at PER-FILE granularity: one
    partial row per (file, column), keyed by the scan's
    ``input_file_name``. This is the write-side half of snapshot
    ANALYZE for a log-structured table (operators/versioned.py): a
    commit records partials for exactly its own new files, and any
    snapshot's table stats are then the merge of its LIVE files'
    partials — no rescan of old data, correct under overwrite/MERGE
    because dead files' rows are simply filtered out before merging
    (a per-commit partial could not offer that: it cannot un-merge).

    Cost: one columnar scan of only the input files, partial aggregates
    combine map-side per file; at 100 TB a commit pays this over its own
    files only, exactly like the [min,max] pruning stats."""
    return _mergeable_stats_plan(
        df, columns, lg_k, group=F.input_file_name().alias("file")
    )


def merge_stats_partials(*partials: DataFrame) -> DataFrame:
    """Union any number of stats partials into one combined vector —
    NO data rescan: counts add, sketches union, extrema take min/max.
    Associative and commutative, so per-batch partials roll up in any
    order (per-partition -> per-table, yesterday + today, etc.); the
    output is itself a partial with the same schema.

    Numeric columns order their extrema by the persisted double
    companions (min_by/max_by keeps the exact rendered string); string
    ordering would be lexicographic — the round-3 advice's
    {2,9,10} -> min='10' bug."""
    import functools

    allp = functools.reduce(lambda a, b: a.unionByName(b), partials)
    merged = allp.groupBy("column").agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("n_nulls").alias("n_nulls"),
        F.hll_union_agg(F.col("ndv_sketch")).alias("ndv_sketch"),
        F.min("min").alias("_min_str"),
        F.max("max").alias("_max_str"),
        F.min_by("min", "min_num").alias("_min_bynum"),
        F.max_by("max", "max_num").alias("_max_bynum"),
        F.min("min_num").alias("min_num"),
        F.max("max_num").alias("max_num"),
        F.any_value("is_numeric").alias("is_numeric"),
        F.sum("sum_len").alias("sum_len"),
    )
    return merged.select(
        "column", "n_rows", "n_nulls", "ndv_sketch",
        F.when(F.col("is_numeric"), F.col("_min_bynum"))
        .otherwise(F.col("_min_str"))
        .alias("min"),
        F.when(F.col("is_numeric"), F.col("_max_bynum"))
        .otherwise(F.col("_max_str"))
        .alias("max"),
        "min_num", "max_num", "is_numeric", "sum_len",
    )


def finalize_stats(partials: DataFrame) -> DataFrame:
    """Render a mergeable partial as the scalar ANALYZE vector
    (ndv estimated from the sketch, avg_len recombined)."""
    return partials.select(
        "column", "n_rows", "n_nulls",
        F.hll_sketch_estimate(F.col("ndv_sketch")).alias("ndv"),
        "min", "max",
        F.round(F.col("sum_len") / F.greatest(F.col("n_rows") - F.col("n_nulls"), F.lit(1)), 2).alias("avg_len"),
    )


def estimate_join_rows(left: TableProfile, right: TableProfile) -> int:
    """System R equi-join cardinality estimate:
    |L ⋈ R| ≈ |L|·|R| / max(ndv_L, ndv_R).

    The containment assumption (smaller key domain ⊆ larger) that every
    classical optimizer uses; with mergeable stats the NDVs come from
    persisted sketches, so the estimate costs no scan. Use before
    materializing an unfamiliar join: an estimate far above both input
    sizes predicts a fan-out (duplicate keys both sides) that deserves
    pre-aggregation instead."""
    return int(
        left.n_rows * right.n_rows / max(left.key_ndv, right.key_ndv, 1)
    )

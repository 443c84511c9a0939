"""Mergeable-sketch rollups: distinct counts over time hierarchies.

Exact COUNT(DISTINCT) is the one aggregate that is NOT mergeable state —
a day's distinct-user count cannot be derived from 24 hourly distinct
counts, so a naive time hierarchy re-scans the raw fact for every grain
(at 100 TB: once per grain, forever). The standard fix is a mergeable
sketch: persist an HLL sketch per fine-grain bucket, and compute every
coarser grain — and any ad-hoc time range — by UNIONING sketches, never
touching raw data again. Spark 4 ships Datasketches HLL natively
(``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``), so
the whole pattern stays JVM-side columnar binary — no UDFs.

This is the sketch analog of ``queries/streamlike.py:
events_cascading_rollup`` (counts/sums are trivially mergeable; distinct
needs HLL). Reference capability line: the events analytics family
(``sakila-data-lake/query_datalake.py`` event rollups), upgraded with
the state-merge property those rollups lack.

Scale notes: the hour-grain pass is one shuffle on (bucket, keys) with
map-side partial sketch merge; every coarser grain shuffles only
#fine-buckets rows of (key, 1-2 KB sketch) — independent of fact size.
``lgConfigK=12`` (4096 registers, ~1.6% RSE) keeps each sketch ≤2 KB;
incremental ingestion unions a new batch's partials into the stored ones
(associative + idempotent-under-reinsert, unlike raw distinct state).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_LG_K = 12  # 4096 registers: ~1.6% relative standard error, ~2 KB

# date_trunc grain ordering, finest → coarsest. A rollup must ascend this
# ladder: truncating an already-coarse bucket to a FINER grain is a no-op,
# which would silently mislabel coarse partials as the finer level.
_GRAIN_RANK = {
    "second": 0, "minute": 1, "hour": 2, "day": 3,
    "week": 4, "month": 5, "quarter": 6, "year": 7,
}


def hll_partials(
    df: DataFrame,
    time_col: str,
    distinct_col: str,
    keys: list[str] | None = None,
    grain: str = "hour",
    lg_k: int = DEFAULT_LG_K,
) -> DataFrame:
    """Fine-grain sketch partials: one row per (bucket, *keys) carrying
    the HLL sketch of ``distinct_col`` plus the mergeable exact counts.
    This is the table you PERSIST; everything else derives from it."""
    keys = keys or []
    bucket = F.date_trunc(grain, F.col(time_col)).alias("bucket_start")
    return (
        df.groupBy(bucket, *[F.col(k) for k in keys])
        .agg(
            F.hll_sketch_agg(F.col(distinct_col), F.lit(lg_k)).alias("hll"),
            F.count(F.col(distinct_col)).alias("n_rows"),
        )
    )


def hll_merge_to_grain(
    partials: DataFrame,
    grain: str,
    keys: list[str] | None = None,
    bucket_col: str = "bucket_start",
) -> DataFrame:
    """Merge fine-grain partials up to a coarser grain — touches only the
    partials (#buckets rows), never the raw fact. Works identically for
    merging a new ingest batch's partials into stored ones."""
    keys = keys or []
    coarse = F.date_trunc(grain, F.col(bucket_col)).alias("bucket_start")
    return (
        partials.groupBy(coarse, *[F.col(k) for k in keys])
        .agg(
            F.hll_union_agg(F.col("hll")).alias("hll"),
            F.sum("n_rows").alias("n_rows"),
        )
    )


def hll_estimate(partials: DataFrame, out_col: str = "approx_distinct") -> DataFrame:
    """Read side: sketch -> estimate (keeps the sketch column for further
    merging; drop it at the final presentation layer)."""
    return partials.withColumn(out_col, F.hll_sketch_estimate(F.col("hll")))


def distinct_rollup(
    df: DataFrame,
    time_col: str,
    distinct_col: str,
    keys: list[str] | None = None,
    grains: tuple[str, ...] = ("hour", "day", "week"),
    lg_k: int = DEFAULT_LG_K,
) -> dict[str, DataFrame]:
    """The full cascading hierarchy: raw fact is scanned ONCE (finest
    grain); every coarser grain merges the previous grain's sketches.
    Returns {grain: DataFrame(bucket_start, *keys, hll, n_rows,
    approx_distinct)} ordered finest-first.

    ``grains`` must ascend finest → coarsest (validated): date_trunc to
    a finer grain than the bucket already has is a silent no-op, so a
    non-monotonic sequence would relabel coarse partials as a finer
    level and report wrong-grain estimates with no error.
    """
    unknown = [g for g in grains if g not in _GRAIN_RANK]
    if unknown:
        raise ValueError(
            f"unknown grain(s) {unknown}; supported: {sorted(_GRAIN_RANK, key=_GRAIN_RANK.get)}"
        )
    for fine, coarse in zip(grains, grains[1:]):
        if _GRAIN_RANK[fine] >= _GRAIN_RANK[coarse]:
            raise ValueError(
                f"grains must ascend finest->coarsest, got {fine!r} before "
                f"{coarse!r} (e.g. ('hour','day','week'))"
            )
    out: dict[str, DataFrame] = {}
    finest = grains[0]
    level = hll_partials(df, time_col, distinct_col, keys, grain=finest, lg_k=lg_k)
    out[finest] = hll_estimate(level)
    for grain in grains[1:]:
        level = hll_merge_to_grain(level, grain, keys)
        out[grain] = hll_estimate(level)
    return out


# ---------------------------------------------------------------------------
# KLL quantile rollups — mergeable percentiles (Spark 4 Datasketches KLL)
# ---------------------------------------------------------------------------
#
# Exact percentiles are as unmergeable as exact distincts: a day's median
# cannot come from 24 hourly medians. KLL sketches ARE mergeable with a
# proven rank-error bound, so the same persist-partials / merge-up /
# query-any-range pattern applies to latency/price/size distributions.

def kll_partials(
    df: DataFrame,
    time_col: str,
    value_col: str,
    keys: list[str] | None = None,
    grain: str = "hour",
    k: int = 200,  # Datasketches default: ~1.65% rank error, ~KB-scale
) -> DataFrame:
    """Fine-grain KLL(double) partials — the persisted quantile state."""
    keys = keys or []
    bucket = F.date_trunc(grain, F.col(time_col)).alias("bucket_start")
    return (
        df.groupBy(bucket, *[F.col(k_) for k_ in keys])
        .agg(
            F.kll_sketch_agg_double(
                F.col(value_col).cast("double"), F.lit(k)
            ).alias("kll"),
            F.count(F.col(value_col)).alias("n_rows"),
        )
    )


def kll_merge_to_grain(
    partials: DataFrame,
    grain: str,
    keys: list[str] | None = None,
    bucket_col: str = "bucket_start",
) -> DataFrame:
    """Merge quantile partials to a coarser grain — #buckets rows only."""
    keys = keys or []
    coarse = F.date_trunc(grain, F.col(bucket_col)).alias("bucket_start")
    return (
        partials.groupBy(coarse, *[F.col(k_) for k_ in keys])
        .agg(
            F.kll_merge_agg_double(F.col("kll")).alias("kll"),
            F.sum("n_rows").alias("n_rows"),
        )
    )


def kll_quantiles(
    partials: DataFrame, quantiles: tuple[float, ...] = (0.5, 0.9, 0.99)
) -> DataFrame:
    """Read side: one column per requested quantile (sketch retained)."""
    out = partials
    for q in quantiles:
        out = out.withColumn(
            f"p{int(q * 100):02d}",
            F.kll_sketch_get_quantile_double(F.col("kll"), F.lit(float(q))),
        )
    return out


# ---------------------------------------------------------------------------
# Theta set-op rollups — distinct sets you can INTERSECT (HLL cannot)
# ---------------------------------------------------------------------------
#
# HLL answers |A ∪ B| only; audience/retention questions need |A ∩ B|
# ("users active in BOTH periods", "customers in segment A and B").
# Theta sketches carry a sample of the set itself, so union, intersection
# and difference all stay sketch-side — the fact is scanned once to build
# per-segment partials and every cross-segment question is sketch algebra.

def theta_partials(
    df: DataFrame,
    segment_cols: list[str],
    distinct_col: str,
) -> DataFrame:
    """Per-segment theta sketch of ``distinct_col`` — the persisted
    set state (one shuffle on the segment key, map-side partial merge)."""
    return df.groupBy(*[F.col(c) for c in segment_cols]).agg(
        F.theta_sketch_agg(F.col(distinct_col)).alias("theta"),
        F.count(F.col(distinct_col)).alias("n_rows"),
    )


def theta_overlap(
    partials: DataFrame,
    segment_col: str,
    seg_a,
    seg_b,
) -> DataFrame:
    """|A|, |B|, |A ∪ B|, |A ∩ B|, |A \\ B| for two segments, computed
    purely from stored sketches (a 2-row cross of KB-scale state)."""
    a = partials.filter(F.col(segment_col) == seg_a).select(
        F.col("theta").alias("ta")
    )
    b = partials.filter(F.col(segment_col) == seg_b).select(
        F.col("theta").alias("tb")
    )
    return a.crossJoin(b).select(
        F.theta_sketch_estimate(F.col("ta")).alias("n_a"),
        F.theta_sketch_estimate(F.col("tb")).alias("n_b"),
        F.theta_sketch_estimate(F.theta_union(F.col("ta"), F.col("tb"))).alias("n_union"),
        F.theta_sketch_estimate(
            F.theta_intersection(F.col("ta"), F.col("tb"))
        ).alias("n_intersection"),
        F.theta_sketch_estimate(
            F.theta_difference(F.col("ta"), F.col("tb"))
        ).alias("n_a_only"),
    )

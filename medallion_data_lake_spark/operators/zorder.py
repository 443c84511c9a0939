"""Z-order clustering — multi-dimensional data skipping without Delta.

Parquet scans skip row groups / files whose column min-max statistics
exclude the filter predicate. Sorting by ONE column makes its stats
tight but leaves every other column's range wide in every file; queries
filtering the second column then read the whole table. The lakehouse
fix (Delta ``OPTIMIZE ZORDER BY``, Iceberg sort orders) is clustering
by a space-filling curve: interleave the bits of the filter columns so
rows close on the curve are close in EVERY dimension, making min-max
boxes small for all of them at once.

This is the same technique expressed as plain Catalyst expressions —
no table format required, works on the parquet layers this engine
ships:

1. one stats pass per column (min/max aggregate) to scale values to
   ``bits``-wide integer grid cells (``width_bucket``);
2. z-value = bit interleave of the cell coordinates, built from
   shift/or expressions (whole-stage codegen, no UDF);
3. ``repartitionByRange`` on the z-value (one range shuffle) +
   ``sortWithinPartitions`` so every output file covers a compact
   z-range.

Scale notes: cost is one extra range shuffle at write time — exactly
what Delta's OPTIMIZE pays — amortized over every subsequent scan.
The stats pass is a single min/max aggregate (no shuffle beyond the
final reduce). Linear min/max scaling is skew-sensitive; for heavily
skewed columns substitute quantile cuts for ``width_bucket`` bounds
(same downstream plan). Verified by reading parquet footer statistics
(tests/test_zorder.py): on 200k rows / two uniform dims at 128 files,
a filter on the NON-sorted dimension touches 28-29 of 128 z-ordered
files vs all 128 single-sorted (single-column layouts skip nothing
there) — that is the property z-ordering buys. On both-dims box
predicates z-order wins 26-28 vs 36-37 (5 probe boxes, stable across
repartitionByRange boundary-sampling seeds); at 32 files the two
layouts tie within sampling noise — the box advantage scales with
files-per-dimension, the non-sorted-dim advantage is structural at
any file count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 10  # 1024 grid cells per dimension — plenty for file skipping


def interleave_bits(cells: list[Column], bits: int) -> Column:
    """Morton code: bit b of dimension i lands at position b*ndims + i.
    Pure shift/or expression tree — one codegen span.

    The code must fit a signed 64-bit long: ``bits * ndims`` beyond 63
    would make ``shiftleft`` wrap its shift amount mod 64 and silently
    scramble the clustering layout, so it is rejected here — callers
    with many columns should lower ``bits`` (``63 // ndims`` is the
    max; :func:`zorder_value` auto-reduces for them).
    """
    ndims = len(cells)
    if bits * ndims > 63:
        raise ValueError(
            f"bits*ndims = {bits}*{ndims} exceeds the 63-bit z-code budget; "
            f"use bits <= {63 // ndims}"
        )
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cells):
            bit = F.shiftrightunsigned(c.cast("long"), b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(
                F.shiftleft(bit, b * ndims + i)
            )
    return z


def zorder_value(df: DataFrame, cols: list[str], bits: int = DEFAULT_BITS) -> DataFrame:
    """Append ``_zvalue``: the Morton code of ``cols`` scaled onto a
    2^bits grid via a single min/max stats pass. ``bits`` is reduced
    automatically when many columns would overflow the 63-bit z-code
    (grid resolution degrades gracefully; wraparound would not)."""
    if not cols:
        raise ValueError("zorder_value needs at least one column")
    bits = min(bits, 63 // len(cols))
    if bits < 1:
        raise ValueError(f"too many z-order columns ({len(cols)}): max 63")
    stats = df.agg(
        *[F.min(c).alias(f"_min_{c}") for c in cols],
        *[F.max(c).alias(f"_max_{c}") for c in cols],
    ).first()
    n_cells = 1 << bits
    cells = []
    for c in cols:
        lo, hi = stats[f"_min_{c}"], stats[f"_max_{c}"]
        if lo == hi:  # constant column: every row in cell 0
            cells.append(F.lit(0))
            continue
        # width_bucket returns 1..n_cells+1; clamp the hi edge, shift to 0-based
        cells.append(
            F.least(
                F.width_bucket(F.col(c).cast("double"), F.lit(float(lo)),
                               F.lit(float(hi)), F.lit(n_cells)),
                F.lit(n_cells),
            ) - 1
        )
    return df.withColumn("_zvalue", interleave_bits(cells, bits))


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 32,
    bits: int = DEFAULT_BITS,
    mode: str = "overwrite",
) -> None:
    """Cluster by the z-curve and write: each output file covers a
    compact z-range, so min-max footer stats are tight in EVERY zorder
    column and point/box filters skip most files."""
    (
        zorder_value(df, cols, bits)
        .repartitionByRange(n_files, F.col("_zvalue"))
        .sortWithinPartitions("_zvalue")
        .drop("_zvalue")
        .write.mode(mode)
        .parquet(path)
    )

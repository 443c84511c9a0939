"""Z-order clustering: measured data-skipping effectiveness.

The claim is physical, so the test measures it physically: read the
parquet footers (pyarrow) of a z-ordered layout vs a single-column
sort, and count which files a point/box predicate could skip by
min-max stats alone. Z-order must keep BOTH dimensions' per-file
ranges tight; single-column sort leaves the second dimension wide in
every file.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from medallion_data_lake_spark.operators.zorder import (
    interleave_bits,
    write_zordered,
    zorder_value,
)

N = 200_000
# 128 files, NOT 32: repartitionByRange samples boundaries with an
# RDD-id-derived seed, so the exact layout depends on session history.
# At 32 files the both-dims box advantage is within sampling noise
# (r9 verdict: 19v17 in-suite, 15v15 isolated — order-dependent flake);
# at 128 files the gap is STRUCTURAL and stable across seeds (measured
# 4 trials with distinct RDD ids: box z∈[26,28] vs s∈[36,37], y-slice
# z∈[28,29] vs s=128 — an 8+-file margin no boundary jitter closes).
N_FILES = 128


def _file_ranges(path, cols):
    """[(file, {col: (min, max)})] from parquet footer statistics."""
    out = []
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        rng = {c: [None, None] for c in cols}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                if name in rng and col.statistics is not None:
                    s = col.statistics
                    lo, hi = rng[name]
                    rng[name][0] = s.min if lo is None else min(lo, s.min)
                    rng[name][1] = s.max if hi is None else max(hi, s.max)
        out.append((f, {c: tuple(v) for c, v in rng.items()}))
    return out


def _files_touched(ranges, preds):
    """Files whose min-max box intersects {col: (lo, hi)}."""
    n = 0
    for _, rng in ranges:
        if all(rng[c][0] <= hi and rng[c][1] >= lo for c, (lo, hi) in preds.items()):
            n += 1
    return n


@pytest.fixture(scope="module")
def grid_df(spark):
    # two independent uniform dims — the adversarial case for any
    # single-column sort
    return (
        spark.range(N)
        .select(
            (F.hash("id") % 10_000).alias("x"),
            (F.hash(F.col("id") + 1) % 10_000).alias("y"),
            F.col("id").alias("payload"),
        )
        .filter("x >= 0 AND y >= 0")
    )


def test_zorder_skips_files_in_both_dims(spark, grid_df, tmp_path):
    zpath = str(tmp_path / "z")
    spath = str(tmp_path / "single")
    write_zordered(grid_df, zpath, ["x", "y"], n_files=N_FILES)
    (
        grid_df.repartitionByRange(N_FILES, "x")
        .sortWithinPartitions("x")
        .write.parquet(spath)
    )
    zr = _file_ranges(zpath, ["x", "y"])
    sr = _file_ranges(spath, ["x", "y"])
    assert len(zr) >= N_FILES // 2 and len(sr) >= N_FILES // 2

    # Box predicates (both dims): at 128 files the z-order advantage is
    # structural — measured z∈[26,28] vs s∈[36,37] across 4 independent
    # layouts (distinct repartitionByRange seeds), so a strict win is
    # safe against boundary-sampling jitter. (At 32 files the two
    # layouts tie within noise — the assertion that flaked in r9.)
    boxes = [
        {"x": (lo, lo + 500), "y": (lo, lo + 500)}
        for lo in (500, 2400, 4300, 6200, 8100)
    ]
    z_box = sum(_files_touched(zr, b) for b in boxes)
    s_box = sum(_files_touched(sr, b) for b in boxes)
    assert z_box < s_box, (z_box, s_box)

    # The decisive z-order property: a filter on the NON-sorted
    # dimension. The x-sorted layout can skip nothing at all; z-order
    # keeps y ranges tight too (measured 28-29 of 128 files).
    ybox = {"y": (1000, 1500)}
    z_y = _files_touched(zr, ybox)
    s_y = _files_touched(sr, ybox)
    assert s_y == len(sr)
    assert z_y < len(zr) // 2

    # combined mixed workload (boxes + y-slice): z-order strictly wins
    assert z_box + z_y < s_box + s_y, (z_box, z_y, s_box, s_y)


def test_zorder_preserves_rows(spark, grid_df, tmp_path):
    path = str(tmp_path / "zr")
    write_zordered(grid_df, path, ["x", "y"], n_files=8)
    back = spark.read.parquet(path)
    assert back.count() == grid_df.count()
    assert back.columns == ["x", "y", "payload"]
    assert (
        back.agg(F.sum("payload")).first()[0]
        == grid_df.agg(F.sum("payload")).first()[0]
    )


def test_zvalue_locality(spark):
    # points in the same grid cell share a z-prefix: z of (a,a) and a
    # far point (a, a+5000) must differ in high bits — i.e. z distance
    # correlates with space distance for axis-aligned moves
    df = spark.createDataFrame(
        [(0, 0), (5000, 5000), (9999, 9999)], "x long, y long"
    )
    z = zorder_value(df, ["x", "y"], bits=8)
    vals = {(r.x, r.y): r._zvalue for r in z.collect()}
    assert vals[(0, 0)] == 0
    assert vals[(9999, 9999)] == (1 << 16) - 1  # all 16 interleaved bits set
    assert vals[(0, 0)] < vals[(5000, 5000)] < vals[(9999, 9999)]


def test_interleave_rejects_64bit_overflow(spark):
    """bits*ndims > 63 would wrap shiftleft's shift amount mod 64 and
    silently scramble z-values — must raise instead."""
    cols = [F.col(f"c{i}") for i in range(7)]
    with pytest.raises(ValueError, match="63-bit"):
        interleave_bits(cols, 10)  # 70 bits
    # 7 dims at 9 bits = 63: allowed
    interleave_bits(cols, 9)


def test_zorder_value_autoreduces_bits(spark):
    """zorder_value degrades grid resolution instead of overflowing:
    7 columns at default bits=10 must still produce valid codes."""
    df = spark.createDataFrame(
        [tuple(range(i, i + 7)) for i in range(50)],
        ", ".join(f"c{i} long" for i in range(7)),
    )
    z = zorder_value(df, [f"c{i}" for i in range(7)])  # default bits=10
    vals = [r._zvalue for r in z.collect()]
    assert all(0 <= v < (1 << 63) for v in vals)
    assert len(set(vals)) > 1  # still discriminates rows


def test_interleave_matches_reference_implementation(spark):
    """The shift/or expression tree equals a bit-twiddling reference
    Morton code for 500 random grid cells (bijective on the grid by
    construction if so)."""
    import random

    from medallion_data_lake_spark.operators.zorder import interleave_bits

    rng = random.Random(5)
    pairs = list({(rng.randrange(256), rng.randrange(256)) for _ in range(500)})
    df = spark.createDataFrame(pairs, "x long, y long")
    z = interleave_bits([F.col("x"), F.col("y")], 8)
    got = {(r.x, r.y): r.z for r in df.select("x", "y", z.alias("z")).collect()}

    def ref(x, y):
        out = 0
        for b in range(8):
            out |= ((x >> b) & 1) << (2 * b)
            out |= ((y >> b) & 1) << (2 * b + 1)
        return out

    assert all(v == ref(x, y) for (x, y), v in got.items())

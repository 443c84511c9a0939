"""HLL sketch rollup properties.

The operator's whole value is the merge algebra; the tests assert it:
- estimates track exact distincts within the lg_k=12 error bound;
- a day merged FROM HOUR PARTIALS equals a day sketched directly from
  raw rows (merge associativity — the property exact distinct lacks);
- unioning two ingest batches' partials == sketching the concatenated
  input (incremental-ingest correctness, duplicate-safe);
- the cascading hierarchy scans the fact once and still estimates every
  grain within bound.
"""

from __future__ import annotations

import datetime as dt

import pytest

from medallion_data_lake_spark.catalog import load_star_table
from medallion_data_lake_spark.operators.sketches import (
    distinct_rollup,
    hll_estimate,
    hll_merge_to_grain,
    hll_partials,
)

SF = "/root/testdata/sf0.01"
RSE = 0.05  # lg_k=12 gives ~1.6% RSE; 3 sigma ≈ 5%


@pytest.fixture(scope="module")
def events(spark):
    return load_star_table(spark, SF, "events").cache()


def _exact(events, grain, key=None):
    from pyspark.sql import functions as F

    g = [F.date_trunc(grain, "ts").alias("bucket_start")] + (
        [F.col(key)] if key else []
    )
    rows = (
        events.groupBy(*g)
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    )
    keyf = (lambda r: (r.bucket_start, r[key])) if key else (lambda r: r.bucket_start)
    return {keyf(r): r.exact for r in rows}


def test_estimates_within_error_bound(spark, events):
    part = hll_partials(events, "ts", "user_id", grain="day")
    est = {r.bucket_start: r.approx_distinct for r in hll_estimate(part).collect()}
    exact = _exact(events, "day")
    assert est.keys() == exact.keys()
    for k, e in exact.items():
        assert abs(est[k] - e) <= max(2, RSE * e), (k, est[k], e)


def test_day_from_hour_partials_equals_direct(spark, events):
    hours = hll_partials(events, "ts", "user_id", grain="hour")
    merged = {
        r.bucket_start: r.approx_distinct
        for r in hll_estimate(hll_merge_to_grain(hours, "day")).collect()
    }
    direct = {
        r.bucket_start: r.approx_distinct
        for r in hll_estimate(
            hll_partials(events, "ts", "user_id", grain="day")
        ).collect()
    }
    # sketch union is exactly associative: identical registers, identical
    # estimates — not merely "close"
    assert merged == direct


def test_batch_union_equals_full_sketch(spark, events):
    cut = dt.datetime(2024, 3, 1)
    a = events.filter(events.ts < cut)
    b = events.filter(events.ts >= cut)
    # deliberately overlap: re-ingest part of batch a inside batch b
    b = b.unionAll(a.limit(200))
    pa = hll_partials(a, "ts", "user_id", grain="week")
    pb = hll_partials(b, "ts", "user_id", grain="week")
    merged = {
        r.bucket_start: r.approx_distinct
        for r in hll_estimate(
            hll_merge_to_grain(pa.unionAll(pb), "week")
        ).collect()
    }
    full = {
        r.bucket_start: r.approx_distinct
        for r in hll_estimate(
            hll_partials(events.unionAll(a.limit(200)), "ts", "user_id", grain="week")
        ).collect()
    }
    assert merged == full  # insert-idempotent: duplicates don't inflate


def test_rollup_rejects_nonmonotonic_grains(spark, events):
    """date_trunc to a finer grain is a no-op on coarser buckets, so a
    misordered sequence would silently emit wrong-grain estimates —
    must raise instead."""
    import pytest

    with pytest.raises(ValueError, match="ascend"):
        distinct_rollup(events, "ts", "user_id", grains=("day", "hour"))
    with pytest.raises(ValueError, match="ascend"):
        distinct_rollup(events, "ts", "user_id", grains=("hour", "day", "day"))
    with pytest.raises(ValueError, match="unknown grain"):
        distinct_rollup(events, "ts", "user_id", grains=("hour", "fortnight"))


def test_cascade_every_grain_in_bound(spark, events):
    grains = distinct_rollup(
        events, "ts", "user_id", keys=["event_type"], grains=("hour", "day", "week")
    )
    for grain, df in grains.items():
        exact = _exact(events, grain, key="event_type")
        got = {
            (r.bucket_start, r.event_type): r.approx_distinct for r in df.collect()
        }
        assert got.keys() == exact.keys(), grain
        for k, e in exact.items():
            assert abs(got[k] - e) <= max(2, RSE * e), (grain, k)


def test_kll_quantile_rollup_merges(spark):
    from pyspark.sql import functions as F

    from medallion_data_lake_spark.operators.sketches import (
        kll_merge_to_grain,
        kll_partials,
        kll_quantiles,
    )

    orders = load_star_table(spark, SF, "orders")
    hourly = kll_partials(orders, "o_orderdate", "o_totalprice", grain="day")
    monthly = kll_merge_to_grain(hourly, "month")
    est = kll_quantiles(monthly, (0.5, 0.9)).collect()
    assert len(est) >= 1
    # merged-sketch median within KLL's rank-error band of the exact
    # per-month median (k=200 -> ~1.65% rank error; allow value slack by
    # checking the exact rank of the estimate instead of the value)
    row = est[0]
    month = row["bucket_start"]
    vals = sorted(
        r["o_totalprice"]
        for r in orders.filter(
            F.date_trunc("month", F.col("o_orderdate")) == month
        ).collect()
    )
    import bisect

    rank = bisect.bisect_left(vals, row["p50"]) / len(vals)
    assert 0.44 <= rank <= 0.56
    assert row["p50"] < row["p90"]
    assert row["n_rows"] == len(vals)


def test_theta_overlap_matches_exact_set_algebra(spark):
    from pyspark.sql import functions as F

    from medallion_data_lake_spark.operators.sketches import (
        theta_overlap,
        theta_partials,
    )

    orders = load_star_table(spark, SF, "orders")
    partials = theta_partials(orders, ["o_orderstatus"], "o_custkey")
    est = theta_overlap(partials, "o_orderstatus", "F", "O").first()

    def custs(status):
        return {
            r["o_custkey"]
            for r in orders.filter(F.col("o_orderstatus") == status)
            .select("o_custkey").distinct().collect()
        }

    a, b = custs("F"), custs("O")
    # theta default lgK gives exact answers at fixture scale (sets are
    # below the sketch's sampling threshold); at production scale the
    # same algebra is ~2% RSE
    assert est["n_a"] == pytest.approx(len(a), rel=0.05)
    assert est["n_b"] == pytest.approx(len(b), rel=0.05)
    assert est["n_union"] == pytest.approx(len(a | b), rel=0.05)
    assert est["n_intersection"] == pytest.approx(len(a & b), rel=0.08)
    assert est["n_a_only"] == pytest.approx(len(a - b), rel=0.08)


def test_kll_and_theta_incremental_ingest(spark):
    """The merge contract extends to the other sketch algebras: two
    ingest batches' partials merged == sketching the concatenated input
    (the same duplicate-safe incremental property the HLL rollup
    asserts)."""
    from pyspark.sql import functions as F

    from medallion_data_lake_spark.catalog import load_star_table
    from medallion_data_lake_spark.operators.sketches import (
        kll_merge_to_grain,
        kll_partials,
        kll_quantiles,
        theta_overlap,
        theta_partials,
    )

    orders = load_star_table(spark, SF, "orders")
    a = orders.filter(F.col("o_orderkey") % 2 == 0)
    b = orders.filter(F.col("o_orderkey") % 2 == 1)

    # KLL: per-batch day partials unioned, then merged to month ==
    # month partials straight from all rows (within rank-error of the
    # same estimate; compare derived medians loosely)
    inc = kll_merge_to_grain(
        kll_partials(a, "o_orderdate", "o_totalprice", grain="day").unionByName(
            kll_partials(b, "o_orderdate", "o_totalprice", grain="day")
        ),
        "month",
    )
    direct = kll_merge_to_grain(
        kll_partials(orders, "o_orderdate", "o_totalprice", grain="day"), "month"
    )
    inc_p50 = {r["bucket_start"]: r["p50"]
               for r in kll_quantiles(inc, (0.5,)).collect()}
    dir_p50 = {r["bucket_start"]: r["p50"]
               for r in kll_quantiles(direct, (0.5,)).collect()}
    assert set(inc_p50) == set(dir_p50)
    for k in dir_p50:
        assert inc_p50[k] == pytest.approx(dir_p50[k], rel=0.10)
    # row counts merge exactly
    assert (
        inc.agg(F.sum("n_rows")).first()[0]
        == direct.agg(F.sum("n_rows")).first()[0]
        == orders.count()
    )

    # theta: per-batch segment partials unioned == direct (estimates at
    # fixture scale are exact, so overlap numbers must agree closely)
    tp_inc = (
        theta_partials(a, ["o_orderstatus"], "o_custkey")
        .unionByName(theta_partials(b, ["o_orderstatus"], "o_custkey"))
        .groupBy("o_orderstatus")
        .agg(F.theta_union_agg(F.col("theta")).alias("theta"),
             F.sum("n_rows").alias("n_rows"))
    )
    tp_dir = theta_partials(orders, ["o_orderstatus"], "o_custkey")
    e_inc = theta_overlap(tp_inc, "o_orderstatus", "F", "O").first()
    e_dir = theta_overlap(tp_dir, "o_orderstatus", "F", "O").first()
    for f in ("n_a", "n_b", "n_union", "n_intersection"):
        assert e_inc[f] == pytest.approx(e_dir[f], rel=0.05)

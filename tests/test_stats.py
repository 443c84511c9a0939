"""Column stats + stats-driven join planning.

The stats vector is checked against exact ground truth (counts, nulls,
min/max exact; NDV within the sketch's error band); the planner is
checked both on its decisions (given crafted profiles) and on the
executed plans it produces (broadcast hint visible, salted join result
equal to the plain join)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from medallion_data_lake_spark.catalog import load_star_table
from medallion_data_lake_spark.operators.stats import (
    TableProfile,
    choose_join_strategy,
    collect_column_stats,
    profile_from_stats,
    read_latest_stats,
    stats_aware_join,
    write_stats,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def customer(spark):
    return load_star_table(spark, SF_DIR, "customer")


def test_stats_vector_matches_ground_truth(spark, customer):
    stats = {r["column"]: r for r in collect_column_stats(customer).collect()}
    n = customer.count()
    assert set(stats) == set(customer.columns)
    assert all(r["n_rows"] == n for r in stats.values())
    exact_ndv = customer.select(F.countDistinct("c_nationkey")).first()[0]
    assert abs(stats["c_nationkey"]["ndv"] - exact_ndv) <= max(1, 0.15 * exact_ndv)
    assert stats["c_custkey"]["n_nulls"] == 0
    # min/max are string-rendered but must reflect the true NUMERIC
    # extremes, not lexicographic ones (c_nationkey spans 0..24: string
    # ordering would report min='0' but max='9' instead of '24')
    assert stats["c_nationkey"]["min"] == str(
        customer.agg(F.min("c_nationkey")).first()[0]
    )
    assert stats["c_nationkey"]["max"] == str(
        customer.agg(F.max("c_nationkey")).first()[0]
    )
    assert stats["c_custkey"]["max"] == str(
        customer.agg(F.max("c_custkey")).first()[0]
    )


def test_stats_extrema_are_numeric_not_lexicographic(spark):
    """The round-3 advice's exact repro: values {2, 9, 10} must report
    min=2 / max=10, not the string extremes min='10' / max='9'."""
    from medallion_data_lake_spark.operators.stats import (
        collect_mergeable_stats,
        finalize_stats,
        merge_stats_partials,
    )

    df = spark.createDataFrame([(2,), (9,), (10,)], "v long")
    s = collect_column_stats(df).collect()[0]
    assert (s["min"], s["max"]) == ("2", "10")

    # the mergeable path must stay order-correct ACROSS partials and a
    # parquet round-trip: {2,9} merged with {10} -> min=2, max=10
    a = collect_mergeable_stats(df.filter(F.col("v") < 10))
    b = collect_mergeable_stats(df.filter(F.col("v") == 10))
    m = finalize_stats(merge_stats_partials(a, b)).collect()[0]
    assert (m["min"], m["max"]) == ("2", "10")


def test_stats_one_scan_no_shuffle(spark, customer):
    plan = collect_column_stats(customer)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 1
    assert "Exchange hashpartitioning" not in plan  # only the 1-row partial merge


def test_stats_roundtrip_latest_wins(spark, customer, tmp_path):
    path = str(tmp_path / "stats")
    write_stats(collect_column_stats(customer), path, "customer")
    write_stats(
        collect_column_stats(customer.limit(10)), path, "customer"
    )
    latest = read_latest_stats(spark, path, "customer")
    assert {r["n_rows"] for r in latest.collect()} == {10}  # newest snapshot


def _prof(n_rows, est_bytes, ndv):
    return TableProfile(n_rows=n_rows, est_bytes=est_bytes,
                        key_ndv=ndv, key_skew_ratio=n_rows / ndv)


def test_strategy_decisions():
    dim = _prof(10_000, 1 << 20, 10_000)
    fact = _prof(10**9, 1 << 40, 10**8)
    hot_fact = _prof(10**9, 1 << 40, 100)  # 10M rows per key: provable skew
    mid = _prof(10**6, 30 << 20, 10**6)  # too big to broadcast, replicable
    assert choose_join_strategy(fact, dim) == "broadcast_right"
    assert choose_join_strategy(dim, fact) == "broadcast_left"
    assert choose_join_strategy(fact, mid) == "shuffle"
    assert choose_join_strategy(hot_fact, mid) == "salted"
    assert choose_join_strategy(hot_fact, dim) == "broadcast_right"  # smallest hammer


def test_stats_aware_join_executes_choice(spark, customer):
    nation = load_star_table(spark, SF_DIR, "nation").withColumnRenamed(
        "n_nationkey", "c_nationkey"
    )
    cs = collect_column_stats(customer)
    ns = collect_column_stats(nation)
    out, strategy = stats_aware_join(customer, nation, "c_nationkey", cs, ns)
    assert strategy == "broadcast_right"
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert out.count() == customer.join(nation, "c_nationkey").count()


def test_stats_aware_join_salted_equals_plain(spark):
    # skewed fact: one hot key holding 80% of rows; forced thresholds
    fact = spark.range(5_000).select(
        F.when(F.col("id") % 5 != 0, F.lit(7)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(0, 5_000).select(F.col("id").alias("k"),
                                       (F.col("id") * 2).alias("w"))
    fs, ds = collect_column_stats(fact), collect_column_stats(dim)
    # thresholds sized so neither ~50 KB side "fits" broadcast but the
    # dim fits the 8x replication budget, and the hot key (5 rows/key
    # avg vs uniform 1) trips the skew test
    out, strategy = stats_aware_join(
        fact, dim, "k", fs, ds, broadcast_bytes=10_000, skew_ratio=4.0
    )
    assert strategy == "salted"
    plain = fact.join(dim, "k")
    assert out.count() == plain.count()
    assert (
        out.agg(F.sum(F.col("v") + F.col("w"))).first()[0]
        == plain.agg(F.sum(F.col("v") + F.col("w"))).first()[0]
    )
    # outer joins refuse the salt path (side swap changes semantics)
    _, s2 = stats_aware_join(
        fact, dim, "k", fs, ds, how="left", broadcast_bytes=1, skew_ratio=10.0
    )
    assert s2 == "shuffle"


def test_mergeable_stats_equal_full_rescan(spark, customer):
    """Per-batch partials merged == stats over the concatenated data —
    the incremental-ANALYZE contract (append a batch, union its partial,
    never rescan history)."""
    from medallion_data_lake_spark.operators.stats import (
        collect_mergeable_stats,
        finalize_stats,
        merge_stats_partials,
    )

    a = customer.filter(F.col("c_custkey") % 2 == 0)
    b = customer.filter(F.col("c_custkey") % 2 == 1)
    merged = finalize_stats(
        merge_stats_partials(
            collect_mergeable_stats(a), collect_mergeable_stats(b)
        )
    )
    full = finalize_stats(collect_mergeable_stats(customer))
    m = {r["column"]: r for r in merged.collect()}
    f = {r["column"]: r for r in full.collect()}
    assert set(m) == set(f)
    for c in f:
        assert m[c]["n_rows"] == f[c]["n_rows"]
        assert m[c]["n_nulls"] == f[c]["n_nulls"]
        assert m[c]["min"] == f[c]["min"] and m[c]["max"] == f[c]["max"]
        # HLL union is exact-identical to single-pass sketching only up
        # to register merge; estimates agree within the sketch error
        assert m[c]["ndv"] == pytest.approx(f[c]["ndv"], rel=0.05)
        assert m[c]["avg_len"] == pytest.approx(f[c]["avg_len"], abs=0.05)
    # and the estimate itself tracks ground truth
    exact = customer.select(F.countDistinct("c_custkey")).first()[0]
    assert m["c_custkey"]["ndv"] == pytest.approx(exact, rel=0.05)


def test_join_cardinality_estimate(spark, customer):
    from medallion_data_lake_spark.operators.stats import (
        estimate_join_rows,
        profile_from_stats,
    )

    orders = load_star_table(spark, SF_DIR, "orders")
    cp = profile_from_stats(collect_column_stats(customer), "c_custkey")
    op = profile_from_stats(
        collect_column_stats(orders.withColumnRenamed("o_custkey", "c_custkey")),
        "c_custkey",
    )
    est = estimate_join_rows(cp, op)
    actual = customer.join(
        orders, customer.c_custkey == orders.o_custkey
    ).count()
    # FK join: estimate should land within sketch error of the fact size
    assert actual * 0.8 <= est <= actual * 1.2
    # fan-out detection: joining orders to itself on custkey explodes
    self_est = estimate_join_rows(op, op)
    assert self_est > op.n_rows * 5


def test_mergeable_partials_persist_roundtrip(spark, customer, tmp_path):
    """The incremental-ANALYZE ledger is only real if partials survive
    storage: write a batch's partials (binary HLL column included) to
    parquet, read them back, merge with a fresh batch, finalize."""
    from medallion_data_lake_spark.operators.stats import (
        collect_mergeable_stats,
        finalize_stats,
        merge_stats_partials,
    )

    a = customer.filter(F.col("c_custkey") % 2 == 0)
    b = customer.filter(F.col("c_custkey") % 2 == 1)
    ledger = str(tmp_path / "stats_ledger")
    collect_mergeable_stats(a).write.parquet(ledger)

    stored = spark.read.parquet(ledger)
    merged = finalize_stats(
        merge_stats_partials(stored, collect_mergeable_stats(b))
    )
    full = finalize_stats(collect_mergeable_stats(customer))
    m = {r["column"]: r for r in merged.collect()}
    f = {r["column"]: r for r in full.collect()}
    for c in f:
        assert m[c]["n_rows"] == f[c]["n_rows"]
        assert m[c]["ndv"] == pytest.approx(f[c]["ndv"], rel=0.05)

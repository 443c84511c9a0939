"""Salted-join equivalence: result equals the plain join, hot key spread."""

from __future__ import annotations

from pyspark.sql import functions as F

from medallion_data_lake_spark.functions import salted_join


def test_salted_join_equals_plain_join(spark):
    # skewed: one hot key (k=1) dominating
    skewed = spark.createDataFrame(
        [(1, i) for i in range(500)] + [(2, 1000), (3, 2000)], "k int, v int"
    )
    dim = spark.createDataFrame([(1, "hot"), (2, "warm"), (4, "unmatched")], "k int, name string")

    plain = skewed.join(dim, "k").select("k", "v", "name")
    salted = salted_join(skewed, dim, "k").select("k", "v", "name")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_outer(spark):
    skewed = spark.createDataFrame([(1, 10), (9, 90)], "k int, v int")
    dim = spark.createDataFrame([(1, "a")], "k int, name string")
    plain = skewed.join(dim, "k", "left").select("k", "v", "name")
    salted = salted_join(skewed, dim, "k", how="left").select("k", "v", "name")
    assert sorted(map(tuple, plain.collect()), key=repr) == sorted(
        map(tuple, salted.collect()), key=repr
    )


def test_salt_actually_spreads_hot_key(spark):
    skewed = spark.createDataFrame([(1, i) for i in range(200)], "k int, v int")
    salts = (
        skewed.withColumn(
            "_salt", F.pmod(F.hash(*[F.col(c) for c in skewed.columns]), F.lit(16))
        )
        .select("_salt")
        .distinct()
        .count()
    )
    assert salts > 8  # the hot key fans out across most salt values


def test_salt_always_in_range_for_non_pow2(spark):
    # pmod keeps salts in [0, n) even for negative hashes; the old
    # abs(hash) % n form could emit a NEGATIVE salt when hash() hits
    # Integer.MIN_VALUE (abs overflows), silently dropping the row.
    skewed = spark.createDataFrame([(i, i * 7) for i in range(500)], "k int, v int")
    dim = spark.createDataFrame([(i, f"d{i}") for i in range(500)], "k int, name string")
    plain = skewed.join(dim, "k").count()
    assert salted_join(skewed, dim, "k", n_salts=10).count() == plain
    rng = (
        skewed.withColumn(
            "_salt", F.pmod(F.hash(*[F.col(c) for c in skewed.columns]), F.lit(10))
        )
        .agg(F.min("_salt").alias("lo"), F.max("_salt").alias("hi"))
        .collect()[0]
    )
    assert 0 <= rng["lo"] and rng["hi"] <= 9


def test_salted_join_rejects_right_and_full(spark):
    """Right/full joins would emit each unmatched right row once per
    salt copy (the other side is exploded n_salts x), so the result
    could NOT equal the plain join — refused loudly instead of
    silently duplicating (r12 ADVICE item)."""
    import pytest

    skewed = spark.createDataFrame([(1, 10)], "k int, v int")
    dim = spark.createDataFrame([(1, "a"), (2, "b")], "k int, name string")
    for how in ("right", "right_outer", "full", "outer", "full_outer"):
        with pytest.raises(ValueError, match="does not support"):
            salted_join(skewed, dim, "k", how=how)
    # the semi/anti family (skewed-side-only outputs) stays supported
    assert salted_join(skewed, dim, "k", how="left_semi").count() == 1
    assert salted_join(skewed, dim, "k", how="left_anti").count() == 0


def test_salted_join_broadcasts_replicated_side(spark):
    # the exploded dim side must be broadcast — its n_salts-times copy
    # never becomes a shuffle (the size-contract guard)
    skewed = spark.createDataFrame([(1, 10)], "k int, v int")
    dim = spark.createDataFrame([(1, "a")], "k int, name string")
    plan = salted_join(skewed, dim, "k")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_salted_join_shuffle_mode_equals_plain_join(spark):
    """broadcast_other=False (the fact⨝fact escape hatch): same result,
    but the replicated side goes through a hash exchange instead of a
    broadcast — no driver-side pin of n_salts x |other|."""
    skewed = spark.createDataFrame(
        [(1, i) for i in range(300)] + [(2, 0), (3, 1)], "k long, v long"
    )
    other = spark.createDataFrame(
        [(1, "a"), (2, "b"), (4, "d")], "k long, name string"
    )
    plain = {(r["k"], r["v"], r["name"]) for r in
             skewed.join(other, "k").collect()}
    salted = salted_join(skewed, other, "k", n_salts=8,
                         broadcast_other=False)
    got = {(r["k"], r["v"], r["name"]) for r in salted.collect()}
    assert got == plain and len(got) == 301
    # the contract is "no FORCED broadcast" (no n_salts x |other| pin
    # demanded by the plan) — AQE is free to pick a broadcast at runtime
    # when the actual size permits, as it does on this tiny fixture
    analyzed = salted._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed

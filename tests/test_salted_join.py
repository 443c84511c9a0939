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
            "_salt", F.abs(F.hash(*[F.col(c) for c in skewed.columns])) % 16
        )
        .select("_salt")
        .distinct()
        .count()
    )
    assert salts > 8  # the hot key fans out across most salt values

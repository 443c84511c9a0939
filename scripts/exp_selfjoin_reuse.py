#!/usr/bin/env python
"""Experiment: does forcing a shuffle join on band self-joins enable
ReusedExchange (single evaluation of the heavy banded subtree), and is
it faster on the local harness? Interleaved A/B to cancel machine noise.
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from medallion_data_lake_spark.operators import multimodal  # noqa: E402
from medallion_data_lake_spark.catalog import load_star_table_spread  # noqa: E402
from medallion_data_lake_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def build_old(spark):
    from medallion_data_lake_spark.queries import load_all_extra

    return load_all_extra()["media_near_dup_bucketed"].build(spark, SF_DIR)


def build_new(spark):
    d = load_star_table_spread(spark, SF_DIR, "documents", "doc_id")
    text = F.decode(F.encode("text", "utf-8"), "utf-8")
    n_tokens = F.size(
        F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != F.lit(""))
    )
    px = d.filter(n_tokens > 0).select(
        F.col("doc_id"), multimodal.fake_thumbnail_expr(text).alias("px")
    )
    hashed = px.select("doc_id", multimodal.dhash_expr("px").alias("phash"))
    # inline phash_band_pairs with shuffle_hash hint
    n_bands, band_bits = multimodal.PHASH_BANDS, multimodal.PHASH_BAND_BITS
    mask = (1 << band_bits) - 1
    bands = hashed.select(
        F.col("doc_id").alias("_id"),
        F.col("phash").alias("_h"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftrightunsigned(F.col("phash"), b * band_bits)
                    .bitwiseAND(F.lit(mask)).alias("bval"),
                )
                for b in range(n_bands)
            ])
        ).alias("bb"),
    ).select("_id", "_h", "bb.band", "bb.bval")
    left = bands.alias("a").hint("shuffle_hash")
    right = bands.alias("b")
    return (
        left.join(
            right,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bval") == F.col("b.bval"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.bit_count(F.col("a._h").bitwiseXOR(F.col("b._h")))
            .cast("long")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= 8)
        .distinct()
        .select(
            F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"), "hamming"
        )
    )


def time_noop(df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def rows_key(df):
    return sorted(tuple(r) for r in df.collect())


def main():
    spark = get_spark(
        app_name="exp-selfjoin",
        master="local[32]",
        extra_conf={"spark.sql.shuffle.partitions": "32"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    old_df, new_df = build_old(spark), build_new(spark)
    # equality check
    assert rows_key(old_df) == rows_key(new_df), "RESULT MISMATCH"
    print("results equal:", len(rows_key(old_df)), "rows")
    # plan check
    plan = new_df._jdf.queryExecution().executedPlan().toString()
    print("new plan has ReusedExchange:", "ReusedExchange" in plan)
    # warmup both
    time_noop(old_df)
    time_noop(new_df)
    olds, news = [], []
    for i in range(7):
        olds.append(time_noop(build_old(spark)))
        news.append(time_noop(build_new(spark)))
    print("old min/med: %.3f %.3f" % (min(olds), statistics.median(olds)))
    print("new min/med: %.3f %.3f" % (min(news), statistics.median(news)))
    spark.stop()


if __name__ == "__main__":
    main()

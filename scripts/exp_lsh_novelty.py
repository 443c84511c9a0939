#!/usr/bin/env python
"""Experiment 2: shuffle-hash hint on the LSH band self-join (feeds
dedup_groups_connected) and the owner-count restructure of
doc_ngram_novelty. Interleaved A/B, result-equality asserted."""
from __future__ import annotations

import os
import statistics
import sys
import time
from functools import reduce

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from medallion_data_lake_spark.catalog import load_star_table_spread  # noqa: E402
from medallion_data_lake_spark.queries import load_all_extra  # noqa: E402
from medallion_data_lake_spark.queries.curation import shingle_hashes  # noqa: E402
from medallion_data_lake_spark.queries.dedup import (  # noqa: E402
    N_BANDS,
    N_MINHASH,
    ROWS_PER_BAND,
    signature_df,
)
from medallion_data_lake_spark.queries._parity import stable_round  # noqa: E402
from medallion_data_lake_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def lsh_pairs_hinted(sigs):
    bands = sigs.select(
        "doc_id",
        *[F.col(f"mh{j}") for j in range(N_MINHASH)],
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.concat_ws(
                        ":",
                        *[
                            F.col(f"mh{b * ROWS_PER_BAND + r}").cast("string")
                            for r in range(ROWS_PER_BAND)
                        ],
                    ).alias("bkey"),
                )
                for b in range(N_BANDS)
            ])
        ).alias("bk"),
    ).select("doc_id", *[f"mh{j}" for j in range(N_MINHASH)], "bk.band", "bk.bkey")
    a, b = bands.alias("a").hint("shuffle_hash"), bands.alias("b")
    matches = reduce(
        lambda acc, j: acc
        + F.when(F.col(f"a.mh{j}") == F.col(f"b.mh{j}"), 1).otherwise(0),
        range(1, N_MINHASH),
        F.when(F.col("a.mh0") == F.col("b.mh0"), 1).otherwise(0),
    )
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            stable_round(matches / F.lit(float(N_MINHASH)), 4).alias("est_jaccard"),
        )
        .distinct()
    )


def cc_new(spark):
    from medallion_data_lake_spark.operators.dedup_graph import connected_components

    pairs = lsh_pairs_hinted(signature_df(spark, SF_DIR)).select("doc_a", "doc_b")
    return connected_components(pairs, "doc_a", "doc_b").select(
        F.col("node").alias("doc_id"), "component"
    )


def novelty_new(spark):
    d = load_star_table_spread(spark, SF_DIR, "documents", "doc_id")
    exploded = d.select(
        "doc_id",
        F.array_distinct(shingle_hashes(F.col("text"))).alias("hs"),
    ).select(
        "doc_id", F.size("hs").cast("long").alias("n_shingles"),
        F.explode("hs").alias("h"),
    )
    # n_novel per doc = number of hashes whose min-owner is the doc;
    # count owners directly instead of joining owners back to the
    # exploded set (drops one big-side join + shuffle)
    owner_counts = (
        exploded.groupBy("h")
        .agg(F.min("doc_id").alias("first_owner"))
        .groupBy(F.col("first_owner").alias("doc_id"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_novel"))
    )
    per_doc = exploded.groupBy("doc_id", "n_shingles").agg(
        F.count(F.lit(1)).alias("_cnt")
    ).drop("_cnt")
    return (
        per_doc.join(owner_counts, "doc_id", "left")
        .select(
            "doc_id", "n_shingles",
            F.coalesce(F.col("n_novel"), F.lit(0).cast("long")).alias("n_novel"),
        )
        .select(
            "doc_id", "n_shingles", "n_novel",
            stable_round(
                F.col("n_novel") * F.lit(1.0) / F.col("n_shingles"), 4
            ).alias("novelty_ratio"),
        )
    )


def time_noop(df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def rows_key(df):
    return sorted(tuple(r) for r in df.collect())


def ab(name, build_old, build_new, spark, n=7):
    o, nn = build_old(spark), build_new(spark)
    ko, kn = rows_key(o), rows_key(nn)
    assert ko == kn, f"{name}: RESULT MISMATCH {len(ko)} vs {len(kn)}"
    print(f"{name}: results equal ({len(ko)} rows)")
    time_noop(o); time_noop(nn)
    olds, news = [], []
    for _ in range(n):
        olds.append(time_noop(build_old(spark)))
        news.append(time_noop(build_new(spark)))
    print("  old min/med: %.3f %.3f" % (min(olds), statistics.median(olds)))
    print("  new min/med: %.3f %.3f" % (min(news), statistics.median(news)))


def main():
    spark = get_spark(
        app_name="exp2",
        master="local[32]",
        extra_conf={
            "spark.sql.shuffle.partitions": "32",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all_extra()

    ab(
        "dedup_groups_connected",
        lambda s: reg["dedup_groups_connected"].build(s, SF_DIR),
        cc_new,
        spark,
    )
    ab(
        "doc_ngram_novelty",
        lambda s: reg["doc_ngram_novelty"].build(s, SF_DIR),
        novelty_new,
        spark,
    )
    spark.stop()


if __name__ == "__main__":
    main()

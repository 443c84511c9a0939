"""Measure pHash banded-recall at the Hamming-8 threshold (r10 verdict
#4): the 4 x 14-bit banding guarantees collision only for distance < 4
(pigeonhole), while media_near_dup_bucketed's threshold is 8 — pairs at
distance 4-8 are recalled probabilistically. This script computes the
ALL-PAIRS ground truth (exact bit_count(xor) over every id_a < id_b
pair, optionally on a bounded deterministic sample) and compares each
banding scheme's recall and candidate-volume cost.

Usage:
    python scripts/measure_phash_recall.py [sf_dir] [sample_n]

sf_dir defaults to /root/testdata/sf0.1; sample_n bounds the ground
truth to the first N doc_ids (0 = all). Prints one JSON line per
scheme plus a ground-truth line; paste the table into SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from medallion_data_lake_spark.catalog import load_star_table_spread  # noqa: E402
from medallion_data_lake_spark.operators import multimodal  # noqa: E402
from medallion_data_lake_spark.session import get_spark  # noqa: E402

MAX_DIST = 8
# (n_bands, band_bits), all covering the 56 hash bits; pigeonhole
# guarantees recall below n_bands, the rest is probabilistic
SCHEMES = [(4, 14), (7, 8), (8, 7), (14, 4)]


def hashed_frame(spark, sf_dir: str, sample_n: int):
    """(doc_id, phash) exactly as the gated media_near_dup_bucketed
    query computes it (same fake decode, token guard, projection
    boundary)."""
    d = load_star_table_spread(spark, sf_dir, "documents", "doc_id")
    if sample_n:
        d = d.filter(F.col("doc_id") < sample_n)  # deterministic sample
    text = F.decode(F.encode("text", "utf-8"), "utf-8")
    n_tokens = F.size(
        F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != F.lit(""))
    )
    px = d.filter(n_tokens > 0).select(
        "doc_id", multimodal.fake_thumbnail_expr(text).alias("px")
    )
    return px.select(
        "doc_id", multimodal.dhash_expr("px").alias("phash")
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sample_n = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="phash-recall", master=f"local[{cpus}]",
        extra_conf={"spark.sql.shuffle.partitions": cpus},
    )
    spark.sparkContext.setLogLevel("ERROR")

    hashed = hashed_frame(spark, sf_dir, sample_n).cache()
    n_docs = hashed.count()

    # ground truth: exact distance over ALL pairs (id_a < id_b)
    a = hashed.select(F.col("doc_id").alias("ia"), F.col("phash").alias("ha"))
    b = hashed.select(F.col("doc_id").alias("ib"), F.col("phash").alias("hb"))
    t0 = time.time()
    truth = (
        a.join(b, F.col("ia") < F.col("ib"))
        .select(
            "ia", "ib",
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
            .cast("long").alias("d"),
        )
        .filter(F.col("d") <= MAX_DIST)
    )
    truth_by_d = {
        int(r["d"]): int(r["n"])
        for r in truth.groupBy("d").agg(F.count("*").alias("n")).collect()
    }
    truth_n = sum(truth_by_d.values())
    print(json.dumps({
        "sf_dir": sf_dir, "n_docs": n_docs, "max_dist": MAX_DIST,
        "truth_pairs": truth_n, "truth_by_distance": truth_by_d,
        "truth_sec": round(time.time() - t0, 2),
    }))

    for n_bands, band_bits in SCHEMES:
        t0 = time.time()
        pairs = multimodal.phash_band_pairs(
            hashed, id_col="doc_id", hash_col="phash", max_dist=MAX_DIST,
            n_bands=n_bands, band_bits=band_bits,
        )
        found = pairs.count()
        wall = time.time() - t0
        # candidate volume = band collisions BEFORE the distance filter
        # (the actual join cost the scheme pays)
        mask = (1 << band_bits) - 1
        bands = hashed.select(
            "phash",
            F.explode(F.array(*[
                F.struct(
                    F.lit(k).alias("band"),
                    F.shiftrightunsigned("phash", k * band_bits)
                    .bitwiseAND(F.lit(mask)).alias("bval"),
                )
                for k in range(n_bands)
            ])).alias("bb"),
        ).select("bb.band", "bb.bval")
        collisions = int(
            bands.groupBy("band", "bval").agg(F.count("*").alias("c"))
            .agg(F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("p"))
            .first()["p"] or 0
        )
        print(json.dumps({
            "scheme": f"{n_bands}x{band_bits}",
            "pigeonhole_guarantee_lt": n_bands,
            "pairs_found": found,
            "recall": round(found / truth_n, 4) if truth_n else None,
            "band_collisions": collisions,
            "wall_sec": round(wall, 2),
        }))


if __name__ == "__main__":
    main()

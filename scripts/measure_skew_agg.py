"""Aggregation-key skew, measured (r12 verdict item 6): AQE's
skew-split rewrites JOIN partitions only — a GROUP BY on a hot key
cannot be split by the runtime because a group's state must land on
one task. Whether that matters depends on the AGGREGATE's algebra, so
three families run over the same Zipf-hot fixture (one order key
holding 20% / 50% of the clone lineitem's rows), plain vs salted:

- algebraic (sum/count):     partial aggregation combines map-side, so
  each map task emits <= 1 row per group — the hot group's final task
  receives n_partitions rows, not n_rows. Expected: absorbed; salting
  only adds a second shuffle.
- distinct (count distinct): Catalyst's Expand rewrite first groups by
  (key, value), spreading the hot key over its distinct values, then
  re-groups by key on already-deduped rows. Expected: absorbed, for
  the same reason. The salted form keys the salt off hash(value) so
  salt buckets hold disjoint value sets (a row-random salt would
  double-count).
- holistic (collect_list):   partial "aggregation" buffers whole
  values — nothing shrinks map-side, so the hot group's final task
  receives ~share x ALL values. This is the one family where the
  group-key analogue of join skew is real. The salted form collects
  per (key, salt) and flattens — order-insensitive consumers only.

Each cell: wall (min of 3) + max single-task executorRunTime (the skew
signal; wall hides skew while other partitions fill the cores).
Every family folds to a ONE-ROW digest in Spark (sum + xor-style hash
over the per-group results; collect_list via hash of the sorted array)
so the timed action carries no driver-transfer term — 1.5M groups
collected per run would otherwise dominate the wall — and digests are
asserted equal across strategies.

Usage: python scripts/measure_skew_agg.py [clone_dir] [work_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from medallion_data_lake_spark.session import get_spark  # noqa: E402

SHARES = (0.20, 0.50)
HOT_ORDER = 1
N_SALTS = 32


def _rest(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}{path}") as r:
        return json.loads(r.read())


def max_task_ms(spark, stage_floor: int) -> int | None:
    try:
        mx = 0
        for s in _rest(spark, "/stages?status=complete"):
            if s["stageId"] < stage_floor:
                continue
            q = _rest(
                spark,
                f"/stages/{s['stageId']}/{s['attemptId']}/taskSummary"
                "?quantiles=1.0",
            )
            mx = max(mx, int(q["executorRunTime"][0]))
        return mx
    except Exception:
        return None


def next_stage_id(spark) -> int:
    try:
        return 1 + max((s["stageId"] for s in _rest(spark, "/stages")),
                       default=-1)
    except Exception:
        return 0


def run(spark, fn) -> dict:
    walls, out, task_ms = [], None, None
    for i in range(3):
        floor = next_stage_id(spark)
        t0 = time.time()
        out = fn()
        walls.append(round(time.time() - t0, 2))
        if i == 0:
            task_ms = max_task_ms(spark, floor)
    return {"wall_s": min(walls), "max_task_ms": task_ms, "result": out}


def main() -> None:
    clone = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mdls_scale/sf1.0"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/mdls_scale/skewagg"
    shutil.rmtree(work, ignore_errors=True)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="skew-agg", master=f"local[{cpus}]",
        extra_conf={"spark.sql.shuffle.partitions": cpus,
                    "spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    li = spark.read.parquet(os.path.join(clone, "lineitem.parquet")).select(
        "l_orderkey", "l_partkey", "l_linenumber",
        "l_extendedprice", "l_discount",
    )

    results = {}
    for share in SHARES:
        tag = f"share_{int(share * 100)}pct"
        thresh = int(share * 1000)
        skew_path = os.path.join(work, tag)
        # hot ORDER key only — l_partkey keeps its natural spread so
        # the distinct family's hot group holds many distinct values
        hot = F.pmod(
            F.hash("l_orderkey", "l_partkey", "l_linenumber"), F.lit(1000)
        ) < thresh
        (
            li.withColumn(
                "l_orderkey",
                F.when(hot, F.lit(HOT_ORDER)).otherwise(F.col("l_orderkey")),
            )
            .write.mode("overwrite").parquet(skew_path)
        )
        sk = spark.read.parquet(skew_path)
        # decimal accumulator: a 1.2M-term double sum at ~4e10 magnitude
        # drifts by whole units between summation orders, so plain vs
        # salted digests can never match on doubles (queries/_parity.py
        # is the same convention)
        prod = (F.col("l_extendedprice")
                * (1 - F.col("l_discount"))).cast("decimal(28,6)")
        # both strategies land on the same decimal type — xxhash64 is
        # type-sensitive, so a (38,6) vs (28,6) pair would hash apart
        rev = F.sum(prod).cast("decimal(28,6)").alias("rev")
        salt_row = F.pmod(F.hash("l_partkey", "l_linenumber"),
                          F.lit(N_SALTS))
        salt_val = F.pmod(F.hash("l_partkey"), F.lit(N_SALTS))

        def digest(grouped, *cols):
            # one-row fold: order-insensitive checksum over all groups
            # (bit_xor, not sum — a 1.5M-term hash sum overflows long
            # under ANSI mode)
            return tuple(
                grouped.select(
                    F.xxhash64("l_orderkey", *cols).alias("h")
                ).agg(
                    F.expr("bit_xor(h)").alias("x"),
                    F.count("*").alias("g"),
                ).collect()[0]
            )

        def algebraic_plain():
            return digest(
                sk.groupBy("l_orderkey").agg(rev, F.count("*").alias("n")),
                "rev", "n",
            )

        def algebraic_salted():
            return digest(
                sk.withColumn("_salt", salt_row)
                .groupBy("l_orderkey", "_salt")
                .agg(F.sum(prod).alias("pr"),
                     F.count("*").alias("pn"))
                .groupBy("l_orderkey")
                .agg(F.sum("pr").cast("decimal(28,6)").alias("rev"),
                     F.sum("pn").alias("n")),
                "rev", "n",
            )

        def distinct_plain():
            return digest(
                sk.groupBy("l_orderkey")
                .agg(F.countDistinct("l_partkey").alias("nd")),
                "nd",
            )

        def distinct_salted():
            # salt = hash(value): buckets hold DISJOINT value sets
            return digest(
                sk.withColumn("_salt", salt_val)
                .groupBy("l_orderkey", "_salt")
                .agg(F.countDistinct("l_partkey").alias("pd"))
                .groupBy("l_orderkey")
                .agg(F.sum("pd").alias("nd")),
                "nd",
            )

        def holistic_plain():
            return digest(
                sk.groupBy("l_orderkey")
                .agg(F.collect_list("l_partkey").alias("parts"))
                .select("l_orderkey",
                        F.sort_array("parts").alias("parts")),
                "parts",
            )

        def holistic_salted():
            return digest(
                sk.withColumn("_salt", salt_row)
                .groupBy("l_orderkey", "_salt")
                .agg(F.collect_list("l_partkey").alias("pp"))
                .groupBy("l_orderkey")
                .agg(F.flatten(F.collect_list("pp")).alias("parts"))
                .select("l_orderkey",
                        F.sort_array("parts").alias("parts")),
                "parts",
            )

        cell = {
            "algebraic": {"plain": run(spark, algebraic_plain),
                          "salted": run(spark, algebraic_salted)},
            "distinct": {"plain": run(spark, distinct_plain),
                         "salted": run(spark, distinct_salted)},
            "holistic": {"plain": run(spark, holistic_plain),
                         "salted": run(spark, holistic_salted)},
        }
        for fam in cell.values():
            assert fam["plain"]["result"] == fam["salted"]["result"], tag
            for r in fam.values():
                del r["result"]
        results[tag] = cell
        print(f"  {tag} done", file=sys.stderr)

    print(json.dumps({"skew_agg": results}))


if __name__ == "__main__":
    main()

"""Skew handling, measured (r11 verdict item 3 — the last unmeasured
SCALE.md claim): a Zipf-style hot key is injected into the clone's
lineitem (one order key holding 5% / 20% / 50% of all rows) and the
fact⨝fact join family (lineitem ⨝ orders on orderkey, priority rollup)
runs under each strategy:

- smj_noskew     — sort-merge join, AQE skew-split OFF (the naive plan:
                   the hot partition serializes on one task).
- smj_aqe_skew   — AQE skew-split ON with thresholds lowered to fire at
                   this fixture's scale (hot partition ~120 MB at 20%;
                   the 256 MB default threshold is sized for production
                   partitions — at 100 TB the DEFAULTS fire).
- salted_shuffle — functions.salted_join(broadcast_other=False): both
                   sides shuffle on (key, salt); the other side pays an
                   n_salts x replication through the shuffle.

Plus the fact⨝dim shape (hot PART key ⨝ part dim) where the salted
BROADCAST form is in-contract, compared against the plain broadcast
join (which is skew-immune by construction — the honest baseline).

Each cell reports wall (min of 3) and the MAX SINGLE TASK time of the
run's stages (Spark UI REST taskSummary — the skew signal itself:
wall can hide skew when other partitions fill the cores).

All strategies must agree on the result (asserted).

Usage: python scripts/measure_skew_join.py [clone_dir] [work_dir]
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

from medallion_data_lake_spark.functions import salted_join  # noqa: E402
from medallion_data_lake_spark.session import get_spark  # noqa: E402

SHARES = (0.05, 0.20, 0.50)
HOT_ORDER = 1
HOT_PART = 1
N_SALTS = 32


def _rest(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}{path}") as r:
        return json.loads(r.read())


def max_task_ms(spark, stage_floor: int) -> int | None:
    """Max single-task executorRunTime (ms) across stages with id >=
    stage_floor — best-effort via the UI REST API."""
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
        stages = _rest(spark, "/stages")
        return 1 + max((s["stageId"] for s in stages), default=-1)
    except Exception:
        return 0


def run(spark, name: str, fn, confs: dict) -> dict:
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        walls, out, task_ms = [], None, None
        for i in range(3):
            floor = next_stage_id(spark)
            t0 = time.time()
            out = fn()
            walls.append(round(time.time() - t0, 2))
            if i == 0:
                task_ms = max_task_ms(spark, floor)
        return {"wall_s": min(walls), "max_task_ms": task_ms, "result": out}
    finally:
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)


def main() -> None:
    clone = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mdls_scale/sf1.0"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/mdls_scale/skew"
    shutil.rmtree(work, ignore_errors=True)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="skew-join", master=f"local[{cpus}]",
        extra_conf={"spark.sql.shuffle.partitions": cpus,
                    # the max-task / jobs-per-request telemetry reads
                    # the UI REST API (off by default in get_spark)
                    "spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    li = spark.read.parquet(os.path.join(clone, "lineitem.parquet")).select(
        "l_orderkey", "l_partkey", "l_linenumber",
        "l_extendedprice", "l_discount",
    )
    orders = spark.read.parquet(os.path.join(clone, "orders.parquet")) \
        .select("o_orderkey", "o_orderpriority")
    part = spark.read.parquet(os.path.join(clone, "part.parquet")) \
        .select("p_partkey", "p_brand")

    FORCE_SMJ = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "false",
    }
    AQE_SKEW = {
        **FORCE_SMJ,
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16m",
    }

    results = {}
    for share in SHARES:
        tag = f"share_{int(share * 100)}pct"
        thresh = int(share * 1000)
        skew_path = os.path.join(work, tag)
        # deterministic hot-key injection: `thresh`/1000 of rows remap
        # their order AND part key to the hot ones
        hot = F.pmod(
            F.hash("l_orderkey", "l_partkey", "l_linenumber"), F.lit(1000)
        ) < thresh
        (
            li.withColumn(
                "l_orderkey",
                F.when(hot, F.lit(HOT_ORDER)).otherwise(F.col("l_orderkey")),
            )
            .withColumn(
                "l_partkey",
                F.when(hot, F.lit(HOT_PART)).otherwise(F.col("l_partkey")),
            )
            .write.mode("overwrite").parquet(skew_path)
        )
        sk = spark.read.parquet(skew_path)
        rev = F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 0
        ).alias("rev")

        def fact_fact_plain():
            return sorted(map(tuple, (
                sk.join(orders, sk.l_orderkey == orders.o_orderkey)
                .groupBy("o_orderpriority").agg(rev).collect()
            )))

        def fact_fact_salted():
            return sorted(map(tuple, (
                salted_join(
                    sk, orders.withColumnRenamed("o_orderkey", "l_orderkey"),
                    "l_orderkey", n_salts=N_SALTS, broadcast_other=False,
                )
                .groupBy("o_orderpriority").agg(rev).collect()
            )))

        def fact_dim_plain():
            return sorted(map(tuple, (
                sk.join(part, sk.l_partkey == part.p_partkey)
                .groupBy("p_brand").agg(rev).collect()
            )))

        def fact_dim_salted():
            return sorted(map(tuple, (
                salted_join(
                    sk, part.withColumnRenamed("p_partkey", "l_partkey"),
                    "l_partkey", n_salts=8, broadcast_other=True,
                )
                .groupBy("p_brand").agg(rev).collect()
            )))

        cell = {
            "fact_fact": {
                "smj_noskew": run(spark, "smj", fact_fact_plain, FORCE_SMJ),
                "smj_aqe_skew": run(spark, "aqe", fact_fact_plain, AQE_SKEW),
                "salted_shuffle": run(
                    spark, "salt", fact_fact_salted, FORCE_SMJ),
            },
            "fact_dim": {
                "smj_noskew": run(spark, "smj", fact_dim_plain, FORCE_SMJ),
                "smj_aqe_skew": run(spark, "aqe", fact_dim_plain, AQE_SKEW),
                "broadcast": run(spark, "bhj", fact_dim_plain, {
                    "spark.sql.autoBroadcastJoinThreshold": "64m",
                    "spark.sql.adaptive.skewJoin.enabled": "false",
                }),
                "salted_broadcast": run(
                    spark, "saltb", fact_dim_salted, FORCE_SMJ),
            },
        }
        # all strategies must agree
        for fam in cell.values():
            base = None
            for strat, r in fam.items():
                if base is None:
                    base = r["result"]
                assert r["result"] == base, f"{tag}: {strat} diverged"
                del r["result"]
        results[tag] = cell
        print(f"  {tag} done", file=sys.stderr)

    print(json.dumps({"skew_join": results}))


if __name__ == "__main__":
    main()

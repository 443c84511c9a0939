#!/usr/bin/env python
"""Benchmark harness: run every registered query at the bench scale factor.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "queries_median": {name: sec, ...},
   "plan_fp": {name: hex12, ...}, "sf": <sf>}

"queries" holds the per-query MIN across repeats (the plan's floor —
what the round-over-round comparison uses); "queries_median" the MEDIAN
(the noise bar: a min/median gap on a sub-second query is machine
weather, a plan change moves both). "plan_fp" is a normalized hash of
the OPTIMIZED logical plan — round-over-round, identical fp + moved
timing = machine weather (dismiss), changed fp = a real plan change
(investigate). Added after r6 burned a bench cycle proving a 15.6%
aggregate swing was noise on byte-identical code.

Env:
  SPARK_GRAFT_SF_DIR  parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    local[] parallelism (default 32)
  BENCH_QUERIES       comma-separated subset (default: all registered)
  BENCH_REPEAT        runs per query, min reported (default 3 — this
                      container shows +/-5s single-run noise and
                      whole-run load spikes; min-of-3 keeps the
                      recorded number about the plan, not the machine)

Each query is fully materialized through the noop sink (no driver
collect — measures distributed compute, not py4j transfer).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from medallion_data_lake_spark.queries import load_all  # noqa: E402
from medallion_data_lake_spark.session import get_spark  # noqa: E402


def plan_fingerprint(df) -> str:
    """Stable 12-hex digest of the optimized logical plan: expression
    IDs (#123), JVM object hashes, and data paths vary across sessions
    and scale factors without the PLAN changing — strip them so the
    fingerprint moves only when the shape/strategy does."""
    import hashlib

    s = df._jdf.queryExecution().optimizedPlan().toString()
    s = re.sub(r"#\d+", "#", s)
    s = re.sub(r"@[0-9a-f]+", "@", s)
    s = re.sub(r"file:[^\s,\]\)]*", "file:", s)
    return hashlib.md5(s.encode()).hexdigest()[:12]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    registry = load_all()
    only = os.environ.get("BENCH_QUERIES")
    names = [n.strip() for n in only.split(",")] if only else sorted(registry)

    spark = get_spark(
        app_name="mdls-bench",
        master=f"local[{cpus}]",
        extra_conf={"spark.sql.shuffle.partitions": cpus},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warmup on the smallest fixture so per-query timings
    # measure the plan, not first-run JIT.
    registry["pricing_summary"].build(spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()

    repeat = max(1, int(os.environ.get("BENCH_REPEAT", "3")))
    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    plan_fps: dict[str, str] = {}
    for name in names:
        plan_fps[name] = plan_fingerprint(registry[name].build(spark, sf_dir))
        runs = []
        for _ in range(repeat):
            t0 = time.perf_counter()
            registry[name].build(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        runs.sort()
        timings[name] = round(runs[0], 3)
        medians[name] = round(runs[len(runs) // 2], 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_wall_sec_all_queries",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_median": medians,
                "plan_fp": plan_fps,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Round-16 second-half scout: dump plans + interleaved timings for the
current top-cost gated queries, in ONE session (same methodology as
bench.py: noop sink, warmup first).

Usage: python scripts/scout_r16b.py q1,q2,... [repeat]
Writes plans to /tmp/scout_plans/<name>.txt and prints a timing table.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from medallion_data_lake_spark.queries import load_all_extra  # noqa: E402
from medallion_data_lake_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    names = sys.argv[1].split(",")
    repeat = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    registry = load_all_extra()
    spark = get_spark(
        app_name="mdls-scout-r16b",
        master=f"local[{CPUS}]",
        extra_conf={"spark.sql.shuffle.partitions": CPUS},
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry["pricing_summary"].build(spark, "/root/testdata/sf0.001").write.format(
        "noop"
    ).mode("overwrite").save()

    os.makedirs("/tmp/scout_plans", exist_ok=True)
    results: dict[str, list[float]] = {n: [] for n in names}
    # dump plans once
    for n in names:
        import contextlib
        import io

        df = registry[n].build(spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(f"/tmp/scout_plans/{n}.txt", "w") as fh:
            fh.write(buf.getvalue())
    # interleave timing rounds: round-robin across queries so host
    # weather spreads evenly
    for r in range(repeat):
        for n in names:
            spark.sparkContext.setJobDescription(f"scout {n} r{r}")
            t0 = time.perf_counter()
            registry[n].build(spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            results[n].append(time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
    print(f"{'query':40s} {'min':>7s} {'med':>7s}  runs")
    for n in names:
        rs = sorted(results[n])
        print(
            f"{n:40s} {rs[0]:7.3f} {rs[len(rs) // 2]:7.3f}  "
            + " ".join(f"{x:.3f}" for x in results[n])
        )
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""In-session per-query floor: build+noop timed N times per query inside
ONE session, min reported. More noise-robust than cross-process bench
comparisons on a shared host. Usage:
  python scripts/floor_table.py [out.json] [reps]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from medallion_data_lake_spark.queries import load_all  # noqa: E402
from medallion_data_lake_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "plans/r15/floor.json"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="mdls-floor",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf={
            "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()
    only = os.environ.get("FLOOR_QUERIES")
    names = [n.strip() for n in only.split(",")] if only else sorted(reg)
    for n in names:  # warm: one full pass
        reg[n].build(spark, sf_dir).write.format("noop").mode("overwrite").save()
    per: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(reps):
        for n in names:
            t0 = time.perf_counter()
            reg[n].build(spark, sf_dir).write.format("noop").mode("overwrite").save()
            per[n].append(time.perf_counter() - t0)
    mins = {n: round(min(v), 3) for n, v in per.items()}
    meds = {n: round(sorted(v)[len(v) // 2], 3) for n, v in per.items()}
    doc = {"total_min": round(sum(mins.values()), 2), "mins": mins, "medians": meds}
    with open(out_path, "w") as fh:
        json.dump(doc, fh, indent=1, sort_keys=True)
    print(json.dumps({"total_min": doc["total_min"], "out": out_path}))
    for n, d in sorted(mins.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {d:6.3f}  {n}")
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Dump .explain('formatted') for registry queries to plans/<outdir>/.

Usage: python scripts/dump_plans.py <outdir> [suffix] [names...]
  outdir  e.g. plans/r15
  suffix  e.g. before / after (file name: <query>_<suffix>.txt)
  names   query names (default: all driver-gated)
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from medallion_data_lake_spark.queries import load_all, load_all_extra  # noqa: E402
from medallion_data_lake_spark.session import get_spark  # noqa: E402


def main() -> None:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "plans/r15"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry = load_all_extra()
    names = sys.argv[3:] or sorted(load_all())
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(
        app_name="mdls-plans",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        extra_conf={"spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32")},
    )
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = registry[name].build(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(txt)
        print(name, "ok")
    spark.stop()


if __name__ == "__main__":
    main()

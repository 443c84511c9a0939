"""Scheduler hook: the pipeline as a dependency-ordered stage graph.

The reference ships an Airflow DAG whose seven tasks are echo stubs
(``airflow/dags/sakila_pipeline_dag.py:23-103`` — every BashOperator
prints instead of running its script). This module is the working
version: each stage is a real callable bound to engine code, the
dependency edges mirror the reference DAG's chain (extract → bronze →
silver → gold → serving → quality check), and any scheduler can consume
it — Airflow ``PythonOperator(python_callable=STAGES[name].run, ...)``,
cron via ``run_stages``, or a one-shot ``run_stages(ctx)`` for backfill.

Stages the engine cannot run in-process (MySQL extract / Kafka ingest,
which need external systems) report ``skipped`` with the reason instead
of pretending success — the quality gate distinguishes skipped inputs
from failed transforms.
"""

from __future__ import annotations

import os
import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import SparkSession


@dataclass
class StageContext:
    spark: SparkSession
    bronze_root: str
    silver_root: str
    gold_root: str
    jdbc_url: str | None = None
    results: dict[str, dict] = field(default_factory=dict)


@dataclass(frozen=True)
class Stage:
    name: str
    depends_on: tuple[str, ...]
    run: Callable[[StageContext], dict]
    doc: str = ""


def _extract(ctx: StageContext) -> dict:
    # external system boundary: the engine consumes bronze; producing it
    # needs a database + broker (sources/kafka.py has the producer-side
    # serialization when they exist)
    return {"status": "skipped", "reason": "external extract (MySQL/Kafka absent)"}


def _ingest_bronze(ctx: StageContext) -> dict:
    if os.path.isdir(ctx.bronze_root):
        return {"status": "ok", "note": "bronze present (file-landed or streamed)"}
    return {"status": "skipped", "reason": f"no bronze at {ctx.bronze_root}"}


def _silver(ctx: StageContext) -> dict:
    from .pipeline import run_silver

    report = run_silver(ctx.spark, ctx.bronze_root, ctx.silver_root)
    return {"status": "ok", "stages": report.summary()["stages"]}


def _gold(ctx: StageContext) -> dict:
    from .pipeline import run_gold

    report = run_gold(ctx.spark, ctx.silver_root, ctx.gold_root)
    return {"status": "ok", "stages": report.summary()["stages"]}


def _serve(ctx: StageContext) -> dict:
    if ctx.jdbc_url is None:
        return {"status": "skipped", "reason": "no serving database configured"}
    from .sources.sinks import write_jdbc

    n = 0
    for t in sorted(os.listdir(ctx.gold_root)):
        path = os.path.join(ctx.gold_root, t)
        if os.path.isdir(path):
            write_jdbc(ctx.spark.read.parquet(path), ctx.jdbc_url, t)
            n += 1
    return {"status": "ok", "tables": n}


def _quality(ctx: StageContext) -> dict:
    """Real checks, not the reference's print-only pass: every expected
    gold table exists and is non-empty, silver/bronze row counts agree
    for payment (the reconcile invariant), and customer_summary honors
    its declarative expectations contract (single-pass row checks +
    key uniqueness — operators/expectations.py)."""
    from .operators.expectations import (
        custom,
        not_null,
        run_expectations,
        unique,
    )
    from .pipeline import reconcile

    problems: list[str] = []
    for t in ("customer_summary", "daily_revenue", "rental_trends"):
        path = os.path.join(ctx.gold_root, t)
        if not os.path.isdir(path):
            problems.append(f"missing gold table {t}")
        elif ctx.spark.read.parquet(path).isEmpty():
            problems.append(f"empty gold table {t}")
    rec = {
        r["layer"]: r["record_count"]
        for r in reconcile(ctx.spark, ctx.bronze_root, ctx.silver_root, "payment").collect()
    }
    if rec.get("bronze") != rec.get("silver"):
        problems.append(f"payment reconcile mismatch {rec}")
    cs_path = os.path.join(ctx.gold_root, "customer_summary")
    if os.path.isdir(cs_path):
        from pyspark.sql import functions as F

        report = run_expectations(
            ctx.spark.read.parquet(cs_path),
            [
                not_null("customer_id"),
                unique("customer_id"),
                custom("non_negative_spend",
                       F.coalesce(F.col("total_spent"), F.lit(0.0)) >= 0),
            ],
        )
        if not report["passed"]:
            bad = {k: v for k, v in report["checks"].items() if v}
            problems.append(f"customer_summary expectations failed: {bad}")
    return {"status": "failed", "problems": problems} if problems else {"status": "ok"}


STAGES: dict[str, Stage] = {
    s.name: s
    for s in (
        Stage("extract", (), _extract, "MySQL→Kafka extract (external)"),
        Stage("ingest_bronze", ("extract",), _ingest_bronze, "Kafka→bronze landing"),
        Stage("silver", ("ingest_bronze",), _silver, "bronze→silver conform"),
        Stage("gold", ("silver",), _gold, "silver→gold analytics"),
        Stage("serve", ("gold",), _serve, "gold→JDBC serving copy"),
        Stage("quality", ("gold",), _quality, "data quality gate"),
    )
}


def topological_order() -> list[str]:
    """Stage names in dependency order (deterministic: insertion-stable
    Kahn's algorithm over the declared edges)."""
    done: list[str] = []
    pending = dict(STAGES)
    while pending:
        ready = [n for n, s in pending.items() if all(d in done for d in s.depends_on)]
        if not ready:
            raise ValueError(f"dependency cycle among {sorted(pending)}")
        for n in ready:
            done.append(n)
            del pending[n]
    return done


def run_stages(ctx: StageContext, only: tuple[str, ...] | None = None) -> dict[str, dict]:
    """Execute the graph in dependency order; a failed stage halts its
    downstream (scheduler semantics) but independent branches continue."""
    halted: set[str] = set()
    for name in topological_order():
        if only is not None and name not in only:
            continue
        stage = STAGES[name]
        if any(d in halted for d in stage.depends_on):
            ctx.results[name] = {"status": "upstream_failed"}
            halted.add(name)
            continue
        t0 = time.perf_counter()
        try:
            out = stage.run(ctx)
        except Exception as e:  # scheduler surface: record, don't crash the run
            out = {"status": "failed", "error": f"{type(e).__name__}: {e}"}
        out["seconds"] = round(time.perf_counter() - t0, 2)
        ctx.results[name] = out
        if out["status"] == "failed":
            halted.add(name)
    return ctx.results

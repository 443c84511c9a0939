"""Scheduler-hook stage graph: ordering, real execution, quality gate."""

from __future__ import annotations

from medallion_data_lake_spark.orchestration import (
    STAGES,
    StageContext,
    run_stages,
    topological_order,
)


def test_topological_order_respects_edges():
    order = topological_order()
    assert set(order) == set(STAGES)
    for name, stage in STAGES.items():
        for dep in stage.depends_on:
            assert order.index(dep) < order.index(name)


def test_full_graph_over_bronze_fixture(spark, bronze_root, tmp_path_factory):
    ctx = StageContext(
        spark=spark,
        bronze_root=bronze_root,
        silver_root=str(tmp_path_factory.mktemp("orc_silver")),
        gold_root=str(tmp_path_factory.mktemp("orc_gold")),
    )
    results = run_stages(ctx)
    assert results["extract"]["status"] == "skipped"       # honest external boundary
    assert results["ingest_bronze"]["status"] == "ok"
    assert results["silver"]["status"] == "ok"
    assert results["gold"]["status"] == "ok"
    assert results["serve"]["status"] == "skipped"         # no database configured
    assert results["quality"]["status"] == "ok"            # real checks pass


def test_failed_stage_halts_downstream(spark, tmp_path_factory):
    ctx = StageContext(
        spark=spark,
        bronze_root=str(tmp_path_factory.mktemp("empty_bronze")),  # no tables
        silver_root=str(tmp_path_factory.mktemp("orc_silver2")),
        gold_root=str(tmp_path_factory.mktemp("orc_gold2")),
    )
    results = run_stages(ctx)
    # silver over an empty bronze conforms nothing; gold then fails on the
    # missing silver inputs and quality is halted as its downstream
    assert results["gold"]["status"] == "failed"
    assert results["quality"]["status"] == "upstream_failed"

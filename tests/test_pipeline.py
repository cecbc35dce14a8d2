"""Phase-DAG driver: abort-dependents semantics (the fix for the
reference daily_load.py:42-54 continue-on-stale flaw), metrics capture,
cycle/unknown-dep validation."""

from __future__ import annotations

import pytest

from medallion_etl_spark.pipeline import Phase, PipelineError, failed, run_pipeline


def test_failed_silver_skips_gold_but_not_siblings():
    calls = []

    def mk(name, fail=False):
        def fn():
            calls.append(name)
            if fail:
                raise RuntimeError(f"{name} exploded")
            return name

        return fn

    report = run_pipeline(
        [
            Phase("bronze", mk("bronze")),
            Phase("silver_sales", mk("silver_sales", fail=True), deps=["bronze"]),
            Phase("silver_stock", mk("silver_stock"), deps=["bronze"]),
            Phase("gold_ventas", mk("gold_ventas"), deps=["silver_sales"]),
            Phase("gold_stock", mk("gold_stock"), deps=["silver_stock"]),
            Phase("cobertura", mk("cobertura"), deps=["gold_ventas", "gold_stock"]),
        ]
    )
    assert report["silver_sales"]["status"] == "failed"
    assert "exploded" in report["silver_sales"]["error"]
    # dependents of the failure never ran on stale upstream...
    assert report["gold_ventas"]["status"] == "skipped_upstream"
    assert report["gold_ventas"]["blocked_by"] == ["silver_sales"]
    assert "gold_ventas" not in calls
    # ...transitively
    assert report["cobertura"]["status"] == "skipped_upstream"
    assert report["cobertura"]["blocked_by"] == ["gold_ventas"]
    # but the independent branch completed
    assert report["silver_stock"]["status"] == "ok"
    assert report["gold_stock"]["status"] == "ok"
    assert failed(report) == ["silver_sales"]


def test_all_ok_runs_in_dependency_order_with_metrics():
    order = []
    report = run_pipeline(
        [
            Phase("gold", lambda: order.append("gold") or 42, deps=["silver"]),
            Phase("silver", lambda: order.append("silver"), deps=["bronze"]),
            Phase("bronze", lambda: order.append("bronze")),
        ]
    )
    assert order == ["bronze", "silver", "gold"]
    assert all(r["status"] == "ok" for r in report.values())
    assert report["gold"]["result"] == 42
    assert all(r["seconds"] >= 0 for r in report.values())


def test_fail_fast_skips_everything_downstream_of_time():
    ran = []
    report = run_pipeline(
        [
            Phase("a", lambda: ran.append("a")),
            Phase("b", lambda: (_ for _ in ()).throw(RuntimeError("boom")), deps=["a"]),
            Phase("c", lambda: ran.append("c")),  # independent, but fail_fast
        ],
        fail_fast=True,
    )
    assert ran == ["a"]
    assert report["c"]["status"] == "skipped_upstream"
    assert report["c"]["blocked_by"] == ["b"]


def test_validation_errors():
    with pytest.raises(PipelineError, match="unknown"):
        run_pipeline([Phase("a", lambda: None, deps=["ghost"])])
    with pytest.raises(PipelineError, match="cycle"):
        run_pipeline(
            [Phase("a", lambda: None, deps=["b"]), Phase("b", lambda: None, deps=["a"])]
        )
    with pytest.raises(PipelineError, match="duplicate"):
        run_pipeline([Phase("a", lambda: None), Phase("a", lambda: None)])

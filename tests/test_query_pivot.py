"""Crosstab queries (query_pivot): reshape correctness vs the long-form
result, deterministic column order, pinned values, NULL cells, errors."""

from __future__ import annotations

import pytest

from dbt_databricks_metrics_spark.engine import MetricEngine
from dbt_databricks_metrics_spark.plans.compiler import QueryError
from dbt_databricks_metrics_spark.project import build_registry


@pytest.fixture(scope="module")
def engine(spark, sf_dir, tmp_path_factory):
    eng = MetricEngine(
        spark, build_registry(sf_dir), warehouse_dir=str(tmp_path_factory.mktemp("whp"))
    )
    eng.run()
    return eng


def test_pivot_matches_long_form(engine):
    mv = engine.metric_view("mv_order_metrics")
    long = {
        (r["order_year"], r["market_segment"]): r["total_orders"]
        for r in mv.query(
            ["order_year", "market_segment"], ["total_orders"]
        ).collect()
    }
    segs = sorted({k[1] for k in long})
    wide = mv.query_pivot(["order_year"], "market_segment", ["total_orders"])
    assert wide.columns == ["order_year"] + [f"total_orders_{s}" for s in segs]
    for r in wide.collect():
        for s in segs:
            assert r[f"total_orders_{s}"] == long.get((r["order_year"], s))


def test_pivot_multi_measure_and_pinned_values(engine):
    mv = engine.metric_view("mv_order_metrics")
    wide = mv.query_pivot(
        ["order_year"],
        "market_segment",
        ["total_orders", "total_revenue"],
        values=["BUILDING", "MACHINERY"],
    )
    assert wide.columns == [
        "order_year",
        "total_orders_BUILDING",
        "total_orders_MACHINERY",
        "total_revenue_BUILDING",
        "total_revenue_MACHINERY",
    ]
    assert wide.count() > 0


def test_pivot_null_cell_for_missing_combo(engine):
    mv = engine.metric_view("mv_order_metrics")
    # a pinned value that never occurs yields an all-NULL column
    wide = mv.query_pivot(
        ["order_year"], "market_segment", ["total_orders"],
        values=["BUILDING", "NO_SUCH_SEGMENT"],
    )
    rows = wide.collect()
    assert all(r["total_orders_NO_SUCH_SEGMENT"] is None for r in rows)
    assert any(r["total_orders_BUILDING"] is not None for r in rows)


def test_pivot_no_dims_gives_one_row(engine):
    mv = engine.metric_view("mv_order_metrics")
    wide = mv.query_pivot([], "market_segment", ["total_orders"])
    assert wide.count() == 1


def test_pivot_rejects_repeated_dim(engine):
    mv = engine.metric_view("mv_order_metrics")
    with pytest.raises(QueryError, match="must not repeat"):
        mv.query_pivot(["market_segment"], "market_segment", ["total_orders"])


def test_pivot_null_values_excluded_and_pinned_none_rejected(engine, spark):
    mv = engine.metric_view("mv_order_metrics")
    with pytest.raises(QueryError, match="must not contain None"):
        mv.query_pivot(["order_year"], "market_segment", ["total_orders"],
                       values=["BUILDING", None])

"""Window-measure grain served from covering rollups (scale optimization
beyond the reference's "window measures always on the fly", README.md:431).

The window frame + semiadditive reduction still run at query time; only
the grain input ``groupBy(dims × order).agg(partials)`` is re-aggregated
from a rollup whose dims cover the grain columns (and any WHERE-slice
dims) and whose stored partials match the window measure's base aggregate
by source expression. Values must be identical to the source-scan plan.
"""

from __future__ import annotations

import pytest

from dbt_databricks_metrics_spark.engine import MetricEngine
from dbt_databricks_metrics_spark.plans.compiler import MetricQuery
from dbt_databricks_metrics_spark.project import build_registry
from dbt_databricks_metrics_spark.specs import MetricViewSpec

SPEC_YAML = """
version: 0.1
source: fct_orders
dimensions:
  - name: market_segment
    expr: market_segment
  - name: order_status
    expr: order_status
  - name: order_date
    expr: order_date
measures:
  - name: total_revenue
    expr: sum(total_price)
  - name: avg_order_value
    expr: avg(total_price)
  - name: trailing_7d_revenue
    expr: sum(total_price)
    window:
      - order: order_date
        range: trailing 7 day
        semiadditive: last
  - name: trailing_7d_aov
    expr: avg(total_price)
    window:
      - order: order_date
        range: trailing 7 day
        semiadditive: last
  - name: cumulative_revenue
    expr: sum(total_price)
    window:
      - order: order_date
        range: cumulative
        semiadditive: last
  - name: t1m_revenue
    expr: sum(total_price)
    window:
      - order: order_date
        range: trailing 1 month
        semiadditive: last
materialization:
  materialized_views:
    - name: daily_segment
      type: aggregated
      dimensions: [market_segment, order_date]
      measures: [total_revenue, avg_order_value]
    - name: daily_seg_status
      type: aggregated
      dimensions: [market_segment, order_status, order_date]
      measures: [total_revenue]
"""


@pytest.fixture(scope="module")
def engine(spark, sf_dir, tmp_path_factory):
    eng = MetricEngine(
        spark,
        build_registry(sf_dir),
        warehouse_dir=str(tmp_path_factory.mktemp("wgr")),
    )
    eng.run(materialize_rollups=True)
    eng.register(MetricViewSpec.from_yaml(SPEC_YAML, name="mv_wgrain"))
    eng.refresh("mv_wgrain")
    return eng


def _rows(df):
    import math

    def norm(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            if v == 0:
                return 0.0
            return round(v, max(0, 10 - int(math.log10(abs(v)))))
        return str(v)

    return sorted(tuple(norm(x) for x in r) for r in df.collect())


def test_grain_served_from_covering_rollup(engine):
    mv = engine.metric_view("mv_wgrain")
    df, route = mv.query_routed(["market_segment"], ["trailing_7d_revenue"])
    # smallest covering rollup (daily_segment) wins over daily_seg_status
    assert route == "live+grain:daily_segment", route
    live = engine._compiler.compile(
        MetricQuery(mv.spec, ("market_segment",), ("trailing_7d_revenue",))
    )
    assert _rows(df) == _rows(live)
    # the plan reads the (cached) rollup, never the fact table
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "fct_orders" not in plan, plan[:2000]


def test_grain_avg_measure_uses_partial_pair(engine):
    """avg decomposes to (sum, count) partials — both must match stored
    partials and re-merge; finalize happens after the window merge."""
    mv = engine.metric_view("mv_wgrain")
    df, route = mv.query_routed(["market_segment"], ["trailing_7d_aov"])
    assert route == "live+grain:daily_segment", route
    live = engine._compiler.compile(
        MetricQuery(mv.spec, ("market_segment",), ("trailing_7d_aov",))
    )
    assert _rows(df) == _rows(live)


def test_sliced_window_picks_rollup_covering_slice_dim(engine):
    """WHERE order_status='F': daily_segment lacks order_status so the
    provider must use daily_seg_status (covers grain + slice dims)."""
    mv = engine.metric_view("mv_wgrain")
    df, route = mv.query_routed(
        ["market_segment"], ["trailing_7d_revenue"], where="order_status = 'F'"
    )
    assert route == "live+grain:daily_seg_status", route
    live = engine._compiler.compile(
        MetricQuery(
            mv.spec, ("market_segment",), ("trailing_7d_revenue",),
            where="order_status = 'F'",
        )
    )
    assert _rows(df) == _rows(live)


def test_sliced_avg_window_falls_back_to_source(engine):
    """trailing_7d_aov needs (sum,count) partials; daily_seg_status only
    stores total_revenue, daily_segment lacks the slice dim → no rollup
    qualifies, grain comes from the source (plain 'live' route)."""
    mv = engine.metric_view("mv_wgrain")
    df, route = mv.query_routed(
        ["market_segment"], ["trailing_7d_aov"], where="order_status = 'O'"
    )
    assert route == "live", route
    live = engine._compiler.compile(
        MetricQuery(
            mv.spec, ("market_segment",), ("trailing_7d_aov",),
            where="order_status = 'O'",
        )
    )
    assert _rows(df) == _rows(live)


def test_shared_multi_window_grain_from_rollup(engine):
    """Two co-ordered window measures share ONE grain — served once from
    the rollup (provider consulted once per shared group)."""
    mv = engine.metric_view("mv_wgrain")
    df, route = mv.query_routed(
        ["market_segment"], ["trailing_7d_revenue", "cumulative_revenue"]
    )
    assert route == "live+grain:daily_segment", route
    live = engine._compiler.compile(
        MetricQuery(
            mv.spec, ("market_segment",),
            ("trailing_7d_revenue", "cumulative_revenue"),
        )
    )
    assert _rows(df) == _rows(live)


def test_grain_vs_duck_oracle(engine, duck):
    from .conftest import assert_df_matches_oracle

    mv = engine.metric_view("mv_wgrain")
    df, route = mv.query_routed(["market_segment"], ["trailing_7d_revenue"])
    assert "grain:" in route
    assert_df_matches_oracle(
        df,
        duck,
        """
        WITH fct AS (
            SELECT o.o_totalprice AS total_price,
                   CAST(o.o_orderdate AS DATE) AS order_date,
                   c.c_mktsegment AS market_segment
            FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        ),
        grain AS (
            SELECT market_segment, order_date, sum(total_price) AS rev
            FROM fct GROUP BY 1, 2
        ),
        win AS (
            SELECT market_segment, order_date,
                   sum(rev) OVER (PARTITION BY market_segment ORDER BY order_date
                       RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW) AS w
            FROM grain
        )
        SELECT market_segment, arg_max(w, order_date) AS trailing_7d_revenue
        FROM win GROUP BY 1
        """,
    )


def test_calendar_trailing_grain_from_rollup(engine):
    """The calendar-unit trailing path (range self-join over the grain)
    also takes its grain from a covering rollup."""
    mv = engine.metric_view("mv_wgrain")
    df, route = mv.query_routed(["market_segment"], ["t1m_revenue"])
    assert route == "live+grain:daily_segment", route
    live = engine._compiler.compile(
        MetricQuery(mv.spec, ("market_segment",), ("t1m_revenue",))
    )
    assert _rows(df) == _rows(live)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "fct_orders" not in plan, plan[:2000]

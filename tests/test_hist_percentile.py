"""Routable approximate percentile via histogram partials
(functions/histogram.py): expansion, routed ≡ live ≡ DuckDB, accuracy
within one bucket width, incremental fold, and window integration.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_databricks_metrics_spark.engine import MetricEngine
from dbt_databricks_metrics_spark.functions.histogram import (
    expand_pseudo_aggregates,
    hist_percentile_sql,
)
from dbt_databricks_metrics_spark.models import ModelRegistry
from dbt_databricks_metrics_spark.sources import load_table
from dbt_databricks_metrics_spark.specs import MetricViewSpec

SPEC = """
version: 0.1
source: __SOURCE__

dimensions:
  - name: order_status
    expr: o_orderstatus

measures:
  - name: p50_price
    expr: hist_percentile(o_totalprice, 0.5, 0.0, 600000.0, 16)
  - name: p90_price
    expr: hist_percentile(o_totalprice, 0.9, 0.0, 600000.0, 16)
  - name: n
    expr: count(*)

materialization:
  schedule: every 6 hours
  mode: relaxed
  materialized_views:
    - name: price_hist_by_status
      type: aggregated
      dimensions:
        - order_status
      measures:
        - p50_price
        - p90_price
        - n
"""


@pytest.fixture(scope="module")
def engine(spark, sf_dir, tmp_path_factory):
    reg = ModelRegistry()

    @reg.model("orders_raw", materialized="view")
    def orders_raw(spark_, ref):
        return load_table(spark_, sf_dir, "orders")

    eng = MetricEngine(spark, reg, warehouse_dir=str(tmp_path_factory.mktemp("whh")))
    eng.run()
    eng.register(MetricViewSpec.from_yaml(SPEC, name="mv_hist", source="orders_raw"))
    eng.refresh("mv_hist")
    return eng


def test_expansion_contains_only_standard_aggregates(engine):
    expr = engine.metric_view("mv_hist").spec.measure("p50_price").expr
    assert "hist_percentile" not in expr and "count_if" in expr


def test_expand_validates():
    with pytest.raises(ValueError, match="needs"):
        expand_pseudo_aggregates("hist_percentile(x, 0.5)")
    with pytest.raises(ValueError, match="p must be"):
        hist_percentile_sql("x", 1.5, 0, 1, 4)
    with pytest.raises(ValueError, match="hi > lo"):
        hist_percentile_sql("x", 0.5, 1, 1, 4)
    with pytest.raises(ValueError, match="buckets"):
        hist_percentile_sql("x", 0.5, 0, 1, 100)


def test_routed_equals_live_equals_duckdb(engine, duck):
    mv = engine.metric_view("mv_hist")
    routed, route = mv.query_routed(["order_status"], ["p50_price", "p90_price", "n"])
    assert route == "rollup:price_hist_by_status", route
    live, live_route = mv.query_routed([], ["p50_price"])  # global: re-agg partials
    p50 = hist_percentile_sql("o_totalprice", 0.5, 0.0, 600000.0, 16)
    p90 = hist_percentile_sql("o_totalprice", 0.9, 0.0, 600000.0, 16)
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in duck.execute(
            f"SELECT o_orderstatus, {p50}, {p90}, count(*) FROM orders GROUP BY 1"
        ).fetchall()
    }
    got = {r["order_status"]: (r["p50_price"], r["p90_price"], r["n"]) for r in routed.collect()}
    assert set(got) == set(want)
    for k, (a50, a90, n) in got.items():
        w50, w90, wn = want[k]
        assert n == wn
        assert a50 == pytest.approx(w50, rel=1e-9)
        assert a90 == pytest.approx(w90, rel=1e-9)
    g = live.collect()[0]["p50_price"]
    w = duck.execute(f"SELECT {p50} FROM orders").fetchone()[0]
    assert g == pytest.approx(w, rel=1e-9)


def test_accuracy_within_bucket_width(engine, duck):
    mv = engine.metric_view("mv_hist")
    df, _ = mv.query_routed(["order_status"], ["p50_price"])
    exact = {
        r[0]: r[1]
        for r in duck.execute(
            "SELECT o_orderstatus, quantile_cont(o_totalprice, 0.5) FROM orders GROUP BY 1"
        ).fetchall()
    }
    width = 600000.0 / 16
    for r in df.collect():
        assert abs(r["p50_price"] - exact[r["order_status"]]) <= width


def test_incremental_fold_preserves_percentiles(engine, spark, sf_dir):
    """Histogram partials are sums — folding a delta must equal a full
    rebuild (the routable-percentile payoff for incremental refresh)."""
    orders = load_table(spark, sf_dir, "orders")
    lo = orders.filter(F.col("o_orderkey") % 5 != 0)
    delta = orders.filter(F.col("o_orderkey") % 5 == 0)

    reg = ModelRegistry()

    @reg.model("orders_raw", materialized="view")
    def orders_raw(spark_, ref):
        return lo

    import tempfile

    eng = MetricEngine(spark, reg, warehouse_dir=tempfile.mkdtemp())
    eng.run()
    eng.register(MetricViewSpec.from_yaml(SPEC, name="mv_hist2", source="orders_raw"))
    eng.refresh("mv_hist2")
    eng.refresh_incremental("mv_hist2", delta)
    folded, route = eng.metric_view("mv_hist2").query_routed(
        ["order_status"], ["p50_price", "n"]
    )
    assert route.startswith("rollup:")
    full = {
        r["order_status"]: (r["p50_price"], r["n"])
        for r in engine.metric_view("mv_hist").query(["order_status"], ["p50_price", "n"]).collect()
    }
    got = {r["order_status"]: (r["p50_price"], r["n"]) for r in folded.collect()}
    assert got == full


def test_windowed_hist_percentile(engine, duck):
    """Trailing-7d p50: bucket partials pre-aggregate to the (status,
    date) grain and SUM over the range frame — oracle replays the same
    decomposition with DuckDB window sums."""
    from dbt_databricks_metrics_spark.functions.aggregates import decompose_aggregate

    wspec = MetricViewSpec.from_yaml(
        """
version: 0.1
source: __SOURCE__
dimensions:
  - name: order_status
    expr: o_orderstatus
  - name: order_date
    expr: cast(o_orderdate as date)
measures:
  - name: t7_p50
    expr: hist_percentile(o_totalprice, 0.5, 0.0, 600000.0, 16)
    window:
      - order: order_date
        range: trailing 7 day
        semiadditive: last
""",
        name="mv_histw",
        source="orders_raw",
    )
    engine.register(wspec)
    df = engine.metric_view("mv_histw").query(["order_status"], ["t7_p50"])
    got = {r["order_status"]: r["t7_p50"] for r in df.collect()}

    dec = decompose_aggregate(wspec.measure("t7_p50").expr, prefix="_h")
    grain_cols = ", ".join(f"{e} AS {c}" for e, c in dec.partials)
    win_cols = ", ".join(
        f"sum({c}) OVER (PARTITION BY s ORDER BY d "
        f"RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW) AS {c}"
        for _, c in dec.partials
    )
    want = {
        r[0]: r[1]
        for r in duck.execute(
            f"""
            WITH grain AS (
                SELECT o_orderstatus AS s, cast(o_orderdate AS date) AS d, {grain_cols}
                FROM orders GROUP BY 1, 2
            ),
            win AS (SELECT s, d, {win_cols} FROM grain)
            SELECT s, arg_max({dec.finalize}, d) AS t7_p50 FROM win GROUP BY 1
            """
        ).fetchall()
    }
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, rel=1e-9)

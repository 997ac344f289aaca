"""Approximate-sketch measures flow through MEASURE() untouched (the
compiler passes any aggregate expr to Catalyst): HLL distinct counts and
approximate percentiles, checked against exact values with sketch-level
tolerance. These cannot be DuckDB-oracle'd (different sketches) — the
bound-based checks here are their correctness story."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_databricks_metrics_spark.engine import MetricEngine
from dbt_databricks_metrics_spark.project import build_registry
from dbt_databricks_metrics_spark.specs import MetricViewSpec

SPEC = """
version: 0.1
source: fct_orders
dimensions:
  - name: order_status
    expr: order_status
measures:
  - name: approx_customers
    expr: approx_count_distinct(customer_id)
  - name: exact_customers
    expr: count(distinct customer_id)
  - name: p50_price
    expr: percentile_approx(total_price, 0.5)
  - name: p99_price
    expr: percentile_approx(total_price, 0.99)
"""


@pytest.fixture(scope="module")
def engine(spark, sf_dir, tmp_path_factory):
    eng = MetricEngine(
        spark, build_registry(sf_dir), warehouse_dir=str(tmp_path_factory.mktemp("wha"))
    )
    eng.run()
    eng.register(MetricViewSpec.from_yaml(SPEC, name="mv_approx"))
    return eng


def test_hll_within_tolerance(engine):
    mv = engine.metric_view("mv_approx")
    rows = mv.query(["order_status"], ["approx_customers", "exact_customers"]).collect()
    for r in rows:
        rel_err = abs(r["approx_customers"] - r["exact_customers"]) / r["exact_customers"]
        assert rel_err < 0.1, r  # HLL default rsd=0.05


def test_percentiles_ordered_and_bounded(engine):
    mv = engine.metric_view("mv_approx")
    rows = mv.query(["order_status"], ["p50_price", "p99_price"]).collect()
    fct = engine.ref("fct_orders")
    bounds = {
        r["order_status"]: (r["mn"], r["mx"])
        for r in fct.groupBy("order_status")
        .agg(F.min("total_price").alias("mn"), F.max("total_price").alias("mx"))
        .collect()
    }
    for r in rows:
        mn, mx = bounds[r["order_status"]]
        assert mn <= r["p50_price"] <= r["p99_price"] <= mx


def test_sketch_measures_not_materializable(engine):
    """approx sketches don't decompose into our partial states — rollup
    declaration must be rejected, live queries must work (same contract
    as count(distinct))."""
    from dbt_databricks_metrics_spark.plans.compiler import QueryError

    spec = MetricViewSpec.from_yaml(
        """
version: 0.1
source: fct_orders
dimensions:
  - name: order_status
    expr: order_status
measures:
  - name: ac
    expr: approx_count_distinct(customer_id)
materialization:
  materialized_views:
    - name: r
      type: aggregated
      dimensions: [order_status]
      measures: [ac]
""",
        name="mv_approx_bad",
    )
    engine.register(spec)
    with pytest.raises(QueryError, match="decomposable"):
        engine.refresh("mv_approx_bad")

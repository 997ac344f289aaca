"""Lifecycle operators (SURVEY §2.7 O1-O6): selective runs, spec-from-meta
modes, refresh-all, error paths."""

from __future__ import annotations

import pytest

from dbt_databricks_metrics_spark.engine import MetricEngine
from dbt_databricks_metrics_spark.models import ModelError, ModelRegistry
from dbt_databricks_metrics_spark.project import build_registry
from dbt_databricks_metrics_spark.specs import MetricViewSpec


def test_run_select_builds_upstream_only(spark, sf_dir, tmp_path):
    eng = MetricEngine(spark, build_registry(sf_dir), warehouse_dir=str(tmp_path))
    built = eng._runner.run(select=["fct_orders"])
    assert set(built) == {"stg_orders", "stg_customers", "fct_orders"}
    with pytest.raises(ModelError, match="before it was built"):
        eng.ref("fct_customer_summary")


def test_cycle_detection():
    reg = ModelRegistry()

    @reg.model("a", deps=["b"])
    def a(spark, ref):
        raise AssertionError

    @reg.model("b", deps=["a"])
    def b(spark, ref):
        raise AssertionError

    with pytest.raises(ModelError, match="cycle"):
        reg.topo_order()


def test_unknown_dep_rejected():
    reg = ModelRegistry()

    @reg.model("a", deps=["ghost"])
    def a(spark, ref):
        raise AssertionError

    with pytest.raises(ModelError, match="unknown model"):
        reg.topo_order()


def test_structured_meta_mode(spark, sf_dir, tmp_path):
    """Engine accepts structured (non-YAML) metric_view meta — the second
    input mode of generate_metric_views.sql:45-76."""
    reg = build_registry(sf_dir)
    eng = MetricEngine(spark, reg, warehouse_dir=str(tmp_path))
    eng.run()
    spec = eng._spec_from_meta(
        "fct_orders",
        {
            "enabled": True,
            "name": "mv_structured",
            "dimensions": [{"name": "order_status"}],
            "measures": [{"name": "n", "expr": "count(*)"}],
        },
    )
    assert spec.version == "0.1"
    assert spec.dimension("order_status").expr == "order_status"
    mv = eng.register(spec)
    assert mv.query(["order_status"], ["n"]).count() > 0


def test_rollup_of_nondecomposable_measure_rejected(spark, sf_dir, tmp_path):
    from dbt_databricks_metrics_spark.plans.compiler import QueryError

    eng = MetricEngine(spark, build_registry(sf_dir), warehouse_dir=str(tmp_path))
    eng.run()
    spec = MetricViewSpec.from_yaml(
        """
version: 0.1
source: fct_orders
dimensions:
  - name: order_status
    expr: order_status
measures:
  - name: uniq_customers
    expr: count(distinct customer_id)
materialization:
  materialized_views:
    - name: bad
      type: aggregated
      dimensions: [order_status]
      measures: [uniq_customers]
""",
        name="mv_bad_rollup",
    )
    eng.register(spec)
    with pytest.raises(QueryError, match="not\\s+decomposable|not .*decomposable"):
        eng.refresh("mv_bad_rollup")


def test_distinct_measure_works_live(spark, sf_dir, tmp_path):
    """count(distinct) can't be materialized but must work as a live
    MEASURE()."""
    eng = MetricEngine(spark, build_registry(sf_dir), warehouse_dir=str(tmp_path))
    eng.run()
    spec = MetricViewSpec.from_yaml(
        """
version: 0.1
source: fct_orders
dimensions:
  - name: order_status
    expr: order_status
measures:
  - name: uniq_customers
    expr: count(distinct customer_id)
""",
        name="mv_distinct",
    )
    mv = eng.register(spec)
    rows = {r["order_status"]: r["uniq_customers"] for r in mv.query(["order_status"], ["uniq_customers"]).collect()}
    assert all(v > 0 for v in rows.values())


def test_refresh_all(spark, sf_dir, tmp_path):
    eng = MetricEngine(spark, build_registry(sf_dir), warehouse_dir=str(tmp_path))
    eng.run()
    eng.refresh_all()
    for name in ("mv_orders_simple", "mv_order_metrics"):
        assert eng.catalog.get(name).state is not None
    # mv_customer_metrics declares no materialization → no state
    assert eng.catalog.get("mv_customer_metrics").state is None


def test_write_catalog_artifact(spark, sf_dir, tmp_path_factory):
    """docs-generate catalog: built models carry column schemas, metric
    views carry the v1.1 semantic metadata; round-trips through JSON."""
    import json
    import tempfile

    from dbt_databricks_metrics_spark.engine import MetricEngine
    from dbt_databricks_metrics_spark.project import build_registry

    eng = MetricEngine(
        spark, build_registry(sf_dir), warehouse_dir=tempfile.mkdtemp("cat_wh_")
    )
    eng.run()
    path = str(tmp_path_factory.mktemp("docs") / "catalog.json")
    eng.write_catalog(path)
    cat = json.load(open(path))
    fct = cat["models"]["fct_orders"]
    assert fct["materialized"] == "table"
    assert {"name": "order_year", "type": "int"} in fct["columns"]
    assert "stg_orders" in fct["depends_on"]
    mv = cat["metric_views"]["mv_customer_metrics"]
    assert any(m["name"] == "avg_customer_value" and m["display_name"]
               for m in mv["measures"])
    assert any("segment" in d["synonyms"] for d in mv["dimensions"])
    assert any(m["windowed"] for v in cat["metric_views"].values()
               for m in v["measures"])

"""Derived measures (dbt metrics' calculation_method: derived): a measure
whose expr references sibling MEASURE names, computed post-aggregation and
routed via its dependencies."""

from __future__ import annotations

import pytest

from dbt_databricks_metrics_spark.engine import MetricEngine
from dbt_databricks_metrics_spark.project import build_registry
from dbt_databricks_metrics_spark.specs import MetricViewSpec, SpecError

SPEC_YAML = """
version: 0.1
source: fct_orders
dimensions:
  - name: market_segment
    expr: market_segment
  - name: order_year
    expr: order_year
measures:
  - name: order_count
    expr: count(*)
  - name: revenue_cents
    expr: sum(cast(round(total_price * 100) as bigint))
  - name: aov_cents
    expr: revenue_cents / order_count
    derived: true
materialization:
  materialized_views:
    - name: seg_base
      type: aggregated
      dimensions: [market_segment]
      measures: [order_count, revenue_cents]
"""


@pytest.fixture(scope="module")
def engine(spark, sf_dir, tmp_path_factory):
    eng = MetricEngine(
        spark, build_registry(sf_dir), warehouse_dir=str(tmp_path_factory.mktemp("whd"))
    )
    eng.run()
    eng.register(MetricViewSpec.from_yaml(SPEC_YAML, name="mv_derived"))
    return eng


def test_live_derived_matches_manual(engine):
    mv = engine.metric_view("mv_derived")
    rows = mv.query(
        ["market_segment"], ["order_count", "revenue_cents", "aov_cents"]
    ).collect()
    assert rows
    for r in rows:
        assert r["aov_cents"] == r["revenue_cents"] / r["order_count"]


def test_derived_only_query_drops_dependencies(engine):
    mv = engine.metric_view("mv_derived")
    df = mv.query(["market_segment"], ["aov_cents"])
    assert df.columns == ["market_segment", "aov_cents"]
    assert df.count() > 0


def test_derived_routes_via_dependencies(engine):
    engine.refresh("mv_derived")
    mv = engine.metric_view("mv_derived")
    df, route = mv.query_routed(["market_segment"], ["aov_cents"])
    assert route == "rollup:seg_base", route
    routed = {r["market_segment"]: r["aov_cents"] for r in df.collect()}
    live = {
        r["market_segment"]: r["aov_cents"]
        for r in mv.query(["market_segment"], ["aov_cents"]).collect()
    }
    assert routed == live
    # uncovered dims still fall off the rollup
    _, route2 = mv.query_routed(["order_year"], ["aov_cents"])
    assert not route2.startswith("rollup"), route2


def test_explain_route_matches_query_routed(engine):
    mv = engine.metric_view("mv_derived")
    ex = mv.explain_route(["market_segment"], ["aov_cents"])
    _, route = mv.query_routed(["market_segment"], ["aov_cents"])
    assert ex["route"] == route
    assert "derived" in ex["reason"]


def test_workload_log_records_dependencies(engine):
    mv = engine.metric_view("mv_derived")
    mv.query_routed(["market_segment"], ["aov_cents"])
    shapes = mv.observed_workload()
    measures = {m for wq in shapes for m in wq.measures}
    assert "aov_cents" not in measures
    assert {"order_count", "revenue_cents"} <= measures


def test_sql_frontend_serves_derived(engine):
    rows = engine.sql(
        "SELECT market_segment, MEASURE(aov_cents) AS aov "
        "FROM mv_derived GROUP BY market_segment"
    ).collect()
    assert rows and all(r["aov"] is not None for r in rows)


def test_spec_rejects_derived_with_windows():
    with pytest.raises(SpecError, match="cannot declare windows"):
        MetricViewSpec.from_yaml(
            """
version: 0.1
source: t
dimensions: [{name: d, expr: d}]
measures:
  - name: base
    expr: sum(x)
  - name: bad
    expr: base / 2
    derived: true
    window:
      - order: d
        range: cumulative
""",
            name="mv_x",
        )


def test_spec_rejects_refless_derived_and_cycles():
    with pytest.raises(SpecError, match="references no sibling"):
        MetricViewSpec.from_yaml(
            """
version: 0.1
source: t
dimensions: [{name: d, expr: d}]
measures:
  - name: base
    expr: sum(x)
  - name: bad
    expr: 1 + 2
    derived: true
""",
            name="mv_x",
        )
    # chains are ALLOWED (r8: dbt's derived metrics compose); only
    # cycles refuse
    spec = MetricViewSpec.from_yaml(
        """
version: 0.1
source: t
dimensions: [{name: d, expr: d}]
measures:
  - name: base
    expr: sum(x)
  - name: d1
    expr: base / 2
    derived: true
  - name: d2
    expr: d1 * 2
    derived: true
""",
        name="mv_x",
    )
    assert spec.measure("d2").derived
    with pytest.raises(SpecError, match="reference cycle"):
        MetricViewSpec.from_yaml(
            """
version: 0.1
source: t
dimensions: [{name: d, expr: d}]
measures:
  - name: base
    expr: sum(x)
  - name: d1
    expr: d2 / 2 + base
    derived: true
  - name: d2
    expr: d1 * 2
    derived: true
""",
            name="mv_x",
        )


CHAIN_SPEC_YAML = """
version: 0.1
source: fct_orders
dimensions:
  - name: market_segment
    expr: market_segment
measures:
  - name: order_count
    expr: count(*)
  - name: revenue_cents
    expr: sum(cast(round(total_price * 100) as bigint))
  - name: aov_cents
    expr: revenue_cents / order_count
    derived: true
  - name: aov_dollars
    expr: aov_cents / 100
    derived: true
materialization:
  materialized_views:
    - name: chain_base
      type: aggregated
      dimensions: [market_segment]
      measures: [order_count, revenue_cents]
"""


@pytest.fixture(scope="module")
def chain_engine(spark, sf_dir, tmp_path_factory):
    eng = MetricEngine(
        spark, build_registry(sf_dir),
        warehouse_dir=str(tmp_path_factory.mktemp("whc")),
    )
    eng.run()
    eng.register(MetricViewSpec.from_yaml(CHAIN_SPEC_YAML, name="mv_chain"))
    return eng


def test_chained_derived_live(chain_engine):
    """A derived measure referencing another derived measure resolves
    through the dependency-ordered projection (r8; chains)."""
    mv = chain_engine.metric_view("mv_chain")
    rows = mv.query(
        ["market_segment"],
        ["aov_dollars", "aov_cents", "order_count", "revenue_cents"],
    ).collect()
    assert rows
    for r in rows:
        assert r["aov_cents"] == r["revenue_cents"] / r["order_count"]
        assert r["aov_dollars"] == r["aov_cents"] / 100


def test_chained_derived_only_query(chain_engine):
    """Requesting ONLY the chain tail: intermediates and plain leaves
    compute internally and drop from the output."""
    mv = chain_engine.metric_view("mv_chain")
    df = mv.query(["market_segment"], ["aov_dollars"])
    assert df.columns == ["market_segment", "aov_dollars"]
    live = {r["market_segment"]: r["aov_dollars"] for r in df.collect()}
    full = {
        r["market_segment"]: r["revenue_cents"] / r["order_count"] / 100
        for r in mv.query(
            ["market_segment"], ["order_count", "revenue_cents"]
        ).collect()
    }
    assert live == full


def test_chained_derived_routes_via_plain_leaves(chain_engine):
    """Routing keys off the TRANSITIVE plain dependencies, so the chain
    tail is rollup-served whenever the leaves are covered."""
    chain_engine.refresh("mv_chain")
    mv = chain_engine.metric_view("mv_chain")
    df, route = mv.query_routed(["market_segment"], ["aov_dollars"])
    assert route == "rollup:chain_base", route
    routed = {r["market_segment"]: r["aov_dollars"] for r in df.collect()}
    live = {
        r["market_segment"]: r["aov_dollars"]
        for r in mv.query(["market_segment"], ["aov_dollars"]).collect()
    }
    assert routed == live


def test_spec_rejects_materializing_derived():
    with pytest.raises(SpecError, match="cannot\\s+be materialized"):
        MetricViewSpec.from_yaml(
            """
version: 0.1
source: t
dimensions: [{name: d, expr: d}]
measures:
  - name: base
    expr: sum(x)
  - name: ratio
    expr: base / 2
    derived: true
materialization:
  materialized_views:
    - name: r1
      type: aggregated
      dimensions: [d]
      measures: [ratio]
""",
            name="mv_x",
        )


def test_derived_yaml_roundtrip_and_describe():
    spec = MetricViewSpec.from_yaml(SPEC_YAML, name="mv_rt")
    import yaml as _yaml

    doc = spec.to_yaml_doc()
    back = MetricViewSpec.from_yaml(
        _yaml.safe_dump(doc, sort_keys=False), name="mv_rt"
    )
    assert back.measure("aov_cents").derived is True
    assert back == spec
    desc = spec.describe()
    flags = {m["name"]: m["derived"] for m in desc["measures"]}
    assert flags == {
        "order_count": False, "revenue_cents": False, "aov_cents": True,
    }

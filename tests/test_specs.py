"""Spec parsing unit tests — raw-YAML and structured modes, defaulting
rules of macros/generate_metric_views.sql:40-76, validation errors."""

from __future__ import annotations

import pytest

from dbt_databricks_metrics_spark.specs import (
    MetricViewSpec,
    SpecError,
    WindowClause,
)
from dbt_databricks_metrics_spark.project import (
    MV_CUSTOMER_METRICS_YAML,
    MV_ORDER_METRICS_YAML,
    MV_ORDERS_SIMPLE_YAML,
)


def test_raw_yaml_source_substitution():
    spec = MetricViewSpec.from_yaml(
        MV_ORDERS_SIMPLE_YAML, name="mv_orders_simple", source="stg_orders"
    )
    assert spec.source == "stg_orders"
    assert spec.version == "0.1"
    assert spec.dimension_names == ("order_status", "order_priority", "order_date")
    assert spec.measure_names == ("order_count", "total_revenue", "avg_order_value")
    mat = spec.materialization
    assert mat is not None and mat.schedule == "every 8 weeks" and mat.mode == "relaxed"
    assert [r.name for r in mat.materialized_views] == ["baseline", "orders_by_status"]
    assert mat.materialized_views[0].type == "unaggregated"
    assert mat.materialized_views[1].dimensions == ("order_status",)


def test_unresolved_source_placeholder_rejected():
    with pytest.raises(SpecError, match="__SOURCE__"):
        MetricViewSpec.from_yaml(MV_ORDERS_SIMPLE_YAML, name="x")


def test_window_measures_parsed():
    spec = MetricViewSpec.from_yaml(
        MV_ORDER_METRICS_YAML, name="mv_order_metrics", source="fct_orders"
    )
    t7 = spec.measure("trailing_7d_revenue")
    assert t7.is_windowed
    w = t7.windows[0]
    assert w.kind == "trailing" and w.trailing_parts == (7, "day")
    assert w.order == "order_date" and w.semiadditive == "last"
    cum = spec.measure("cumulative_revenue").windows[0]
    assert cum.kind == "cumulative"


def test_v11_semantic_metadata():
    spec = MetricViewSpec.from_yaml(
        MV_CUSTOMER_METRICS_YAML, name="mv_customer_metrics", source="fct_customer_summary"
    )
    assert spec.version == "1.1"
    seg = spec.dimension("market_segment")
    assert seg.display_name == "Market Segment"
    assert "segment" in seg.synonyms
    rev = spec.measure("total_revenue")
    assert rev.format and rev.format.type == "currency" and rev.format.currency_code == "USD"
    d = spec.describe()
    assert d["measures"][1]["format"]["currency_code"] == "USD"


def test_structured_mode_defaults():
    spec = MetricViewSpec.from_structured(
        {
            "dimensions": [{"name": "seg"}, {"name": "yr", "expr": "year(order_date)"}],
            "measures": [{"name": "n", "expr": "count(*)"}],
            "filter": "order_status = 'F'",
        },
        name="mv_x",
        source="fct_orders",
    )
    assert spec.version == "0.1"  # default (generate_metric_views.sql:49)
    assert spec.dimension("seg").expr == "seg"  # expr defaults to name (:61-62)
    assert spec.dimension("yr").expr == "year(order_date)"
    assert spec.filter == "order_status = 'F'"


def test_validation_errors():
    with pytest.raises(SpecError, match="duplicate"):
        MetricViewSpec(
            name="x",
            source="s",
            dimensions=(),
            measures=(
                __import__(
                    "dbt_databricks_metrics_spark.specs", fromlist=["Measure"]
                ).Measure(name="a", expr="count(*)"),
            )
            * 2,
        )
    with pytest.raises(SpecError, match="not a declared dimension"):
        MetricViewSpec.from_yaml(
            """
version: 0.1
source: t
measures:
  - name: m
    expr: sum(x)
    window:
      - order: missing_dim
        range: cumulative
""",
            name="x",
        )
    with pytest.raises(SpecError, match="unsupported window range"):
        WindowClause.from_dict({"order": "d", "range": "sliding 3 day"})
    # window measures can never be materialized (README.md:431)
    with pytest.raises(SpecError, match="cannot be materialized"):
        MetricViewSpec.from_yaml(
            """
version: 0.1
source: t
dimensions:
  - name: d
    expr: d
measures:
  - name: m
    expr: sum(x)
    window:
      - order: d
        range: cumulative
materialization:
  materialized_views:
    - name: r
      type: aggregated
      dimensions: [d]
      measures: [m]
""",
            name="x",
        )


def test_describe_roundtrip():
    spec = MetricViewSpec.from_yaml(
        MV_ORDER_METRICS_YAML, name="mv_order_metrics", source="fct_orders"
    )
    d = spec.describe()
    assert d["name"] == "mv_order_metrics"
    assert len(d["dimensions"]) == 6 and len(d["measures"]) == 8
    assert [r["name"] for r in d["materialized_views"]] == [
        "baseline",
        "revenue_by_segment",
        "monthly_revenue",
        "daily_revenue",
    ]


def test_yaml_roundtrip_all_project_specs():
    """spec → YAML doc → spec must be identity for every project spec
    (catalog save/load contract)."""
    import yaml as _yaml

    from dbt_databricks_metrics_spark.specs import spec_to_yaml_doc

    from dbt_databricks_metrics_spark.project import (
        MV_LINEITEM_PRICING_YAML,
        MV_SALES_STAR_YAML,
    )

    for name, text, src in [
        ("mv_orders_simple", MV_ORDERS_SIMPLE_YAML, "stg_orders"),
        ("mv_order_metrics", MV_ORDER_METRICS_YAML, "fct_orders"),
        ("mv_customer_metrics", MV_CUSTOMER_METRICS_YAML, "fct_customer_summary"),
        ("mv_lineitem_pricing", MV_LINEITEM_PRICING_YAML, "stg_lineitem"),
        # 4-level nested joins must survive serialization
        ("mv_sales_star", MV_SALES_STAR_YAML, "stg_lineitem"),
    ]:
        spec = MetricViewSpec.from_yaml(text, name=name, source=src, description="d")
        doc = spec_to_yaml_doc(spec)
        back = MetricViewSpec.from_yaml(_yaml.safe_dump(doc, sort_keys=False), name=name)
        assert back == spec, name


def test_catalog_save_load(tmp_path):
    from dbt_databricks_metrics_spark.catalog import MetricViewCatalog

    cat = MetricViewCatalog()
    spec = MetricViewSpec.from_yaml(
        MV_ORDER_METRICS_YAML, name="mv_order_metrics", source="fct_orders"
    )
    rv = cat.register(spec)
    rv.state = object()  # pretend materialized
    paths = cat.save(str(tmp_path))
    assert len(paths) == 1

    cat2 = MetricViewCatalog()
    loaded = cat2.load(str(tmp_path))
    assert loaded == ["mv_order_metrics"]
    assert cat2.get("mv_order_metrics").spec == spec

    # CREATE OR REPLACE on reload of the UNCHANGED spec preserves state
    cat.load(str(tmp_path))
    assert cat.get("mv_order_metrics").state is rv.state


def test_measure_refs_ignores_names_inside_string_literals():
    """ADVICE r4: a sibling measure name inside a quoted literal is NOT a
    dependency — the identifier scan runs over a literal-blanked expr."""
    from dbt_databricks_metrics_spark.specs import Measure, MetricViewSpec

    spec = MetricViewSpec(
        name="mv_lit",
        source="t",
        dimensions=(),
        measures=(
            Measure(name="revenue_cents", expr="sum(c)"),
            Measure(name="order_count", expr="count(*)"),
            Measure(
                name="labeled",
                expr=(
                    "case when order_count > 0 then 'revenue_cents' "
                    "else 'none' end"
                ),
                derived=True,
            ),
        ),
    )
    # only the real identifier reference survives; the quoted
    # 'revenue_cents' literal is not a phantom dependency
    assert spec.measure_refs("labeled") == ("order_count",)

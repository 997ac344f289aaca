"""Declared star/snowflake joins (J3-J4, README.md:282-300).

A metric view's `joins:` block attaches dimension tables to the source at
query time; dimensions address join columns via alias paths, snowflake
hops nest (`customer.nation.name` → leaf alias).
"""

from __future__ import annotations

import pytest

from dbt_databricks_metrics_spark.engine import MetricEngine
from dbt_databricks_metrics_spark.project import build_registry
from dbt_databricks_metrics_spark.sources import register_tables
from dbt_databricks_metrics_spark.specs import MetricViewSpec

from .conftest import assert_df_matches_oracle
from .test_engine_e2e import STG_ORDERS_SQL

STAR_SPEC = """
version: 0.1
source: stg_orders
joins:
  - name: customer
    source: stg_customers
    on: source.customer_id = customer.customer_id
dimensions:
  - name: market_segment
    expr: customer.market_segment
  - name: order_status
    expr: order_status
measures:
  - name: total_revenue
    expr: sum(total_price)
  - name: total_orders
    expr: count(*)
"""

SNOWFLAKE_SPEC = """
version: 0.1
source: stg_orders
joins:
  - name: customer
    source: stg_customers
    on: source.customer_id = customer.customer_id
    joins:
      - name: nation
        source: nation
        on: customer.nation_id = nation.n_nationkey
dimensions:
  - name: nation_name
    expr: customer.nation.n_name
  - name: market_segment
    expr: customer.market_segment
measures:
  - name: total_revenue
    expr: sum(total_price)
  - name: total_orders
    expr: count(*)
"""

_STG_CUSTOMERS_SQL = """
    SELECT c_custkey AS customer_id, c_name AS customer_name,
           c_nationkey AS nation_id, c_acctbal AS account_balance,
           c_mktsegment AS market_segment FROM customer
"""


@pytest.fixture(scope="module")
def engine(spark, sf_dir, tmp_path_factory):
    register_tables(spark, sf_dir)
    eng = MetricEngine(
        spark,
        build_registry(sf_dir),
        warehouse_dir=str(tmp_path_factory.mktemp("whj")),
    )
    eng.run()
    eng.register(MetricViewSpec.from_yaml(STAR_SPEC, name="mv_star"))
    eng.register(MetricViewSpec.from_yaml(SNOWFLAKE_SPEC, name="mv_snow"))
    return eng


def test_star_join_query(engine, duck):
    df = engine.metric_view("mv_star").query(
        dimensions=["market_segment", "order_status"],
        measures=["total_revenue", "total_orders"],
    )
    assert_df_matches_oracle(
        df,
        duck,
        f"""
        SELECT c.market_segment, o.order_status,
               sum(o.total_price) AS total_revenue, count(*) AS total_orders
        FROM ({STG_ORDERS_SQL}) o
        LEFT JOIN ({_STG_CUSTOMERS_SQL}) c ON o.customer_id = c.customer_id
        GROUP BY 1, 2
        """,
    )


def test_snowflake_join_path_dimension(engine, duck):
    df = engine.metric_view("mv_snow").query(
        dimensions=["nation_name"], measures=["total_revenue", "total_orders"]
    )
    assert_df_matches_oracle(
        df,
        duck,
        f"""
        SELECT n.n_name AS nation_name,
               sum(o.total_price) AS total_revenue, count(*) AS total_orders
        FROM ({STG_ORDERS_SQL}) o
        LEFT JOIN ({_STG_CUSTOMERS_SQL}) c ON o.customer_id = c.customer_id
        LEFT JOIN nation n ON c.nation_id = n.n_nationkey
        GROUP BY 1
        """,
    )


def test_snowflake_mixed_levels(engine, duck):
    df = engine.metric_view("mv_snow").query(
        dimensions=["nation_name", "market_segment"], measures=["total_orders"]
    )
    assert_df_matches_oracle(
        df,
        duck,
        f"""
        SELECT n.n_name AS nation_name, c.market_segment, count(*) AS total_orders
        FROM ({STG_ORDERS_SQL}) o
        LEFT JOIN ({_STG_CUSTOMERS_SQL}) c ON o.customer_id = c.customer_id
        LEFT JOIN nation n ON c.nation_id = n.n_nationkey
        GROUP BY 1, 2
        """,
    )


def test_join_is_broadcast(engine):
    """Small dimension side should compile to a broadcast join — no
    shuffle of the fact table for the join (100 TB posture)."""
    df = engine.metric_view("mv_star").query(
        dimensions=["market_segment"], measures=["total_revenue"]
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan[:2000]


def test_rollup_over_joined_spec(engine, spark):
    """Aggregated rollups built from a joined source: routed result must
    equal the live join+aggregate."""
    spec = MetricViewSpec.from_yaml(
        """
version: 0.1
source: stg_orders
joins:
  - name: customer
    source: stg_customers
    on: source.customer_id = customer.customer_id
dimensions:
  - name: market_segment
    expr: customer.market_segment
  - name: order_status
    expr: order_status
measures:
  - name: total_revenue
    expr: sum(total_price)
  - name: total_orders
    expr: count(*)
materialization:
  materialized_views:
    - name: seg_status
      type: aggregated
      dimensions: [market_segment, order_status]
      measures: [total_revenue, total_orders]
""",
        name="mv_join_rollup",
    )
    mv = engine.register(spec)
    engine.refresh("mv_join_rollup")
    routed, route = mv.query_routed(["market_segment"], ["total_revenue", "total_orders"])
    assert route == "rollup:seg_status"
    from dbt_databricks_metrics_spark.plans.compiler import MetricQuery

    live = engine._compiler.compile(
        MetricQuery(spec, ("market_segment",), ("total_revenue", "total_orders"))
    )
    import math

    def rows(df):
        out = []
        for r in sorted(df.collect(), key=lambda x: str(x[0])):
            out.append((r[0], round(r[1], 4), r[2]))
        return out

    assert rows(routed) == rows(live)

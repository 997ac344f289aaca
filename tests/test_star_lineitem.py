"""Big-fact surface: TPC-H Q1-style pricing metric view over lineitem and
the 4-level snowflake star (lineitem → orders → customer → nation → region).

The reference runs on `samples.tpch` (README.md:452) where LINEITEM is the
dominant fact; these tests exercise the same spec grammar
(README.md:143-353, nested joins README.md:290-299) at the scale-critical
table. Routing invariant: rollup-served ≡ live (SURVEY §4).
"""

from __future__ import annotations

import pytest

from dbt_databricks_metrics_spark.engine import MetricEngine
from dbt_databricks_metrics_spark.project import build_registry

from .conftest import assert_df_matches_oracle

_STG_LINEITEM = """
    SELECT l_orderkey AS order_id, l_partkey AS part_id,
           l_suppkey AS supplier_id, l_quantity AS quantity,
           l_extendedprice AS extended_price, l_discount AS discount,
           l_tax AS tax, l_returnflag AS return_flag,
           l_linestatus AS line_status, CAST(l_shipdate AS DATE) AS ship_date
    FROM lineitem
"""


@pytest.fixture(scope="module")
def engine(spark, sf_dir, tmp_path_factory):
    eng = MetricEngine(
        spark,
        build_registry(sf_dir),
        warehouse_dir=str(tmp_path_factory.mktemp("wh_star")),
    )
    eng.run(materialize_rollups=True)
    return eng


def test_pricing_summary_matches_oracle(engine, duck):
    df = engine.metric_view("mv_lineitem_pricing").query(
        dimensions=["return_flag", "line_status"],
        measures=[
            "sum_qty", "sum_base_price", "sum_disc_price", "sum_charge",
            "avg_qty", "avg_price", "avg_disc", "count_order",
        ],
    )
    assert_df_matches_oracle(
        df,
        duck,
        f"""
        SELECT return_flag, line_status,
               sum(quantity) AS sum_qty,
               sum(extended_price) AS sum_base_price,
               sum(extended_price * (1 - discount)) AS sum_disc_price,
               sum(extended_price * (1 - discount) * (1 + tax)) AS sum_charge,
               avg(quantity) AS avg_qty,
               avg(extended_price) AS avg_price,
               avg(discount) AS avg_disc,
               count(*) AS count_order
        FROM ({_STG_LINEITEM})
        WHERE ship_date <= DATE '2001-09-02'
        GROUP BY 1, 2
        """,
    )


def test_pricing_routes_to_rollup_and_matches_live(engine):
    mv = engine.metric_view("mv_lineitem_pricing")
    measures = ["sum_qty", "sum_disc_price", "avg_price", "avg_disc", "count_order"]
    routed, route = mv.query_routed(["return_flag", "line_status"], measures)
    assert route == "rollup:pricing_by_flag_status", route
    # rollup ≡ direct aggregation over the filtered source
    from dbt_databricks_metrics_spark.plans.compiler import MetricQuery

    live = engine._compiler.compile(
        MetricQuery(mv.spec, ("return_flag", "line_status"), tuple(measures))
    )
    r = {tuple(x[:2]): x[2:] for x in sorted(map(tuple, routed.collect()))}
    l = {tuple(x[:2]): x[2:] for x in sorted(map(tuple, live.collect()))}
    assert r.keys() == l.keys()
    for k in r:
        for a, b in zip(r[k], l[k]):
            assert a == pytest.approx(b, rel=1e-9)


def test_monthly_pricing_routes(engine):
    mv = engine.metric_view("mv_lineitem_pricing")
    df, route = mv.query_routed(["ship_year", "ship_month"], ["sum_disc_price", "count_order"])
    assert route == "rollup:pricing_monthly", route
    assert df.count() > 0


def test_star_nation_region_matches_oracle(engine, duck):
    df = engine.metric_view("mv_sales_star").query(
        dimensions=["nation_name", "region_name"],
        measures=["revenue", "line_count", "avg_discount"],
    )
    assert_df_matches_oracle(
        df,
        duck,
        f"""
        SELECT n.n_name AS nation_name, r.r_name AS region_name,
               sum(l.extended_price * (1 - l.discount)) AS revenue,
               count(*) AS line_count,
               avg(l.discount) AS avg_discount
        FROM ({_STG_LINEITEM}) l
        LEFT JOIN orders o ON l.order_id = o.o_orderkey
        LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
        LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY 1, 2
        """,
    )


def test_star_segment_year_matches_oracle(engine, duck):
    df = engine.metric_view("mv_sales_star").query(
        dimensions=["market_segment", "order_year"],
        measures=["revenue", "line_count"],
    )
    assert_df_matches_oracle(
        df,
        duck,
        f"""
        SELECT c.c_mktsegment AS market_segment,
               CAST(year(o.o_orderdate) AS INT) AS order_year,
               sum(l.extended_price * (1 - l.discount)) AS revenue,
               count(*) AS line_count
        FROM ({_STG_LINEITEM}) l
        LEFT JOIN orders o ON l.order_id = o.o_orderkey
        LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
        """,
    )


def test_star_plan_broadcasts_dimensions(engine):
    """Scale posture: the nation/region (and at this SF customer) sides of
    the star must arrive as broadcast joins, not shuffle exchanges."""
    df = engine.metric_view("mv_sales_star").query(
        dimensions=["nation_name", "region_name"], measures=["revenue"]
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_star_brand_measure_from_join_branch(engine, duck):
    """The part branch supplies a measure input (retail_value) as well as a
    dimension — measure exprs may reference joined-alias columns."""
    df = engine.metric_view("mv_sales_star").query(
        dimensions=["part_brand", "return_flag"],
        measures=["revenue", "retail_value", "line_count"],
    )
    assert_df_matches_oracle(
        df,
        duck,
        f"""
        SELECT p.p_brand AS part_brand, l.return_flag,
               sum(l.extended_price * (1 - l.discount)) AS revenue,
               sum(l.quantity * p.p_retailprice) AS retail_value,
               count(*) AS line_count
        FROM ({_STG_LINEITEM}) l
        LEFT JOIN part p ON l.part_id = p.p_partkey
        GROUP BY 1, 2
        """,
    )

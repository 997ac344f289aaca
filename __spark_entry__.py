"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship metric query on sf0.001.
``queries()`` exposes one callable per implemented operator from SURVEY.md
§2; ``oracle_sql()`` gives the DuckDB-equivalent ANSI SQL the driver runs
side-by-side at sf0.01 (CORRECTNESS gate).
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# ---------------------------------------------------------------------------
# engine bootstrap (cached per sf_dir so the model DAG builds once)
# ---------------------------------------------------------------------------

_ENGINES: dict[tuple[int, str], object] = {}

YTD_SPEC_YAML = """
version: 0.1
source: fct_orders
dimensions:
  - name: market_segment
    expr: market_segment
  - name: order_date
    expr: order_date
  - name: order_year
    expr: order_year
measures:
  - name: ytd_revenue
    expr: sum(total_price)
    window:
      - order: order_date
        range: cumulative
        semiadditive: last
      - order: order_year
        range: current
        semiadditive: last
"""

FILTERED_SPEC_YAML = """
version: 0.1
source: fct_orders
filter: order_status = 'F'
dimensions:
  - name: market_segment
    expr: market_segment
measures:
  - name: total_revenue
    expr: sum(total_price)
  - name: total_orders
    expr: count(*)
"""


def _engine(spark: SparkSession, sf_dir: str):
    from dbt_databricks_metrics_spark.engine import MetricEngine
    from dbt_databricks_metrics_spark.project import build_registry
    from dbt_databricks_metrics_spark.specs import MetricViewSpec

    key = (id(spark), sf_dir)
    if key not in _ENGINES:
        eng = MetricEngine(
            spark,
            build_registry(sf_dir),
            warehouse_dir=tempfile.mkdtemp(prefix="metric_wh_"),
        )
        eng.run(materialize_rollups=True)
        eng.register(MetricViewSpec.from_yaml(YTD_SPEC_YAML, name="mv_ytd"))
        eng.register(MetricViewSpec.from_yaml(FILTERED_SPEC_YAML, name="mv_filtered"))
        _ENGINES[key] = eng
    return _ENGINES[key]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: revenue KPIs by market segment (README.md:125-132)."""
    eng = _engine(spark, "/root/testdata/sf0.001")
    return eng.metric_view("mv_order_metrics").query(
        dimensions=["market_segment"],
        measures=["total_orders", "total_revenue", "avg_order_value"],
    )


# ---------------------------------------------------------------------------
# shared SQL fragments for the DuckDB oracle (ANSI over the raw fixtures)
# ---------------------------------------------------------------------------

_STG_ORDERS = """
    SELECT o_orderkey AS order_id, o_custkey AS customer_id,
           o_orderstatus AS order_status, o_totalprice AS total_price,
           CAST(o_orderdate AS DATE) AS order_date,
           o_orderpriority AS order_priority
    FROM orders
"""

_STG_CUSTOMERS = """
    SELECT c_custkey AS customer_id, c_name AS customer_name,
           c_nationkey AS nation_id, c_acctbal AS account_balance,
           c_mktsegment AS market_segment
    FROM customer
"""

_FCT_ORDERS = f"""
    SELECT o.order_id, o.customer_id, c.customer_name, c.market_segment,
           o.order_status, o.total_price, o.order_date, o.order_priority,
           CAST(year(o.order_date) AS INT) AS order_year,
           CAST(month(o.order_date) AS INT) AS order_month,
           CAST(quarter(o.order_date) AS INT) AS order_quarter
    FROM ({_STG_ORDERS}) o
    LEFT JOIN ({_STG_CUSTOMERS}) c ON o.customer_id = c.customer_id
"""

_FCT_CUSTOMER_SUMMARY = f"""
    SELECT c.customer_id, c.customer_name, c.market_segment, c.account_balance,
           count(o.order_id) AS total_orders,
           sum(o.total_price) AS total_spent,
           avg(o.total_price) AS avg_order_value,
           min(o.order_date) AS first_order_date,
           max(o.order_date) AS last_order_date
    FROM ({_STG_CUSTOMERS}) c
    LEFT JOIN ({_STG_ORDERS}) o ON c.customer_id = o.customer_id
    GROUP BY 1, 2, 3, 4
"""


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def _q_stg_orders(spark, sf_dir):
    eng = _engine(spark, sf_dir)
    return eng.ref("stg_orders")


def _q_stg_customers(spark, sf_dir):
    eng = _engine(spark, sf_dir)
    return eng.ref("stg_customers")


def _q_fct_orders(spark, sf_dir):
    eng = _engine(spark, sf_dir)
    return eng.ref("fct_orders")


def _q_fct_customer_summary(spark, sf_dir):
    eng = _engine(spark, sf_dir)
    return eng.ref("fct_customer_summary")


def _q_measure_by_dim(spark, sf_dir):
    eng = _engine(spark, sf_dir)
    return eng.metric_view("mv_order_metrics").query(
        dimensions=["market_segment"],
        measures=["total_orders", "total_revenue", "avg_order_value"],
    )


def _q_measure_multi_dim(spark, sf_dir):
    eng = _engine(spark, sf_dir)
    return eng.metric_view("mv_order_metrics").query(
        dimensions=["order_year", "order_status"],
        measures=["total_revenue", "max_order_value", "total_orders"],
    )


def _q_measure_global(spark, sf_dir):
    eng = _engine(spark, sf_dir)
    return eng.metric_view("mv_orders_simple").query(
        measures=["order_count", "total_revenue", "avg_order_value"]
    )


def _q_customer_metrics(spark, sf_dir):
    eng = _engine(spark, sf_dir)
    return eng.metric_view("mv_customer_metrics").query(
        dimensions=["market_segment"],
        measures=[
            "total_customers",
            "total_revenue",
            "avg_customer_value",
            "avg_orders_per_customer",
            "high_value_customers",
            "avg_order_frequency",
        ],
    )


def _q_trailing_7d(spark, sf_dir):
    eng = _engine(spark, sf_dir)
    return eng.metric_view("mv_order_metrics").query(
        dimensions=["market_segment"], measures=["trailing_7d_revenue"]
    )


def _q_cumulative(spark, sf_dir):
    eng = _engine(spark, sf_dir)
    return eng.metric_view("mv_order_metrics").query(
        dimensions=["order_status"], measures=["cumulative_revenue"]
    )


def _q_ytd(spark, sf_dir):
    eng = _engine(spark, sf_dir)
    return eng.metric_view("mv_ytd").query(
        dimensions=["market_segment"], measures=["ytd_revenue"]
    )


def _q_filtered_mv(spark, sf_dir):
    eng = _engine(spark, sf_dir)
    return eng.metric_view("mv_filtered").query(
        dimensions=["market_segment"], measures=["total_revenue", "total_orders"]
    )


def _q_routed_segment(spark, sf_dir):
    # answered from the revenue_by_segment rollup (partial-state re-agg);
    # oracle checks rollup ≡ direct aggregation
    eng = _engine(spark, sf_dir)
    df, route = eng.metric_view("mv_order_metrics").query_routed(
        ["market_segment"], ["total_revenue", "total_orders"]
    )
    assert route == "rollup:revenue_by_segment", route
    return df


def _q_routed_monthly(spark, sf_dir):
    eng = _engine(spark, sf_dir)
    df, route = eng.metric_view("mv_order_metrics").query_routed(
        ["order_year", "order_month"], ["total_revenue"]
    )
    assert route == "rollup:monthly_revenue", route
    return df


def _q_measure_sql(spark, sf_dir):
    eng = _engine(spark, sf_dir)
    return eng.sql(
        """
        SELECT market_segment, MEASURE(total_revenue) AS total_revenue,
               MEASURE(avg_order_value) AS avg_order_value
        FROM mv_order_metrics
        GROUP BY market_segment
        """
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "stg_orders": _q_stg_orders,
        "stg_customers": _q_stg_customers,
        "fct_orders": _q_fct_orders,
        "fct_customer_summary": _q_fct_customer_summary,
        "measure_by_dim": _q_measure_by_dim,
        "measure_multi_dim": _q_measure_multi_dim,
        "measure_global": _q_measure_global,
        "customer_metrics": _q_customer_metrics,
        "trailing_7d_revenue": _q_trailing_7d,
        "cumulative_revenue": _q_cumulative,
        "ytd_revenue": _q_ytd,
        "filtered_mv": _q_filtered_mv,
        "routed_segment": _q_routed_segment,
        "routed_monthly": _q_routed_monthly,
        "measure_sql": _q_measure_sql,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "stg_orders": _STG_ORDERS,
        "stg_customers": _STG_CUSTOMERS,
        "fct_orders": _FCT_ORDERS,
        "fct_customer_summary": _FCT_CUSTOMER_SUMMARY,
        "measure_by_dim": f"""
            SELECT market_segment, count(*) AS total_orders,
                   sum(total_price) AS total_revenue,
                   avg(total_price) AS avg_order_value
            FROM ({_FCT_ORDERS}) GROUP BY market_segment
        """,
        "measure_multi_dim": f"""
            SELECT order_year, order_status, sum(total_price) AS total_revenue,
                   max(total_price) AS max_order_value, count(*) AS total_orders
            FROM ({_FCT_ORDERS}) GROUP BY 1, 2
        """,
        "measure_global": f"""
            SELECT count(*) AS order_count, sum(total_price) AS total_revenue,
                   avg(total_price) AS avg_order_value
            FROM ({_STG_ORDERS})
        """,
        "customer_metrics": f"""
            SELECT market_segment,
                   count(*) AS total_customers,
                   sum(total_spent) AS total_revenue,
                   avg(total_spent) AS avg_customer_value,
                   avg(total_orders) AS avg_orders_per_customer,
                   count_if(total_spent > 100000) AS high_value_customers,
                   avg(total_orders / nullif(datediff('day', first_order_date, last_order_date), 0))
                       AS avg_order_frequency
            FROM ({_FCT_CUSTOMER_SUMMARY}) GROUP BY market_segment
        """,
        "trailing_7d_revenue": f"""
            WITH grain AS (
                SELECT market_segment, order_date, sum(total_price) AS rev
                FROM ({_FCT_ORDERS}) GROUP BY 1, 2
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
        "cumulative_revenue": f"""
            SELECT order_status, sum(total_price) AS cumulative_revenue
            FROM ({_STG_ORDERS}) GROUP BY 1
        """,
        "ytd_revenue": f"""
            WITH grain AS (
                SELECT market_segment, order_year, order_date, sum(total_price) AS rev
                FROM ({_FCT_ORDERS}) GROUP BY 1, 2, 3
            ),
            win AS (
                SELECT market_segment, order_date,
                       sum(rev) OVER (PARTITION BY market_segment, order_year
                           ORDER BY order_date
                           RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS w
                FROM grain
            )
            SELECT market_segment, arg_max(w, order_date) AS ytd_revenue
            FROM win GROUP BY 1
        """,
        "filtered_mv": f"""
            SELECT market_segment, sum(total_price) AS total_revenue,
                   count(*) AS total_orders
            FROM ({_FCT_ORDERS}) WHERE order_status = 'F'
            GROUP BY market_segment
        """,
        "routed_segment": f"""
            SELECT market_segment, sum(total_price) AS total_revenue,
                   count(*) AS total_orders
            FROM ({_FCT_ORDERS}) GROUP BY market_segment
        """,
        "routed_monthly": f"""
            SELECT order_year, order_month, sum(total_price) AS total_revenue
            FROM ({_FCT_ORDERS}) GROUP BY 1, 2
        """,
        "measure_sql": f"""
            SELECT market_segment, sum(total_price) AS total_revenue,
                   avg(total_price) AS avg_order_value
            FROM ({_FCT_ORDERS}) GROUP BY market_segment
        """,
    }

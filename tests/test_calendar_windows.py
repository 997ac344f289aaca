"""Calendar-unit trailing windows (`trailing N month/quarter/year`) vs
DuckDB oracle — variable month lengths forbid fixed range frames, so these
compile to a range self-join over the grain (compiler.py)."""

from __future__ import annotations

import pytest

from dbt_databricks_metrics_spark.engine import MetricEngine
from dbt_databricks_metrics_spark.project import build_registry
from dbt_databricks_metrics_spark.specs import MetricViewSpec

from .conftest import assert_df_matches_oracle
from .test_engine_e2e import STG_ORDERS_SQL


@pytest.fixture(scope="module")
def engine(spark, sf_dir, tmp_path_factory):
    eng = MetricEngine(
        spark, build_registry(sf_dir), warehouse_dir=str(tmp_path_factory.mktemp("whc"))
    )
    eng.run()
    return eng


def _mv(engine, rng: str, name: str):
    return engine.register(
        MetricViewSpec.from_yaml(
            f"""
version: 0.1
source: fct_orders
dimensions:
  - name: order_status
    expr: order_status
  - name: order_date
    expr: order_date
measures:
  - name: m
    expr: sum(total_price)
    window:
      - order: order_date
        range: {rng}
        semiadditive: last
""",
            name=name,
        )
    )


TRAILING_MONTH_ORACLE = """
WITH grain AS (
    SELECT order_status, order_date, sum(total_price) AS rev
    FROM ({src}) GROUP BY 1, 2
),
win AS (
    SELECT l.order_status, l.order_date, sum(r.rev) AS w
    FROM grain l
    LEFT JOIN grain r
      ON r.order_status = l.order_status
     AND r.order_date > (l.order_date - INTERVAL {months} MONTH)
     AND r.order_date <= l.order_date
    GROUP BY 1, 2
)
SELECT order_status, arg_max(w, order_date) AS m FROM win GROUP BY 1
"""


@pytest.mark.parametrize(
    "rng,months",
    [("trailing 1 month", 1), ("trailing 2 quarter", 6), ("trailing 1 year", 12)],
)
def test_calendar_trailing_vs_oracle(engine, duck, rng, months):
    mv = _mv(engine, rng, f"mv_cal_{months}")
    df = mv.query(["order_status"], ["m"])
    assert_df_matches_oracle(
        df, duck, TRAILING_MONTH_ORACLE.format(src=STG_ORDERS_SQL, months=months)
    )


def test_calendar_window_by_order_date(engine, duck):
    mv = _mv(engine, "trailing 1 month", "mv_cal_bydate")
    df = mv.query(["order_date"], ["m"])
    assert_df_matches_oracle(
        df,
        duck,
        f"""
        WITH grain AS (
            SELECT order_date, sum(total_price) AS rev
            FROM ({STG_ORDERS_SQL}) GROUP BY 1
        )
        SELECT l.order_date, sum(r.rev) AS m
        FROM grain l
        LEFT JOIN grain r
          ON r.order_date > (l.order_date - INTERVAL 1 MONTH)
         AND r.order_date <= l.order_date
        GROUP BY 1
        """,
    )

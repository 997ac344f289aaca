"""Metric views over the events stream table: the semantic layer composes
with [EXT] event data (dims from ts/type, window measures over event
dates) — oracle-checked."""

from __future__ import annotations

import pytest

from dbt_databricks_metrics_spark.engine import MetricEngine
from dbt_databricks_metrics_spark.sources import register_tables
from dbt_databricks_metrics_spark.specs import MetricViewSpec

from .conftest import assert_df_matches_oracle

EVENTS_MV_YAML = """
version: 0.1
source: events
dimensions:
  - name: event_type
    expr: event_type
  - name: event_date
    expr: cast(ts as date)
  - name: event_hour
    expr: hour(ts)
measures:
  - name: n_events
    expr: count(*)
  - name: total_value
    expr: sum(value)
  - name: n_users
    expr: count(distinct user_id)
  - name: trailing_3d_value
    expr: sum(value)
    window:
      - order: event_date
        range: trailing 3 day
        semiadditive: last
"""


@pytest.fixture(scope="module")
def engine(spark, sf_dir, tmp_path_factory):
    register_tables(spark, sf_dir, ("events",))
    eng = MetricEngine(spark, warehouse_dir=str(tmp_path_factory.mktemp("whe")))
    eng.register(MetricViewSpec.from_yaml(EVENTS_MV_YAML, name="mv_events"))
    return eng


def test_events_by_type(engine, duck):
    df = engine.metric_view("mv_events").query(
        ["event_type"], ["n_events", "total_value", "n_users"]
    )
    assert_df_matches_oracle(
        df,
        duck,
        """
        SELECT event_type, count(*) AS n_events, sum(value) AS total_value,
               count(DISTINCT user_id) AS n_users
        FROM events GROUP BY 1
        """,
    )


def test_events_by_derived_date_hour(engine, duck):
    df = engine.metric_view("mv_events").query(
        ["event_date", "event_hour"], ["n_events"]
    )
    assert_df_matches_oracle(
        df,
        duck,
        """
        SELECT CAST(ts AS DATE) AS event_date,
               CAST(hour(ts) AS INT) AS event_hour, count(*) AS n_events
        FROM events GROUP BY 1, 2
        """,
    )


def test_events_trailing_window(engine, duck):
    df = engine.metric_view("mv_events").query(
        ["event_type"], ["trailing_3d_value"]
    )
    assert_df_matches_oracle(
        df,
        duck,
        """
        WITH grain AS (
            SELECT event_type, CAST(ts AS DATE) AS event_date, sum(value) AS v
            FROM events GROUP BY 1, 2
        ),
        win AS (
            SELECT event_type, event_date,
                   sum(v) OVER (PARTITION BY event_type ORDER BY event_date
                       RANGE BETWEEN INTERVAL 2 DAY PRECEDING AND CURRENT ROW) AS w
            FROM grain
        )
        SELECT event_type, arg_max(w, event_date) AS trailing_3d_value
        FROM win GROUP BY 1
        """,
    )

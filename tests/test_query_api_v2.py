"""HAVING / ORDER BY desc / LIMIT, time-spine fill, and share-of-total
on the metric-query API [EXT beyond the reference's documented queries —
the standard analyst surface a semantic layer is expected to round out].
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_databricks_metrics_spark.engine import MetricEngine
from dbt_databricks_metrics_spark.plans.compiler import QueryError
from dbt_databricks_metrics_spark.project import build_registry

from .conftest import assert_df_matches_oracle


@pytest.fixture(scope="module")
def engine(spark, sf_dir, tmp_path_factory):
    eng = MetricEngine(
        spark,
        build_registry(sf_dir),
        warehouse_dir=str(tmp_path_factory.mktemp("wh")),
    )
    eng.run(materialize_rollups=True)
    return eng


@pytest.fixture(scope="module")
def mv(engine):
    return engine.metric_view("mv_order_metrics")


# ---------------------------------------------------------------- HAVING


def test_having_filters_aggregated_result(mv, duck):
    df = mv.query(
        ["market_segment"], ["total_revenue", "total_orders"],
        having="total_orders > 250",
    )
    assert_df_matches_oracle(
        df,
        duck,
        """
        SELECT c.c_mktsegment AS market_segment,
               sum(o.o_totalprice) AS total_revenue,
               count(*) AS total_orders
        FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1 HAVING count(*) > 250
        """,
    )


def test_having_may_reference_dimensions(mv):
    df = mv.query(
        ["market_segment"], ["total_orders"],
        having="market_segment = 'BUILDING' and total_orders >= 0",
    )
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["market_segment"] == "BUILDING"


def test_having_rejects_unknown_identifier(mv):
    with pytest.raises(QueryError, match="bogus"):
        mv.query(["market_segment"], ["total_revenue"], having="bogus > 1")


def test_having_rejects_unselected_measure(mv):
    with pytest.raises(QueryError, match="total_orders"):
        mv.query(["market_segment"], ["total_revenue"], having="total_orders > 1")


def test_having_rides_the_rollup_route(mv):
    df, route = mv.query_routed(
        ["market_segment"], ["total_revenue", "total_orders"],
        having="total_orders > 0",
    )
    assert route == "rollup:revenue_by_segment"
    assert df.count() == 5


# ------------------------------------------------- ORDER BY desc / LIMIT


def test_order_by_desc_with_limit_is_topk(mv):
    df = mv.query(
        ["order_year", "order_month"], ["total_revenue"],
        order_by=["total_revenue desc", "order_year", "order_month"],
        limit=3,
    )
    rows = df.collect()
    assert len(rows) == 3
    revs = [r["total_revenue"] for r in rows]
    assert revs == sorted(revs, reverse=True)
    # the pair compiles to per-partition top-n heaps, not a global sort
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_order_by_asc_suffix_and_bare_name_agree(mv):
    a = mv.query(["market_segment"], ["total_orders"], order_by=["market_segment"])
    b = mv.query(
        ["market_segment"], ["total_orders"], order_by=["market_segment asc"]
    )
    assert [r["market_segment"] for r in a.collect()] == [
        r["market_segment"] for r in b.collect()
    ]


def test_order_by_bad_entry_raises(mv):
    with pytest.raises(QueryError, match="order_by"):
        mv.query(["market_segment"], ["total_orders"], order_by=["a b c"])


# ------------------------------------------------------- time-spine fill


def test_query_filled_densifies_every_day(mv, spark):
    df = mv.query_filled(
        ["order_status"], ["total_revenue"], time_dim="order_date"
    )
    base = mv.query(["order_status"], ["total_revenue"], where=None)
    n_status = base.count()
    raw = mv.query(["order_date"], ["total_orders"])
    lo, hi = raw.agg(F.min("order_date"), F.max("order_date")).first()
    n_days = (hi - lo).days + 1
    assert df.count() == n_status * n_days
    # fill value lands on spine-only rows; no original row is lost
    orig = mv.query(["order_status", "order_date"], ["total_revenue"])
    assert df.filter(F.col("total_revenue") != 0).count() == orig.filter(
        F.col("total_revenue") != 0
    ).count()


def test_query_filled_fill_none_keeps_null(mv):
    df = mv.query_filled(
        ["order_status"], ["total_revenue"], time_dim="order_date", fill=None
    )
    assert df.filter(F.col("total_revenue").isNull()).count() > 0


def test_query_filled_rejects_repeated_time_dim(mv):
    with pytest.raises(QueryError):
        mv.query_filled(["order_date"], ["total_revenue"], time_dim="order_date")


def test_time_spine_rejects_unknown_step(spark):
    from dbt_databricks_metrics_spark.operators.spine import time_spine

    df = spark.range(1).select(F.lit("2020-01-01").cast("date").alias("d"))
    with pytest.raises(ValueError, match="step"):
        time_spine(df, "d", step="fortnight")


def test_fill_time_gaps_without_groups(spark):
    from dbt_databricks_metrics_spark.operators.spine import fill_time_gaps

    df = spark.createDataFrame(
        [("2020-01-01", 1.0), ("2020-01-04", 2.0)], ["d", "v"]
    ).select(F.col("d").cast("date").alias("d"), "v")
    out = fill_time_gaps(df, "d", fill={"v": 0.0}).orderBy("d").collect()
    assert [r["d"].isoformat() for r in out] == [
        "2020-01-01", "2020-01-02", "2020-01-03", "2020-01-04"
    ]
    assert [r["v"] for r in out] == [1.0, 0.0, 0.0, 2.0]


def test_fill_time_gaps_month_step(spark):
    from dbt_databricks_metrics_spark.operators.spine import fill_time_gaps

    df = spark.createDataFrame(
        [("2020-01-01", "a", 1.0), ("2020-04-01", "a", 2.0), ("2020-02-01", "b", 3.0)],
        ["m", "g", "v"],
    ).select(F.col("m").cast("date").alias("m"), "g", "v")
    out = fill_time_gaps(df, "m", group_cols=("g",), step="month", fill={"v": 0.0})
    # spine 2020-01..2020-04 (4 months) x 2 groups
    assert out.count() == 8
    assert out.filter("v = 0.0").count() == 5


# ------------------------------------------------------- share of total


def test_query_share_sums_to_one(mv):
    df = mv.query_share(["market_segment"], ["total_revenue", "total_orders"])
    row = df.agg(
        F.sum("total_revenue_share").alias("r"), F.sum("total_orders_share").alias("o")
    ).first()
    assert row["r"] == pytest.approx(1.0)
    assert row["o"] == pytest.approx(1.0)
    assert set(df.columns) == {
        "market_segment", "total_revenue", "total_orders",
        "total_revenue_share", "total_orders_share",
    }


def test_query_share_matches_oracle(mv, duck):
    df = mv.query_share(["market_segment"], ["total_revenue"])
    assert_df_matches_oracle(
        df,
        duck,
        """
        SELECT c.c_mktsegment AS market_segment,
               sum(o.o_totalprice) AS total_revenue,
               sum(o.o_totalprice) / sum(sum(o.o_totalprice)) OVER ()
                   AS total_revenue_share
        FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY 1
        """,
    )


def test_query_share_no_global_window(mv):
    # the total must come from a broadcast 1-row agg, never a global window
    df = mv.query_share(["market_segment"], ["total_revenue"])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan

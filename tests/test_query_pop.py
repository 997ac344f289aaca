"""Period-over-period query tests: lag semantics against a manual
window, first-period NULLs, zero-division guard, route independence,
and the DuckDB oracle shape used by the contract query.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_databricks_metrics_spark.engine import MetricEngine
from dbt_databricks_metrics_spark.plans.compiler import QueryError
from dbt_databricks_metrics_spark.project import build_registry


@pytest.fixture(scope="module")
def engine(spark, sf_dir, tmp_path_factory):
    eng = MetricEngine(
        spark, build_registry(sf_dir), warehouse_dir=str(tmp_path_factory.mktemp("wh"))
    )
    eng.run(materialize_rollups=True)
    return eng


def test_pop_matches_manual_lag(engine):
    mv = engine.metric_view("mv_order_metrics")
    pop = {
        (r["market_segment"], r["order_year"]): (
            r["total_revenue"],
            r["total_revenue_prev"],
        )
        for r in mv.query_pop(
            ["market_segment"], ["total_revenue"], order_dim="order_year"
        ).collect()
    }
    base = {
        (r["market_segment"], r["order_year"]): r["total_revenue"]
        for r in mv.query(["market_segment", "order_year"], ["total_revenue"]).collect()
    }
    assert set(pop) == set(base)
    for (seg, yr), (cur, prev) in pop.items():
        assert cur == base[(seg, yr)]
        expected_prev = base.get((seg, yr - 1))
        assert prev == expected_prev


def test_pop_delta_and_pct(engine):
    mv = engine.metric_view("mv_order_metrics")
    for r in mv.query_pop(
        ["market_segment"], ["total_revenue"], order_dim="order_year"
    ).collect():
        if r["total_revenue_prev"] is None:
            assert r["total_revenue_delta"] is None and r["total_revenue_pct"] is None
        else:
            assert abs(
                r["total_revenue_delta"] - (r["total_revenue"] - r["total_revenue_prev"])
            ) < 1e-9
            if r["total_revenue_prev"] != 0:
                assert abs(
                    r["total_revenue_pct"]
                    - r["total_revenue_delta"] / r["total_revenue_prev"]
                ) < 1e-9


def test_pop_lag2(engine):
    mv = engine.metric_view("mv_order_metrics")
    got = {
        (r["market_segment"], r["order_year"]): r["total_revenue_prev"]
        for r in mv.query_pop(
            ["market_segment"], ["total_revenue"], order_dim="order_year", lag=2
        ).collect()
    }
    base = {
        (r["market_segment"], r["order_year"]): r["total_revenue"]
        for r in mv.query(["market_segment", "order_year"], ["total_revenue"]).collect()
    }
    for (seg, yr), prev in got.items():
        assert prev == base.get((seg, yr - 2))


def test_pop_validation(engine):
    mv = engine.metric_view("mv_order_metrics")
    with pytest.raises(QueryError):
        mv.query_pop(["order_year"], ["total_revenue"], order_dim="order_year")
    with pytest.raises(QueryError):
        mv.query_pop([], ["total_revenue"], order_dim="order_year", lag=0)


def test_pop_no_extra_source_scan(engine):
    """The lag window adds exactly ONE exchange over the aggregated result
    (repartition by the non-order dims) — never a second source scan."""
    mv = engine.metric_view("mv_order_metrics")
    base_plan = mv.query(["market_segment", "order_year"], ["total_revenue"])
    pop_plan = mv.query_pop(["market_segment"], ["total_revenue"], "order_year")
    scans = lambda df: df._jdf.queryExecution().executedPlan().toString().count("Scan parquet")
    assert scans(pop_plan) == scans(base_plan)


def test_drill_across_two_views(engine):
    """Conformed-dim drill-across: order revenue next to customer counts
    by market_segment, each side equal to its own single-view query."""
    out = {
        r["market_segment"]: (r["total_revenue"], r["total_customers"])
        for r in engine.query_across(
            ["market_segment"],
            [("mv_order_metrics", "total_revenue"), ("mv_customer_metrics", "total_customers")],
        ).collect()
    }
    rev = {
        r["market_segment"]: r["total_revenue"]
        for r in engine.metric_view("mv_order_metrics").query(["market_segment"], ["total_revenue"]).collect()
    }
    cust = {
        r["market_segment"]: r["total_customers"]
        for r in engine.metric_view("mv_customer_metrics").query(["market_segment"], ["total_customers"]).collect()
    }
    assert set(out) == set(rev) | set(cust)
    for seg, (a, b) in out.items():
        assert a == rev.get(seg) and b == cust.get(seg)


def test_drill_across_name_clash_prefixes(engine):
    df = engine.query_across(
        ["market_segment"],
        [("mv_order_metrics", "total_revenue"), ("mv_customer_metrics", "total_revenue")],
    )
    assert set(df.columns) == {
        "market_segment",
        "mv_order_metrics_total_revenue",
        "mv_customer_metrics_total_revenue",
    }


def test_drill_across_conformance_checked(engine):
    with pytest.raises(QueryError, match="not conformed"):
        engine.query_across(
            ["order_status"],  # customer view has no order_status dim
            [("mv_order_metrics", "total_revenue"), ("mv_customer_metrics", "total_customers")],
        )


def test_drill_across_inner_mode_and_validation(engine):
    inner = engine.query_across(
        ["market_segment"],
        [("mv_order_metrics", "total_revenue"), ("mv_customer_metrics", "total_customers")],
        how="inner",
    )
    # all 5 segments exist in both views on this fixture: inner == full size
    assert inner.count() == 5
    assert inner.filter(
        F.col("total_revenue").isNull() | F.col("total_customers").isNull()
    ).count() == 0
    with pytest.raises(QueryError, match="full|inner"):
        engine.query_across(
            ["market_segment"], [("mv_order_metrics", "total_revenue")], how="left"
        )
    with pytest.raises(QueryError, match="at least one"):
        engine.query_across([], [("mv_order_metrics", "total_revenue")])


def test_anomalies_matches_manual_zscore(engine):
    import statistics

    mv = engine.metric_view("mv_order_metrics")
    base = {
        (r["market_segment"], r["order_month"]): r["total_revenue"]
        for r in mv.query(["market_segment", "order_month"], ["total_revenue"]).collect()
    }
    series: dict[str, list[float]] = {}
    for (seg, _m), v in base.items():
        series.setdefault(seg, []).append(v)
    got = mv.query_anomalies(
        ["market_segment"], ["total_revenue"], order_dim="order_month", z=1.5
    ).collect()
    assert len(got) == len(base)
    flagged = 0
    for r in got:
        xs = series[r["market_segment"]]
        mean = statistics.fmean(xs)
        sd = (sum((x - mean) ** 2 for x in xs) / len(xs)) ** 0.5
        exp = (base[(r["market_segment"], r["order_month"])] - mean) / sd
        assert r["total_revenue_z"] == pytest.approx(exp, rel=1e-9)
        assert r["total_revenue_anomaly"] == (abs(exp) >= 1.5)
        flagged += int(r["total_revenue_anomaly"])
    assert flagged > 0  # non-vacuous at the smoke fixture too


def test_anomalies_constant_series_null(engine, spark):
    mv = engine.metric_view("mv_order_metrics")
    # order_count per month of a single status can still vary; instead pin
    # the degenerate case directly: one period per series -> std 0 -> NULL
    got = mv.query_anomalies(
        ["market_segment", "order_status", "order_month"],
        ["total_revenue"],
        order_dim="order_year",
    ).collect()
    singles = {}
    for r in got:
        singles.setdefault(
            (r["market_segment"], r["order_status"], r["order_month"]), []
        ).append(r)
    for rows in singles.values():
        if len(rows) == 1:
            assert rows[0]["total_revenue_z"] is None
            assert rows[0]["total_revenue_anomaly"] is None
            break
    else:
        pytest.skip("no single-period series in fixture")


def test_anomalies_robust_matches_manual_hampel(engine):
    import statistics

    mv = engine.metric_view("mv_order_metrics")
    base = {
        (r["market_segment"], r["order_month"]): r["total_revenue"]
        for r in mv.query(["market_segment", "order_month"], ["total_revenue"]).collect()
    }
    series: dict[str, list[float]] = {}
    for (seg, _m), v in base.items():
        series.setdefault(seg, []).append(v)
    got = mv.query_anomalies_robust(
        ["market_segment"], ["total_revenue"], order_dim="order_month", k=2.0
    ).collect()
    assert len(got) == len(base)
    for r in got:
        xs = series[r["market_segment"]]
        med = statistics.median(xs)
        mad = statistics.median([abs(x - med) for x in xs])
        x = base[(r["market_segment"], r["order_month"])]
        if mad == 0:
            assert r["total_revenue_rz"] is None
            assert r["total_revenue_outlier"] is None
        else:
            exp = (x - med) / (1.4826 * mad)
            assert r["total_revenue_rz"] == pytest.approx(exp, rel=1e-9)
            assert r["total_revenue_outlier"] == (abs(exp) >= 2.0)


def test_anomalies_robust_flags_non_vacuously(engine):
    # at k=1 the OPERATOR must produce true flags on the fixture, and
    # each flag must agree with the rz it reports
    mv = engine.metric_view("mv_order_metrics")
    got = mv.query_anomalies_robust(
        ["market_segment"], ["total_revenue"], order_dim="order_month", k=1.0
    ).collect()
    flagged = [r for r in got if r["total_revenue_outlier"]]
    assert flagged, "k=1 must flag at least one period"
    for r in got:
        if r["total_revenue_rz"] is not None:
            assert r["total_revenue_outlier"] == (
                abs(r["total_revenue_rz"]) >= 1.0
            )


def test_anomalies_robust_validation(engine):
    from dbt_databricks_metrics_spark.engine import QueryError

    mv = engine.metric_view("mv_order_metrics")
    with pytest.raises(QueryError):
        mv.query_anomalies_robust(
            ["order_year"], ["total_revenue"], order_dim="order_year"
        )
    with pytest.raises(QueryError):
        mv.query_anomalies_robust(
            ["market_segment"], ["total_revenue"], order_dim="order_month", k=0
        )


def test_anomalies_validation(engine):
    mv = engine.metric_view("mv_order_metrics")
    with pytest.raises(QueryError):
        mv.query_anomalies(["order_year"], ["total_revenue"], order_dim="order_year")
    with pytest.raises(QueryError):
        mv.query_anomalies([], ["total_revenue"], order_dim="order_year", z=0)

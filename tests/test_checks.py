"""dbt-style data tests (checks.py) — schema test analogues."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_databricks_metrics_spark.checks import run_checks
from dbt_databricks_metrics_spark.engine import MetricEngine
from dbt_databricks_metrics_spark.project import build_registry


@pytest.fixture(scope="module")
def engine(spark, sf_dir, tmp_path_factory):
    eng = MetricEngine(
        spark, build_registry(sf_dir), warehouse_dir=str(tmp_path_factory.mktemp("whk"))
    )
    eng.run()
    return eng


def test_engine_test_all_pass(engine):
    results = engine.test()
    assert results, "project declares checks"
    failing = [r for r in results if not r.passed]
    assert not failing, failing
    kinds = {r.check for r in results}
    assert {"not_null", "unique"} <= kinds
    assert any(r.check.startswith("relationships") for r in results)


def test_checks_catch_violations(spark):
    df = spark.createDataFrame(
        [(1, "a", 5.0), (1, "b", -2.0), (None, "zz", 1.0)],
        "id long, status string, amount double",
    )
    parent = spark.createDataFrame([("a",), ("b",)], "k string")
    results = run_checks(
        "m",
        df,
        [
            {"not_null": "id"},
            {"unique": "id"},
            {"accepted_values": {"column": "status", "values": ["a", "b"]}},
            {"expression": "amount >= 0"},
            {"relationships": {"column": "status", "to": "p", "field": "k"}},
        ],
        resolve=lambda name: parent,
    )
    by = {r.check: r for r in results}
    assert not by["not_null"].passed and by["not_null"].failures == 1
    assert not by["unique"].passed and by["unique"].failures == 2
    assert not by["accepted_values"].passed and by["accepted_values"].failures == 1
    assert not by["expression"].passed and by["expression"].failures == 1
    rel = next(r for r in results if r.check.startswith("relationships"))
    assert not rel.passed and rel.failures == 1


def test_single_pass_fusion(spark, sf_dir):
    """not_null/accepted_values/expression checks over one model are one
    aggregate job, not N scans."""
    from dbt_databricks_metrics_spark.sources import load_table

    df = load_table(spark, sf_dir, "orders")
    results = run_checks(
        "orders",
        df,
        [
            {"not_null": "o_orderkey"},
            {"not_null": "o_custkey"},
            {"expression": "o_totalprice > 0"},
        ],
    )
    assert all(r.passed for r in results)


def test_unknown_check_rejected(spark):
    df = spark.range(1)
    with pytest.raises(ValueError, match="unknown check"):
        run_checks("m", df, [{"frobnicate": "id"}])


def test_source_freshness_statuses(engine, spark, sf_dir):
    """Anchored freshness: pass within the window, warn past warn_after,
    error past error_after or on an empty source."""
    from dbt_databricks_metrics_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")
    max_ts = ev.agg(F.max("ts")).first()[0]

    fresh = engine.source_freshness(
        "stg_orders", "order_date", warn_after_s=10**12
    )
    # order_date is ancient vs the wall clock but warn_after is huge
    assert fresh.status == "pass" and fresh.age_seconds is not None

    from dbt_databricks_metrics_spark.checks import source_freshness

    anchored = source_freshness(
        "events", ev, "ts", warn_after_s=3600, as_of=str(max_ts)
    )
    assert anchored.status == "pass" and anchored.age_seconds == 0.0

    import datetime as _dt

    later = max_ts + _dt.timedelta(hours=2)
    warned = source_freshness(
        "events", ev, "ts", warn_after_s=3600, as_of=str(later)
    )
    assert warned.status == "warn"
    errored = source_freshness(
        "events", ev, "ts", warn_after_s=60, error_after_s=3600, as_of=str(later)
    )
    assert errored.status == "error"

    empty = source_freshness(
        "events", ev.filter(F.lit(False)), "ts", warn_after_s=1
    )
    assert empty.status == "error" and empty.max_loaded_at is None


def test_unit_test_model_with_mocked_inputs(engine, spark):
    """fct_orders against two mocked staging inputs: exact multiset diff,
    extra output columns tolerated, missing mock raises."""
    stg_orders = spark.createDataFrame(
        [
            (1, 10, "F", 100.0, "1995-01-03", "1-URGENT"),
            (2, 20, "O", 50.0, "1996-06-10", "3-MEDIUM"),
            (3, 99, "F", 10.0, "1997-02-01", "2-HIGH"),
        ],
        "order_id long, customer_id long, order_status string, "
        "total_price double, order_date string, order_priority string",
    ).withColumn("order_date", F.col("order_date").cast("date"))
    stg_customers = spark.createDataFrame(
        [(10, "Acme", "BUILDING", 0.0), (20, "Bmart", "MACHINERY", 5.0)],
        "customer_id long, customer_name string, market_segment string, "
        "account_balance double",
    )
    expect = spark.createDataFrame(
        [
            (1, "Acme", "BUILDING", 1995),
            (2, "Bmart", "MACHINERY", 1996),
            (3, None, None, 1997),  # left join keeps the orphan order
        ],
        "order_id long, customer_name string, market_segment string, "
        "order_year int",
    )
    res = engine.unit_test(
        "fct_orders",
        {"stg_orders": stg_orders, "stg_customers": stg_customers},
        expect,
    )
    assert res.passed, res
    assert res.actual_rows == 3

    bad_expect = expect.withColumn(
        "order_year", F.col("order_year") + F.lit(1)
    )
    res_bad = engine.unit_test(
        "fct_orders",
        {"stg_orders": stg_orders, "stg_customers": stg_customers},
        bad_expect,
    )
    assert not res_bad.passed and res_bad.missing == 3 and res_bad.unexpected == 3

    with pytest.raises(ValueError, match="no mocked input"):
        engine.unit_test("fct_orders", {"stg_orders": stg_orders}, expect)


def test_engine_build_runs_models_then_checks(spark, sf_dir, tmp_path_factory):
    """dbt build analogue: models + their declared checks in one call;
    fail_fast raises with the failing check named."""
    import pytest as _pytest

    from dbt_databricks_metrics_spark.engine import MetricEngine
    from dbt_databricks_metrics_spark.models import ModelError
    from dbt_databricks_metrics_spark.project import build_registry

    eng = MetricEngine(
        spark,
        build_registry(sf_dir),
        warehouse_dir=str(tmp_path_factory.mktemp("build_wh")),
    )
    built, results = eng.build()
    assert "fct_orders" in built
    assert results and all(r.passed for r in results)

    # a registry with a failing declared check must raise under fail_fast
    from dbt_databricks_metrics_spark.models import ModelRegistry

    reg = ModelRegistry()

    @reg.model(
        "bad",
        meta={"checks": [{"expression": "total_price < 0"}]},
    )
    def bad(spark, ref):
        from dbt_databricks_metrics_spark.sources import load_table

        return load_table(spark, sf_dir, "orders").selectExpr(
            "o_totalprice AS total_price"
        )

    eng2 = MetricEngine(
        spark, reg, warehouse_dir=str(tmp_path_factory.mktemp("build_wh2"))
    )
    with _pytest.raises(ModelError, match="data check"):
        eng2.build()
    _built, res = eng2.build(fail_fast=False)
    assert any(not r.passed for r in res)

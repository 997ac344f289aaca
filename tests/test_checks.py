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

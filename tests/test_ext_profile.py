"""Table-profiling tests ([EXT]): stat correctness on a hand-built
frame, null/distinct accounting, approx mode, single-pass plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_databricks_metrics_spark.ext import profile
from dbt_databricks_metrics_spark.sources import load_table


def test_profile_stats(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", None), (2, None, 3.5), (None, "a", 2.0)],
        "k long, s string, x double",
    )
    rows = {r["column"]: r for r in profile.profile_table(df).collect()}
    assert set(rows) == {"k", "s", "x"}
    k = rows["k"]
    assert (k["n_rows"], k["n_nulls"], k["n_distinct"]) == (4, 1, 2)
    assert (k["min_value"], k["max_value"]) == ("1", "2")
    assert k["mean_value"] == pytest.approx((1 + 2 + 2) / 3, abs=1e-4)
    s = rows["s"]
    assert (s["n_nulls"], s["n_distinct"], s["mean_value"]) == (1, 2, None)
    x = rows["x"]
    assert (x["min_value"], x["max_value"]) == ("1.5", "3.5")


def test_profile_column_subset_and_validation(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    out = profile.profile_table(orders, ["o_orderkey", "o_totalprice"])
    assert [r["column"] for r in out.collect()] == ["o_orderkey", "o_totalprice"]
    with pytest.raises(ValueError, match="unknown columns"):
        profile.profile_table(orders, ["nope"])


def test_profile_approx_close_to_exact(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    exact = {r["column"]: r["n_distinct"] for r in profile.profile_table(orders).collect()}
    approx = {r["column"]: r["n_distinct"] for r in profile.profile_table(orders, approx=True).collect()}
    for c, e in exact.items():
        assert abs(approx[c] - e) <= max(3, 0.12 * e)  # default HLL rsd 5% → ~2σ


def test_profile_matches_duckdb(spark, duck, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    got = {
        r["column"]: (r["n_rows"], r["n_nulls"], r["n_distinct"], r["min_value"], r["max_value"], r["mean_value"])
        for r in profile.profile_table(
            orders, ["o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"]
        ).collect()
    }
    want = {
        r[0]: tuple(r[1:])
        for r in duck.execute(
            """
            SELECT 'o_orderkey', count(*), count(*) - count(o_orderkey),
                   count(DISTINCT o_orderkey), min(o_orderkey)::VARCHAR,
                   max(o_orderkey)::VARCHAR, round(avg(o_orderkey), 4)
            FROM orders
            UNION ALL
            SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
                   count(DISTINCT o_orderstatus), min(o_orderstatus),
                   max(o_orderstatus), NULL
            FROM orders
            UNION ALL
            SELECT 'o_totalprice', count(*), count(*) - count(o_totalprice),
                   count(DISTINCT o_totalprice), min(o_totalprice)::VARCHAR,
                   max(o_totalprice)::VARCHAR, round(avg(o_totalprice), 4)
            FROM orders
            UNION ALL
            SELECT 'o_orderdate', count(*), count(*) - count(o_orderdate),
                   count(DISTINCT o_orderdate),
                   strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S'),
                   strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S'), NULL
            FROM orders
            """
        ).fetchall()
    }
    assert got == want


def test_profile_decimal_column(spark):
    from decimal import Decimal

    df = spark.createDataFrame(
        [(Decimal("1.50"),), (Decimal("2.50"),), (None,)], "d decimal(10,2)"
    )
    r = profile.profile_table(df).collect()[0]
    assert r["n_nulls"] == 1 and r["mean_value"] == pytest.approx(2.0)

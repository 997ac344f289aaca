"""Time-spine interpolation: LOCF and linear gap filling semantics.

Covers the `interpolate_time_series` contract on hand-built frames where
every expected value is derivable by eye: interior gaps interpolate
linearly on the integral time axis, the head backfills, the tail carries
forward, LOCF never invents values, and all-NULL groups stay NULL.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from dbt_databricks_metrics_spark.operators.spine import (
    fill_time_gaps,
    interpolate_time_series,
)


def _series(spark, rows):
    df = spark.createDataFrame(
        [(g, dt.date(2024, 1, d), v) for g, d, v in rows],
        "g string, t date, v double",
    )
    return df


def _vals(df):
    return {
        (r["g"], r["t"].day): (None if r["v"] is None else round(r["v"], 9))
        for r in df.collect()
    }


def test_linear_interior_gap(spark):
    # days 1..5, observed at 1 (10.0) and 5 (30.0): 2,3,4 interpolate
    df = _series(
        spark,
        [("a", 1, 10.0), ("a", 2, None), ("a", 3, None), ("a", 4, None), ("a", 5, 30.0)],
    )
    out = _vals(interpolate_time_series(df, "t", ["g"], ["v"], method="linear"))
    assert out == {
        ("a", 1): 10.0,
        ("a", 2): 15.0,
        ("a", 3): 20.0,
        ("a", 4): 25.0,
        ("a", 5): 30.0,
    }


def test_linear_head_backfills_and_tail_carries(spark):
    df = _series(spark, [("a", 1, None), ("a", 2, 4.0), ("a", 3, None)])
    out = _vals(interpolate_time_series(df, "t", ["g"], ["v"], method="linear"))
    assert out == {("a", 1): 4.0, ("a", 2): 4.0, ("a", 3): 4.0}


def test_locf_leaves_leading_nulls(spark):
    df = _series(
        spark, [("a", 1, None), ("a", 2, 7.0), ("a", 3, None), ("a", 4, 9.0)]
    )
    out = _vals(interpolate_time_series(df, "t", ["g"], ["v"], method="locf"))
    assert out == {("a", 1): None, ("a", 2): 7.0, ("a", 3): 7.0, ("a", 4): 9.0}


def test_groups_are_independent_and_all_null_stays_null(spark):
    df = _series(
        spark,
        [("a", 1, 2.0), ("a", 3, 6.0), ("b", 1, None), ("b", 2, None)],
    )
    out = _vals(interpolate_time_series(df, "t", ["g"], ["v"], method="linear"))
    assert out[("a", 1)] == 2.0 and out[("a", 3)] == 6.0
    assert out[("b", 1)] is None and out[("b", 2)] is None


def test_timestamp_axis_uses_micros(spark):
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    df = spark.createDataFrame(
        [
            ("a", base, 0.0),
            ("a", base + dt.timedelta(seconds=30), None),
            ("a", base + dt.timedelta(seconds=120), 120.0),
        ],
        "g string, t timestamp, v double",
    )
    out = interpolate_time_series(df, "t", ["g"], ["v"], method="linear")
    got = {r["v"] for r in out.collect()}
    assert got == {0.0, 30.0, 120.0}


def test_bad_method_raises(spark):
    df = _series(spark, [("a", 1, 1.0)])
    with pytest.raises(ValueError):
        interpolate_time_series(df, "t", ["g"], ["v"], method="cubic")


def test_composes_with_fill_time_gaps(spark):
    # sparse series densified then interpolated: every day exists and no
    # value is NULL once at least one observation exists in the group
    df = _series(spark, [("a", 1, 1.0), ("a", 4, 7.0)])
    dense = fill_time_gaps(df, "t", ["g"], step="day")
    out = _vals(interpolate_time_series(dense, "t", ["g"], ["v"], method="linear"))
    assert out == {("a", 1): 1.0, ("a", 2): 3.0, ("a", 3): 5.0, ("a", 4): 7.0}

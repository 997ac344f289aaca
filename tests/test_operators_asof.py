"""As-of join + interval join vs DuckDB's native ASOF / inequality joins.

The union+window asof recipe and the bucketized interval join must agree
with the reference semantics exactly (backward/forward, inclusive bounds,
tolerance null-out, left-join survival of unmatched rows).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_databricks_metrics_spark.ext import sessionize
from dbt_databricks_metrics_spark.operators.asof import asof_join, interval_join
from dbt_databricks_metrics_spark.sources import load_table

from .conftest import assert_df_matches_oracle


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events").cache()


@pytest.fixture(scope="module")
def clicks(events):
    return events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )


@pytest.fixture(scope="module")
def purchases(events):
    return events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )


_CLICKS = "SELECT event_id, user_id, ts, value FROM events WHERE event_type='click'"
_PURCH = "SELECT user_id, ts, value FROM events WHERE event_type='purchase'"


def test_backward_asof_matches_duckdb(clicks, purchases, duck):
    out = asof_join(clicks, purchases, on="ts", by=["user_id"]).select(
        "event_id", "user_id", "ts", "ts_r", "value_r"
    )
    assert_df_matches_oracle(
        out,
        duck,
        f"""
        SELECT c.event_id, c.user_id, c.ts, p.ts AS ts_r, p.value AS value_r
        FROM ({_CLICKS}) c ASOF LEFT JOIN ({_PURCH}) p
          ON c.user_id = p.user_id AND c.ts >= p.ts
        """,
    )


def test_forward_asof_matches_duckdb(clicks, purchases, duck):
    out = asof_join(
        clicks, purchases, on="ts", by=["user_id"], direction="forward"
    ).select("event_id", "ts_r")
    assert_df_matches_oracle(
        out,
        duck,
        f"""
        SELECT c.event_id, min(p.ts) AS ts_r
        FROM ({_CLICKS}) c LEFT JOIN ({_PURCH}) p
          ON c.user_id = p.user_id AND p.ts >= c.ts
        GROUP BY 1
        """,
    )


def test_tolerance_nulls_out_stale_matches(clicks, purchases, duck):
    out = asof_join(
        clicks, purchases, on="ts", by=["user_id"], tolerance_seconds=3600
    ).select("event_id", "ts_r")
    assert_df_matches_oracle(
        out,
        duck,
        f"""
        SELECT c.event_id,
               CASE WHEN c.ts - p.ts <= INTERVAL 3600 SECOND THEN p.ts END AS ts_r
        FROM ({_CLICKS}) c ASOF LEFT JOIN ({_PURCH}) p
          ON c.user_id = p.user_id AND c.ts >= p.ts
        """,
    )


def test_asof_left_rows_all_survive(clicks, purchases):
    out = asof_join(clicks, purchases, on="ts", by=["user_id"])
    assert out.count() == clicks.count()


def test_asof_inclusive_tie(spark):
    # a right row at exactly the left timestamp matches (backward inclusive)
    left = spark.createDataFrame(
        [(1, 1, "2024-01-01 10:00:00")], "id long, k long, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 5.0), (1, "2024-01-01 09:00:00", 3.0)],
        "k long, ts string, v double",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = asof_join(left, right, on="ts", by=["k"]).collect()
    assert len(out) == 1 and out[0]["v_r"] == 5.0


def test_interval_join_assigns_every_event_to_its_session(events, duck):
    bounds = sessionize.session_stats(events).select(
        "user_id", "session_start", "session_end"
    )
    pts = events.select("event_id", "user_id", "ts")
    out = interval_join(
        pts,
        bounds,
        point_ts="ts",
        start_col="session_start",
        end_col="session_end",
        by=["user_id"],
        bucket_seconds=3600,
    )
    # sessions partition each user's timeline → every event in exactly one
    assert out.count() == events.count()
    assert_df_matches_oracle(
        out.select("event_id", "session_start", "session_end"),
        duck,
        """
        WITH ordered AS (
            SELECT *,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
            SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                             ROWS UNBOUNDED PRECEDING) AS session_seq
            FROM ordered
        ),
        bounds AS (
            SELECT user_id, session_seq, min(ts) AS s, max(ts) AS e
            FROM sess GROUP BY 1, 2
        )
        SELECT ev.event_id, b.s AS session_start, b.e AS session_end
        FROM events ev JOIN bounds b
          ON ev.user_id = b.user_id AND ev.ts BETWEEN b.s AND b.e
        """,
    )


def test_interval_join_left_keeps_unmatched(spark):
    pts = spark.createDataFrame(
        [(1, 1, "2024-01-01 10:00:00"), (2, 1, "2024-06-01 10:00:00")],
        "event_id long, k long, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    iv = spark.createDataFrame(
        [(1, "2024-01-01 09:00:00", "2024-01-01 11:00:00", "a")],
        "k long, s string, e string, label string",
    ).withColumn("s", F.to_timestamp("s")).withColumn("e", F.to_timestamp("e"))
    out = interval_join(
        pts, iv, point_ts="ts", start_col="s", end_col="e", by=["k"], how="left"
    )
    got = {r["event_id"]: r["label"] for r in out.collect()}
    assert got == {1: "a", 2: None}


def test_asof_single_shuffle_plan(clicks, purchases):
    # the union+window recipe must cost exactly one exchange (the `by`
    # hash partitioning) — no join, no broadcast, no second shuffle
    out = asof_join(clicks, purchases, on="ts", by=["user_id"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan[:2000]
    assert "Join" not in plan, plan[:2000]


def test_asof_null_right_ts_never_matches(spark):
    """A right row with NULL ts is unmatchable (DuckDB ASOF semantics) —
    it must not propagate its payload as the 'earliest' match."""
    from dbt_databricks_metrics_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 1, 100)], "event_id long, user_id long, ts long")
    right = spark.createDataFrame([(1, None, 99.0)], "user_id long, ts long, value double")
    rows = asof_join(left, right, on="ts", by=["user_id"]).collect()
    assert len(rows) == 1
    assert rows[0]["ts_r"] is None and rows[0]["value_r"] is None


def test_asof_suffix_clash_names_offender(spark):
    from dbt_databricks_metrics_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 1, 100.0)], "user_id long, ts long, value_r double")
    right = spark.createDataFrame([(1, 50, 2.0)], "user_id long, ts long, value double")
    with pytest.raises(ValueError, match=r"value_r"):
        asof_join(left, right, on="ts", by=["user_id"])


def test_interval_left_null_point_column_not_duplicated(spark):
    """A matched point carrying a NULL column must not also reappear as
    unmatched (the anti join is NULL-safe)."""
    from dbt_databricks_metrics_spark.operators.asof import interval_join

    points = spark.createDataFrame(
        [(None, 1, 50), (2, 1, 500)], "event_id long, user_id long, ts long"
    )
    iv = spark.createDataFrame([(1, 0, 100, "a")], "user_id long, start long, end long, tag string")
    rows = interval_join(points, iv, point_ts="ts", by=["user_id"], bucket_seconds=60, how="left").collect()
    assert len(rows) == 2
    by_ts = {r["ts"]: r["tag"] for r in rows}
    assert by_ts[50] == "a" and by_ts[500] is None


def test_asof_forward_null_left_ts_never_matches(spark):
    """direction='forward' with a NULL-ts LEFT row must yield no match
    (desc ordering defaults to NULLS LAST, which would fabricate one)."""
    from dbt_databricks_metrics_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 1, None), (2, 1, 10)], "event_id long, user_id long, ts long"
    )
    right = spark.createDataFrame([(1, 50, 2.0)], "user_id long, ts long, value double")
    rows = {r["event_id"]: r for r in asof_join(left, right, on="ts", by=["user_id"], direction="forward").collect()}
    assert rows[1]["ts_r"] is None and rows[1]["value_r"] is None
    assert rows[2]["ts_r"] == 50 and rows[2]["value_r"] == 2.0


def test_point_in_time_features_no_future_leakage(spark):
    from dbt_databricks_metrics_spark.operators.asof import point_in_time_features

    spine = spark.createDataFrame(
        [(1, 100, "2024-01-01 10:00:00")], "id long, user_id long, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    past = spark.createDataFrame(
        [(100, "2024-01-01 09:00:00", 5.0), (100, "2024-01-01 11:00:00", 9.0)],
        "user_id long, ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    (r,) = point_in_time_features(spine, {"bal": past}).collect()
    assert r["value_bal"] == 5.0  # the 11:00 (future) row never leaks


def test_point_in_time_features_multi_table_and_tolerance(spark):
    from dbt_databricks_metrics_spark.operators.asof import point_in_time_features

    spine = spark.createDataFrame(
        [(1, 100, "2024-01-02 00:00:00"), (2, 200, "2024-01-02 00:00:00")],
        "id long, user_id long, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    a = spark.createDataFrame(
        [(100, "2024-01-01 23:00:00", 1.0)], "user_id long, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    b = spark.createDataFrame(
        [(100, "2023-12-01 00:00:00", 2.0)], "user_id long, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = point_in_time_features(
        spine, {"a": a, "b": b}, tolerance_seconds=7 * 86400
    )
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["value_a"] == 1.0
    assert rows[1]["value_b"] is None  # match exists but is staler than 7d
    assert rows[2]["value_a"] is None and rows[2]["value_b"] is None  # no user
    assert set(out.columns) >= {"value_a", "ts_a", "value_b", "ts_b"}


def test_point_in_time_features_empty_dict_rejected(spark):
    from dbt_databricks_metrics_spark.operators.asof import point_in_time_features

    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="at least one"):
        point_in_time_features(df, {})

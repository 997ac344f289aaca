"""Sessionization + time-window aggregation vs DuckDB oracle ([EXT])."""

from __future__ import annotations

import pytest

from dbt_databricks_metrics_spark.ext import sessionize
from dbt_databricks_metrics_spark.sources import load_table

from .conftest import assert_df_matches_oracle

SESSION_ORACLE = """
WITH ordered AS (
    SELECT *,
           CASE WHEN lag(ts) OVER w IS NULL
                     OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {gap}
                THEN 1 ELSE 0 END AS new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
    SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS session_seq
    FROM ordered
)
"""


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events").cache()


def test_sessionize_vs_oracle(events, duck):
    df = sessionize.sessionize(events).select(
        "event_id", "user_id", "session_id"
    )
    assert_df_matches_oracle(
        df,
        duck,
        SESSION_ORACLE.format(gap=30 * 60 * 1_000_000)
        + """
        SELECT event_id, user_id,
               concat(CAST(user_id AS VARCHAR), '-', CAST(session_seq AS VARCHAR))
                   AS session_id
        FROM sess
        """,
    )


def test_session_stats_vs_oracle(events, duck):
    df = sessionize.session_stats(events)
    assert_df_matches_oracle(
        df,
        duck,
        SESSION_ORACLE.format(gap=30 * 60 * 1_000_000)
        + """
        SELECT user_id,
               concat(CAST(user_id AS VARCHAR), '-', CAST(session_seq AS VARCHAR))
                   AS session_id,
               min(ts) AS session_start,
               max(ts) AS session_end,
               CAST(floor(epoch(max(ts))) AS BIGINT) - CAST(floor(epoch(min(ts))) AS BIGINT)
                   AS duration_sec,
               count(*) AS n_events,
               sum(value) AS total_value
        FROM sess GROUP BY 1, 2
        """,
    )


def test_tumbling_window_vs_oracle(events, duck):
    df = sessionize.tumbling_window_agg(events, "1 hour")
    assert_df_matches_oracle(
        df,
        duck,
        """
        SELECT date_trunc('hour', ts) AS window_start,
               date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
               event_type, count(*) AS n_events, sum(value) AS total_value
        FROM events GROUP BY 1, 2, 3
        """,
    )


def test_user_activity_vs_oracle(events, duck):
    df = sessionize.user_activity(events)
    assert_df_matches_oracle(
        df,
        duck,
        """
        SELECT user_id, count(*) AS n_events,
               count(DISTINCT event_type) AS n_event_types,
               min(ts) AS first_seen, max(ts) AS last_seen,
               sum(value) AS total_value, avg(value) AS avg_value
        FROM events GROUP BY 1
        """,
    )


def test_session_gap_boundary(spark):
    """Events exactly at the gap boundary stay in one session; 1s over
    splits."""
    from datetime import datetime

    rows = [
        (1, datetime(2024, 1, 1, 0, 0, 0), 7, "a", 1.0, "{}"),
        (2, datetime(2024, 1, 1, 0, 30, 0), 7, "a", 1.0, "{}"),  # == gap
        (3, datetime(2024, 1, 1, 1, 0, 1), 7, "a", 1.0, "{}"),  # gap + 1s
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    out = {r["event_id"]: r["session_id"] for r in sessionize.sessionize(df).collect()}
    assert out[1] == out[2]
    assert out[2] != out[3]


def test_sliding_window_vs_oracle(events, duck):
    """2h windows hopping by 1h: every event appears in exactly two
    windows (epoch-aligned starts), totals match the unnest-offsets
    oracle."""
    df = sessionize.sliding_window_agg(events, "2 hours", "1 hour")
    assert_df_matches_oracle(
        df,
        duck,
        """
        SELECT ws AS window_start,
               ws + INTERVAL 2 HOUR AS window_end,
               event_type, count(*) AS n_events, sum(value) AS total_value
        FROM (
            SELECT e.*, date_trunc('hour', ts) - to_hours(t.k) AS ws
            FROM events e, (SELECT unnest([0, 1]) AS k) t
        )
        GROUP BY 1, 2, 3
        """,
    )


def test_sliding_window_overlap_factor(events):
    """Each event contributes duration/slide times: total event count
    across sliding windows = 2x the tumbling total."""
    from pyspark.sql import functions as F

    sliding = sessionize.sliding_window_agg(events, "2 hours", "1 hour")
    n_events = events.count()
    assert sliding.agg(F.sum("n_events")).first()[0] == 2 * n_events


def test_debounce_chains_bursts(spark):
    """A burst chains event-to-event: 3 events each 5 min apart all fold
    into one even though the last is 10 min from the head; a 10min+1s gap
    starts a new burst; other keys are independent."""
    from datetime import datetime

    rows = [
        (1, datetime(2024, 1, 1, 0, 0, 0), 7, "click", 1.0, "{}"),
        (2, datetime(2024, 1, 1, 0, 5, 0), 7, "click", 1.0, "{}"),
        (3, datetime(2024, 1, 1, 0, 10, 0), 7, "click", 1.0, "{}"),
        (4, datetime(2024, 1, 1, 0, 20, 1), 7, "click", 1.0, "{}"),  # > gap
        (5, datetime(2024, 1, 1, 0, 0, 30), 7, "view", 1.0, "{}"),  # other key
        (6, datetime(2024, 1, 1, 0, 1, 0), 8, "click", 1.0, "{}"),  # other user
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    kept = {
        r["event_id"]
        for r in sessionize.debounce(df, gap_seconds=600).collect()
    }
    assert kept == {1, 4, 5, 6}


def test_debounce_gap_boundary_inclusive(spark):
    """An event exactly gap seconds after the previous is part of the
    burst (dropped); strictly greater starts a new one (kept)."""
    from datetime import datetime

    rows = [
        (1, datetime(2024, 1, 1, 0, 0, 0), 7, "click", 1.0, "{}"),
        (2, datetime(2024, 1, 1, 0, 10, 0), 7, "click", 1.0, "{}"),  # == gap
        (3, datetime(2024, 1, 1, 0, 20, 1), 7, "click", 1.0, "{}"),  # > gap
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    kept = {
        r["event_id"]
        for r in sessionize.debounce(df, gap_seconds=600).collect()
    }
    assert kept == {1, 3}


def test_time_in_state_hand_computed(spark):
    from pyspark.sql import functions as F

    from dbt_databricks_metrics_spark.ext.sessionize import time_in_state

    rows = [
        # user 1: view(0s) -> click(10s) -> purchase(70s, open)
        (1, 1, "2024-01-01 00:00:00", "view", 1.00),
        (2, 1, "2024-01-01 00:00:10", "click", 2.50),
        (3, 1, "2024-01-01 00:01:10", "purchase", 9.99),
        # user 2: view(0s) -> view(5s) -> click(8s, open)
        (4, 2, "2024-01-01 00:00:00", "view", 0.40),
        (5, 2, "2024-01-01 00:00:05", "view", 0.60),
        (6, 2, "2024-01-01 00:00:08", "click", 1.00),
    ]
    ev = spark.createDataFrame(
        rows, "event_id LONG, user_id LONG, ts STRING, event_type STRING, value DOUBLE"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    got = {
        r["state"]: r for r in time_in_state(ev, value_col="value").collect()
    }
    # views: u1 10s + u2 5s + u2 3s ; clicks: u1 60s ; purchases: open only
    assert "purchase" not in got
    v = got["view"]
    assert (v["n_intervals"], v["total_dwell_us"], v["max_dwell_us"]) == (
        3, 18_000_000, 10_000_000,
    )
    # value_dwell_cs: 100c*10s + 40c*5s + 60c*3s = 1380 ; dwell_s = 18
    assert (v["value_dwell_cs"], v["dwell_s"]) == (1380, 18)
    c = got["click"]
    assert (c["n_intervals"], c["total_dwell_us"]) == (1, 60_000_000)
    assert (c["value_dwell_cs"], c["dwell_s"]) == (250 * 60, 60)


def test_time_in_state_overflow_guard_trips_on_factor(spark):
    """ADVICE r5 / review r6: the int64 guard must bound the FACTORS
    before multiplying — a cents value past 2^31 raises instead of
    wrapping into the acceptance band."""
    import pytest
    from pyspark.sql import functions as F

    from dbt_databricks_metrics_spark.ext.sessionize import time_in_state

    ev = spark.createDataFrame(
        [
            # $30M event value -> 3e9 cents > 2^31: factor guard trips
            (1, 1, "2024-01-01 00:00:00", "a", 30_000_000.0),
            (2, 1, "2024-01-01 00:00:10", "b", 1.0),
        ],
        "event_id LONG, user_id LONG, ts STRING, event_type STRING, value DOUBLE",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    with pytest.raises(Exception, match="exceeds 2\\^31"):
        time_in_state(ev, value_col="value").collect()


def test_time_in_state_without_value(spark):
    from pyspark.sql import functions as F

    from dbt_databricks_metrics_spark.ext.sessionize import time_in_state

    ev = spark.createDataFrame(
        [(1, 1, "2024-01-01 00:00:00", "a"), (2, 1, "2024-01-01 00:00:01", "b")],
        "event_id LONG, user_id LONG, ts STRING, event_type STRING",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    (r,) = time_in_state(ev).collect()
    assert r["state"] == "a" and r["total_dwell_us"] == 1_000_000
    assert "dwell_s" not in r.asDict()

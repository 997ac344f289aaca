"""Funnel and cohort-retention operators (ext/funnel.py)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from dbt_databricks_metrics_spark.ext.funnel import cohort_retention, funnel_counts


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _mk_events(spark, rows):
    return spark.createDataFrame(
        [(u, t, datetime(2024, 1, d, h, m)) for u, t, d, h, m in rows],
        ["user_id", "event_type", "ts"],
    )


def test_funnel_hand_checked(spark):
    ev = _mk_events(spark, [
        # u1 completes in order
        (1, "a", 1, 9, 0), (1, "b", 1, 10, 0), (1, "c", 1, 11, 0),
        # u2: b before a -> stops at step 1
        (2, "b", 1, 8, 0), (2, "a", 1, 9, 0),
        # u3: a and b, no c -> step 2
        (3, "a", 1, 9, 0), (3, "b", 1, 9, 30),
        # u4: never enters
        (4, "c", 1, 9, 0),
    ])
    got = {r["step"]: r["n_users"] for r in funnel_counts(ev, ["a", "b", "c"]).collect()}
    assert got == {1: 3, 2: 2, 3: 1}


def test_funnel_greedy_matching_is_exact(spark):
    # a@9, b@10, b@12, c@11 — greedy takes b@10 so c@11 completes; matching
    # the LAST b (12) would miss it
    ev = _mk_events(spark, [
        (1, "a", 1, 9, 0), (1, "b", 1, 10, 0), (1, "b", 1, 12, 0),
        (1, "c", 1, 11, 0),
    ])
    got = {r["step"]: r["n_users"] for r in funnel_counts(ev, ["a", "b", "c"]).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_funnel_conversion_window(spark):
    ev = _mk_events(spark, [
        (1, "a", 1, 9, 0), (1, "b", 1, 9, 30),   # inside 1h
        (2, "a", 1, 9, 0), (2, "b", 1, 11, 0),   # outside 1h
    ])
    got = {r["step"]: r["n_users"]
           for r in funnel_counts(ev, ["a", "b"], within_seconds=3600).collect()}
    assert got == {1: 2, 2: 1}


def test_funnel_pct_and_validation(spark, events):
    out = funnel_counts(events, ["view", "click", "purchase"]).collect()
    pcts = {r["step"]: r["pct_of_first"] for r in out}
    assert pcts[1] == 1.0
    assert pcts[2] >= pcts[3]
    with pytest.raises(ValueError, match="2 steps"):
        funnel_counts(events, ["view"])
    with pytest.raises(ValueError, match="distinct"):
        funnel_counts(events, ["view", "view"])


def test_funnel_matches_duckdb(spark, events, duck):
    got = {
        r["step"]: (r["n_users"], r["pct_of_first"])
        for r in funnel_counts(
            events, ["view", "click", "purchase"], within_seconds=7200
        ).collect()
    }
    exp = duck.execute("""
        WITH per_user AS (
          SELECT user_id,
                 list_sort(list(ts) FILTER (event_type = 'view')) AS a0,
                 list_sort(list(ts) FILTER (event_type = 'click')) AS a1,
                 list_sort(list(ts) FILTER (event_type = 'purchase')) AS a2
          FROM events GROUP BY 1
        ),
        c1 AS (SELECT user_id, a0[1] AS t0, a1, a2 FROM per_user),
        c2 AS (SELECT user_id, t0,
                      list_filter(a1, x -> x > t0
                                   AND x <= t0 + INTERVAL 7200 SECOND)[1] AS t1,
                      a2
               FROM c1),
        c3 AS (SELECT user_id, t0, t1,
                      list_filter(a2, x -> x > t1
                                   AND x <= t0 + INTERVAL 7200 SECOND)[1] AS t2
               FROM c2)
        SELECT count(t0), count(t1), count(t2) FROM c3
    """).fetchone()
    assert got[1][0] == exp[0]
    assert got[2][0] == exp[1]
    assert got[3][0] == exp[2]


def test_retention_hand_checked(spark):
    ev = _mk_events(spark, [
        (1, "x", 1, 9, 0), (1, "x", 8, 9, 0), (1, "x", 15, 9, 0),
        (2, "x", 1, 9, 0),
        (3, "x", 8, 9, 0), (3, "x", 15, 9, 0),
    ])
    # weeks: 2024-01-01 (Mon), 2024-01-08, 2024-01-15
    got = {
        (str(r["cohort"]), r["period_offset"]): (r["n_users"], r["retention"])
        for r in cohort_retention(ev, period="week").collect()
    }
    assert got[("2024-01-01", 0)] == (2, 1.0)
    assert got[("2024-01-01", 1)] == (1, 0.5)
    assert got[("2024-01-01", 2)] == (1, 0.5)
    assert got[("2024-01-08", 0)] == (1, 1.0)
    assert got[("2024-01-08", 1)] == (1, 1.0)


def test_retention_offset0_is_cohort_size(spark, events):
    out = cohort_retention(events, period="day", max_offset=5)
    z = out.filter("period_offset = 0")
    assert z.filter("retention != 1.0").count() == 0
    total = z.agg(F.sum("n_users")).first()[0]
    assert total == events.select("user_id").distinct().count()


def test_retention_matches_duckdb(spark, events, duck):
    got = {
        (str(r["cohort"]), r["period_offset"]): r["n_users"]
        for r in cohort_retention(events, period="week").collect()
    }
    exp = duck.execute("""
        WITH firsts AS (
          SELECT user_id,
                 min(CAST(date_trunc('week', ts) AS DATE)) AS cohort
          FROM events GROUP BY 1
        ),
        activity AS (
          SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS p
          FROM events
        )
        SELECT f.cohort, CAST(datediff('day', f.cohort, a.p) / 7 AS INT) AS off,
               count(*) AS n
        FROM activity a JOIN firsts f USING (user_id)
        GROUP BY 1, 2
    """).fetchall()
    assert len(exp) == len(got)
    for cohort, off, n in exp:
        assert got[(str(cohort), off)] == n


def test_retention_validation(spark, events):
    with pytest.raises(ValueError, match="period"):
        cohort_retention(events, period="month")

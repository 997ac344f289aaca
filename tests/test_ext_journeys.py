"""Event-transition matrix ([EXT]): hand-computed chains, row-stochastic
property, start-state handling, deterministic tie-breaks, oracle parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_databricks_metrics_spark.ext.journeys import (
    event_transitions,
    top_next_events,
)
from dbt_databricks_metrics_spark.sources import load_table

from .conftest import assert_df_matches_oracle


@pytest.fixture(scope="module")
def chain(spark):
    # user 1: A -> B -> A -> C ; user 2: A -> B
    rows = [
        (1, 1, "A", "2024-01-01 00:00:00"),
        (2, 1, "B", "2024-01-01 00:01:00"),
        (3, 1, "A", "2024-01-01 00:02:00"),
        (4, 1, "C", "2024-01-01 00:03:00"),
        (5, 2, "A", "2024-01-01 00:00:30"),
        (6, 2, "B", "2024-01-01 00:01:30"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts string"
    )
    return df.withColumn("ts", F.to_timestamp("ts"))


def test_transitions_hand_computed(chain):
    got = {
        (r["from_type"], r["to_type"]): (r["n_transitions"], r["n_from"], r["p"])
        for r in event_transitions(chain).collect()
    }
    assert got[("__START__", "A")] == (2, 2, 1.0)
    assert got[("A", "B")] == (2, 3, 2 / 3)
    assert got[("A", "C")] == (1, 3, 1 / 3)
    # user 2's B is terminal (no outgoing transition), so n_from(B) = 1
    assert got[("B", "A")] == (1, 1, 1.0)
    # B->end is not a transition; no ("B", None) rows
    assert all(k[1] is not None for k in got)


def test_rows_stochastic(chain):
    rows = event_transitions(chain).collect()
    by_from = {}
    for r in rows:
        by_from.setdefault(r["from_type"], []).append(r["p"])
    for ps in by_from.values():
        assert abs(sum(ps) - 1.0) < 1e-12


def test_top_next_events(chain):
    got = [
        (r["from_type"], r["rank"], r["to_type"])
        for r in top_next_events(chain, k=1).collect()
    ]
    assert ("A", 1, "B") in got  # A's most common successor
    assert all(rank == 1 for _, rank, _ in got)


def test_transitions_vs_oracle(spark, sf_dir, duck):
    ev = load_table(spark, sf_dir, "events")
    df = event_transitions(ev)
    assert_df_matches_oracle(
        df,
        duck,
        """
        WITH seq AS (
            SELECT coalesce(
                       lag(event_type) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id),
                       '__START__') AS from_type,
                   event_type AS to_type
            FROM events
        ),
        c AS (
            SELECT from_type, to_type, count(*) AS n_transitions
            FROM seq GROUP BY 1, 2
        ),
        t AS (
            SELECT from_type, CAST(sum(n_transitions) AS BIGINT) AS n_from
            FROM c GROUP BY 1
        )
        SELECT c.from_type, c.to_type, c.n_transitions, t.n_from,
               CAST(c.n_transitions AS BIGINT) / t.n_from AS p
        FROM c JOIN t USING (from_type)
        """,
    )

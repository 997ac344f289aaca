"""Funnel and cohort-retention analysis over event streams ([EXT]).

The two standard product-analytics operators a semantic layer over an
``events`` table is expected to answer:

* **Funnel** — how many users complete step 1 → step 2 → … IN ORDER
  (each step strictly after the previous one, optionally within a
  conversion window of the first step).
* **Cohort retention** — of the users whose first activity fell in
  period P, how many were active again in P+1, P+2, …

Scale shape (100 TB posture): both are ONE user-keyed shuffle plus
result-sized aggregations. The funnel groups each user's per-step event
times into sorted arrays and walks the greedy chain with pure array
expressions (whole-stage codegen; per-user state is bounded by that
user's relevant events, never the corpus). Retention joins the per-user
first-period row against the distinct (user, period) activity set —
both sides keyed on the user id, so the join is co-partitioned with the
aggregations that produce them. No windows, no collects, no UDFs.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PERIODS = {"day": 1, "week": 7}


def funnel_counts(
    events: DataFrame,
    steps: Sequence[str],
    id_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within_seconds: Optional[int] = None,
) -> DataFrame:
    """Users reaching each funnel step in order: one row per step with
    ``(step, step_type, n_users, pct_of_first)``.

    A user reaches step k when there exist events e1 < e2 < … < ek with
    the declared types, each STRICTLY after the previous (greedy
    earliest-completion matching — picking the earliest valid event at
    every step maximizes the chance of completing later steps, so the
    count is exact, not a heuristic). With *within_seconds*, steps 2+
    must also fall within that window of the user's step-1 event.
    """
    steps = list(steps)
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")
    if len(set(steps)) != len(steps):
        raise ValueError(f"funnel steps must be distinct, got {steps}")

    ts = F.col(ts_col)
    per_user = (
        events.filter(F.col(type_col).isin(steps))
        .groupBy(id_col)
        .agg(
            *[
                F.array_sort(
                    F.collect_list(F.when(F.col(type_col) == s, ts))
                ).alias(f"_ts_{i}")
                for i, s in enumerate(steps)
            ]
        )
    )

    # greedy chain: t1 = first step-1 event; t_k = first step-k event
    # strictly after t_{k-1} (and within the window of t1, if set).
    # NB: closure factories, not default-arg lambdas — pyspark counts a
    # lambda's parameters to decide between (x) and (x, index) forms
    def _after(prev: Column):
        return lambda x: x > prev

    def _at_or_before(limit: Column):
        return lambda x: x <= limit

    reach: list[Column] = [F.try_element_at(F.col("_ts_0"), F.lit(1))]
    for i in range(1, len(steps)):
        cand = F.filter(F.col(f"_ts_{i}"), _after(reach[-1]))
        if within_seconds is not None:
            # exact interval arithmetic — unix_timestamp() would truncate
            # sub-second event times and skew the window boundary
            limit = reach[0] + F.expr(f"INTERVAL {int(within_seconds)} SECOND")
            cand = F.filter(cand, _at_or_before(limit))
        reach.append(F.try_element_at(cand, F.lit(1)))

    counts = per_user.agg(
        *[
            F.count(r).alias(f"_n_{i}")  # count() skips NULL = not reached
            for i, r in enumerate(reach)
        ]
    )
    # unpivot the 1-row count vector into one row per step; the conversion
    # ratio comes straight off the same row (no window needed)
    pairs = ", ".join(
        f"{i + 1}, '{s}', _n_{i}, round(_n_{i} / nullif(_n_0, 0), 6)"
        for i, s in enumerate(steps)
    )
    return counts.select(
        F.expr(
            f"stack({len(steps)}, {pairs}) "
            "AS (step, step_type, n_users, pct_of_first)"
        )
    )


def cohort_retention(
    events: DataFrame,
    id_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
    max_offset: Optional[int] = None,
) -> DataFrame:
    """Classic retention triangle: ``(cohort, period_offset, n_users,
    cohort_size, retention)`` — users whose FIRST event fell in *cohort*
    that were active again *period_offset* periods later (offset 0 = the
    cohort size; retention = n_users / cohort_size). ``cohort_size`` is
    the exact integer denominator, so bitwise cross-engine contracts can
    hash the (n_users, cohort_size) pair and skip the float quotient
    (rule 6 in BASELINE.md's determinism postmortem).
    """
    if period not in _PERIODS:
        raise ValueError(f"period must be one of {sorted(_PERIODS)}, got {period!r}")
    days = _PERIODS[period]
    p = F.date_trunc(period, F.col(ts_col)).cast("date")

    firsts = events.groupBy(id_col).agg(F.min(p).alias("cohort"))
    activity = events.select(F.col(id_col), p.alias("_p")).distinct()
    j = activity.join(firsts, id_col)
    offset = (F.datediff(F.col("_p"), F.col("cohort")) / days).cast("int")
    per_cell = (
        j.select(id_col, "cohort", offset.alias("period_offset"))
        .groupBy("cohort", "period_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    sizes = firsts.groupBy("cohort").agg(F.count(F.lit(1)).alias("_size"))
    out = per_cell.join(F.broadcast(sizes), "cohort").select(
        "cohort",
        "period_offset",
        "n_users",
        F.col("_size").alias("cohort_size"),
        F.round(F.col("n_users") / F.col("_size"), 6).alias("retention"),
    )
    if max_offset is not None:
        out = out.filter(F.col("period_offset") <= max_offset)
    return out

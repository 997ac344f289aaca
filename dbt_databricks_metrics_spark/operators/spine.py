"""Time-spine gap filling [EXT beyond the reference].

A grouped time series (``GROUP BY dims, date_col``) only has rows for
periods that appear in the data, so downstream consumers see gaps where
nothing happened. Metric layers conventionally densify the series against
a calendar "time spine" so every (group, period) combination exists, with
missing measures filled (0 for additive measures, NULL otherwise).

Scale posture: the spine is generated from a 1-row min/max aggregate
(``F.sequence`` + explode — bounded by calendar length, never by data
volume) and joined to the distinct group keys via a broadcast cross join;
the final left join shuffles on (groups × periods), which is exactly the
size of the densified output. No collects, no global windows.
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_STEPS = {
    "day": "interval 1 day",
    "week": "interval 7 day",
    "month": "interval 1 month",
    "quarter": "interval 3 month",
    "year": "interval 1 year",
}


def time_spine(df: DataFrame, time_col: str, step: str = "day") -> DataFrame:
    """One row per *step* between the global min and max of *time_col*.

    Built from a single 1-row aggregate: ``sequence(min, max, interval)``
    exploded — the spine's size is calendar-bounded, so it broadcasts.
    """
    if step not in _STEPS:
        raise ValueError(f"step must be one of {sorted(_STEPS)}, got {step!r}")
    bounds = df.agg(
        F.min(time_col).alias("_lo"), F.max(time_col).alias("_hi")
    )
    return bounds.select(
        F.explode(
            F.expr(f"sequence(_lo, _hi, {_STEPS[step]})")
        ).alias(time_col)
    )


def fill_time_gaps(
    df: DataFrame,
    time_col: str,
    group_cols: Sequence[str] = (),
    step: str = "day",
    fill: Optional[Mapping[str, object]] = None,
) -> DataFrame:
    """Densify *df* (one row per group × time) against a full time spine.

    Every (group, period) pair between the global min/max of *time_col*
    appears in the output; measures listed in *fill* are coalesced to the
    given value on spine-only rows, all other columns stay NULL there.

    The spine and the distinct group keys both come from *df* itself (the
    common post-aggregation case). Plan shape: 1-row bounds agg → exploded
    spine (broadcast) ⨯ distinct groups → left join back on the full key.
    """
    spine = time_spine(df, time_col, step)
    if group_cols:
        keys = df.select(*group_cols).distinct().crossJoin(F.broadcast(spine))
        join_on = [*group_cols, time_col]
    else:
        keys = spine
        join_on = [time_col]
    out = keys.join(df, on=join_on, how="left")
    for col, value in (fill or {}).items():
        out = out.withColumn(col, F.coalesce(F.col(col), F.lit(value)))
    return out


def interpolate_time_series(
    df: DataFrame,
    time_col: str,
    group_cols: Sequence[str] = (),
    value_cols: Sequence[str] = (),
    method: str = "linear",
) -> DataFrame:
    """Fill NULL gaps in a (densified) grouped time series.

    Intended to run after :func:`fill_time_gaps` with no constant fill, the
    sensor/feature-pipeline convention for non-additive measures where a
    zero-fill would be wrong:

    - ``method='locf'``: last observation carried forward. Leading NULLs
      (before a group's first observation) stay NULL.
    - ``method='linear'``: linear interpolation between the nearest non-null
      neighbors on the time axis; before the first observation the series
      backfills from the next value, after the last it carries forward.

    The time axis is measured in integral days for ``date`` columns and
    integral microseconds for ``timestamp`` columns, so the interpolation
    fraction is an exact int/int division on both Spark and any SQL oracle.

    Scale posture: two running-frame windows per value column (last/first
    ``ignorenulls`` over unbounded-preceding / unbounded-following rows
    frames), both partitioned by *group_cols* — one shuffle on the group
    key, O(n) running accumulators per partition, no global sort. With no
    group columns the window is global and the operator is only meant for
    calendar-bounded (already-aggregated) series.
    """
    if method not in ("locf", "linear"):
        raise ValueError(f"method must be 'locf' or 'linear', got {method!r}")
    from pyspark.sql import Window

    fwd = (
        Window.partitionBy(*[F.col(g) for g in group_cols])
        .orderBy(time_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bwd = (
        Window.partitionBy(*[F.col(g) for g in group_cols])
        .orderBy(time_col)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    dtype = df.schema[time_col].dataType.simpleString()
    if dtype == "date":
        def delta(a, b):  # integral days
            return F.datediff(a, b)
    else:
        def delta(a, b):  # integral microseconds
            return F.unix_micros(a) - F.unix_micros(b)

    t = F.col(time_col)
    for col in value_cols:
        c = F.col(col)
        prev_v = F.last(c, ignorenulls=True).over(fwd)
        if method == "locf":
            df = df.withColumn(col, F.coalesce(c, prev_v))
            continue
        prev_t = F.last(F.when(c.isNotNull(), t), ignorenulls=True).over(fwd)
        next_v = F.first(c, ignorenulls=True).over(bwd)
        next_t = F.first(F.when(c.isNotNull(), t), ignorenulls=True).over(bwd)
        frac = delta(t, prev_t).cast("double") / delta(next_t, prev_t)
        filled = (
            F.when(c.isNotNull(), c)
            .when(prev_v.isNull(), next_v)
            .when(next_v.isNull(), prev_v)
            .otherwise(prev_v + (next_v - prev_v) * frac)
        )
        df = df.withColumn(col, filled)
    return df

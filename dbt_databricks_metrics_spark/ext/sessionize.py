"""Event-stream operators over the `events` fixture ([EXT]).

* sessionize           — gap-based session ids per user (lag + cumulative
                         sum of boundary flags), the classic Window recipe
* debounce             — drop burst repeats: keep only the first event of
                         each chain of same-key events spaced <= gap apart
* session_stats        — per-session aggregates
* tumbling_window_agg  — fixed-window time aggregation via `F.window`
* user_activity        — per-user rollups incl. conditional aggregates

Batch forms here; `streaming/` holds the Structured Streaming variants
(watermark + session_window) for late/out-of-order data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_GAP_MINUTES = 30


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = DEFAULT_GAP_MINUTES,
) -> DataFrame:
    """Assign `session_id` = `<user>-<n>` by splitting each user's ordered
    event stream wherever the gap to the previous event exceeds the
    threshold. One shuffle (partition by user), then linear per-partition
    window work — the standard scalable sessionization plan.
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), "event_id")
    gap_us = gap_minutes * 60 * 1_000_000
    prev_ts = F.lag(F.col(ts_col)).over(w)

    # unix_micros only accepts TIMESTAMP (not TIMESTAMP_NTZ, which parquet
    # yields for isAdjustedToUTC=false columns); the session tz is pinned to
    # UTC so the cast is micros-preserving for both input types
    def _micros(c):
        return F.unix_micros(c.cast("timestamp"))

    new_session = F.when(
        prev_ts.isNull() | (_micros(F.col(ts_col)) - _micros(prev_ts) > gap_us),
        F.lit(1),
    ).otherwise(F.lit(0))
    return events.withColumn("_new", new_session).withColumn(
        "session_seq", F.sum("_new").over(w)
    ).withColumn(
        "session_id",
        F.concat_ws("-", F.col(user_col).cast("string"), F.col("session_seq")),
    ).drop("_new")


def debounce(
    events: DataFrame,
    key_cols=("user_id", "event_type"),
    ts_col: str = "ts",
    gap_seconds: int = 600,
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Keep only the first event of each same-key burst.

    A burst is a chain of events with the same *key_cols* where each event
    arrives within *gap_seconds* of the previous one (chained, like
    sessionization — NOT a fixed window from the burst head). The classic
    clickstream cleaning step for double-clicks / retry storms / sensor
    chatter, and the event-stream member of the dedup family.

    Gap arithmetic is integral microseconds, so an SQL oracle reproduces
    it exactly. Plan: one shuffle on the key, a single lag per partition,
    then a filter — the row survives iff it *starts* a burst. O(n) per
    partition, no second window pass.
    """
    keys = [F.col(k) for k in key_cols]
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col), order_tiebreak)
    gap_us = gap_seconds * 1_000_000

    def _micros(c):
        return F.unix_micros(c.cast("timestamp"))

    prev_ts = F.lag(F.col(ts_col)).over(w)
    starts_burst = prev_ts.isNull() | (
        _micros(F.col(ts_col)) - _micros(prev_ts) > gap_us
    )
    return events.withColumn("_keep", starts_burst).filter(F.col("_keep")).drop(
        "_keep"
    )


def session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = DEFAULT_GAP_MINUTES,
) -> DataFrame:
    """Per-session: bounds, duration, event count, value sum."""
    s = sessionize(events, user_col, ts_col, gap_minutes)
    return s.groupBy(user_col, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (F.max(F.col(ts_col).cast("long")) - F.min(F.col(ts_col).cast("long"))).alias(
            "duration_sec"
        ),
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("total_value"),
    )


def tumbling_window_agg(
    events: DataFrame,
    window_duration: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Events per (window, event_type) over fixed tumbling windows."""
    return (
        events.groupBy(
            F.window(F.col(ts_col), window_duration).alias("win"), F.col("event_type")
        )
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_window_agg(
    events: DataFrame,
    window_duration: str = "2 hours",
    slide_duration: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Overlapping (hopping) windows: each event lands in
    duration/slide windows; starts are epoch-aligned multiples of the
    slide. Same shape as ``tumbling_window_agg`` — ``F.window`` explodes
    the event into its windows before the aggregate, so the plan is one
    shuffle on (window, event_type) regardless of overlap factor."""
    return (
        events.groupBy(
            F.window(F.col(ts_col), window_duration, slide_duration).alias("win"),
            F.col("event_type"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def user_activity(events: DataFrame, user_col: str = "user_id") -> DataFrame:
    """Per-user activity rollup (count, distinct types, span, value stats)."""
    return events.groupBy(user_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct(F.col("event_type")).alias("n_event_types"),
        F.min("ts").alias("first_seen"),
        F.max("ts").alias("last_seen"),
        F.sum("value").alias("total_value"),
        F.avg("value").alias("avg_value"),
    )

"""Stream-stream watermarked interval join ([EXT]).

The one classic Structured Streaming operator the repo did not yet
exercise: joining TWO live event streams on a key plus an event-time
range — the attribution shape ("which purchases happened within H hours
of a click by the same user?") every clickstream pipeline needs.

Semantics (identical batch and streaming):

    left.key == right.key
    AND right.ts >= left.ts
    AND right.ts <= left.ts + max_gap

Scale shape (100 TB posture): Spark's stream-stream inner join keeps
BOTH sides' unmatched rows in state; the watermark plus the explicit
time-range condition let the state store evict a left row once the
right watermark passes ``left.ts + max_gap`` (and vice versa), so state
is bounded by rate x (watermark + max_gap), not by the stream's history.
Without the range condition the state would grow forever — that is why
``max_gap`` is a required argument, not an optional filter. In batch
mode the same expression compiles to a plain shuffled equi-join on the
key with the range as a post-join predicate (Catalyst pushes the
equality into the exchange; the range never multiplies the shuffle).

Reference parity: the reference project is batch-only dbt models
(dbt-databricks-metrics README.md:1-40); this extends its event-funnel
story (`models/schema.yml` event marts) to live streams the Spark-first
way — same DataFrame expression, two execution modes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    max_gap: str = "30 minutes",
    watermark: str = "1 hour",
    left_prefix: str = "l",
    right_prefix: str = "r",
) -> DataFrame:
    """Inner-join *left* and *right* events of the same *key* where the
    right event lands in ``[left.ts, left.ts + max_gap]``.

    Every column of both inputs survives, disambiguated as
    ``{left_prefix}_{col}`` / ``{right_prefix}_{col}``; a ``gap_seconds``
    column (right.ts - left.ts) is appended.  On streaming inputs both
    sides get ``withWatermark(ts_col, watermark)`` — required by Spark
    for stream-stream joins, and what bounds the join state.
    """
    if left_prefix == right_prefix:
        raise ValueError("left_prefix and right_prefix must differ")
    l = left
    r = right
    if l.isStreaming:
        l = l.withWatermark(ts_col, watermark)
    if r.isStreaming:
        r = r.withWatermark(ts_col, watermark)
    l = l.select([F.col(c).alias(f"{left_prefix}_{c}") for c in left.columns])
    r = r.select([F.col(c).alias(f"{right_prefix}_{c}") for c in right.columns])
    lts = f"{left_prefix}_{ts_col}"
    rts = f"{right_prefix}_{ts_col}"
    cond = (
        (F.col(f"{left_prefix}_{key}") == F.col(f"{right_prefix}_{key}"))
        & (F.col(rts) >= F.col(lts))
        & (F.col(rts) <= F.col(lts) + F.expr(f"INTERVAL {max_gap}"))
    )
    return l.join(r, cond, "inner").withColumn(
        "gap_seconds",
        (F.col(rts).cast("double") - F.col(lts).cast("double")),
    )


def stream_static_enrich(stream_df, static_df, on, how: str = "left"):
    """Stream-static join — the standard streaming enrichment pattern
    (events × dimension table). Structured Streaming joins each
    micro-batch against the static side with plain batch semantics
    (public Spark behavior): STATELESS — no watermark, no state store,
    append-mode safe. The static side is re-planned per micro-batch, so
    at cluster scale it follows the same rules as batch joins: broadcast
    when it fits ``autoBroadcastJoinThreshold``, pre-bucketed layout
    otherwise. Inner and left joins are supported by Spark for the
    stream-on-the-left orientation; right/full would need the stream's
    unmatched rows to wait forever, so they are rejected here.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"stream-static join supports how='inner'|'left', got {how!r}"
        )
    return stream_df.join(static_df, on=on, how=how)

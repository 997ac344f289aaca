"""User-journey transition analysis ([EXT]) — the Markov-chain view of an
event stream (product analytics' sankey/flow diagram input; complements
``ext/funnel.py``'s fixed-sequence counts with the full transition
matrix).

Scale shape: one window (lag over each user's time-ordered events —
shuffle keyed by user, the same key sessionization uses) then one
groupBy on (from, to); the matrix is |event_types|² rows. Probabilities
divide identical int64 counts, so they reproduce bit-for-bit in any
engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    include_start: bool = True,
) -> DataFrame:
    """(from_type, to_type, n_transitions, n_from, p) — the first-order
    transition matrix over each user's time-ordered event sequence.

    ``include_start`` adds a synthetic ``__START__`` source for each
    user's first event (entry-point distribution). Ordering ties break
    on *id_col*, so the lag is deterministic under any layout. ``p`` =
    n_transitions / n_from (row-stochastic per from_type; both operands
    exact int64 counts).
    """
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    prev = F.lag(F.col(type_col)).over(w)
    pairs = events.select(
        (
            F.coalesce(prev, F.lit("__START__"))
            if include_start
            else prev
        ).alias("from_type"),
        F.col(type_col).alias("to_type"),
    )
    if not include_start:
        pairs = pairs.filter(F.col("from_type").isNotNull())
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    totals = counts.groupBy("from_type").agg(
        F.sum("n_transitions").alias("n_from")
    )
    return counts.join(F.broadcast(totals), "from_type").select(
        "from_type",
        "to_type",
        "n_transitions",
        "n_from",
        (F.col("n_transitions") / F.col("n_from")).alias("p"),
    )


def top_next_events(
    events: DataFrame,
    k: int = 3,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Per from_type, the k most likely next events (rank by transition
    count desc, to_type asc — deterministic). The matrix is tiny
    (|types|² rows), so the ranking window is trivial."""
    m = event_transitions(
        events, user_col, ts_col, type_col, id_col, include_start=False
    )
    w = Window.partitionBy("from_type").orderBy(
        F.col("n_transitions").desc(), F.col("to_type")
    )
    return (
        m.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("from_type", "rank", "to_type", "n_transitions", "n_from", "p")
    )

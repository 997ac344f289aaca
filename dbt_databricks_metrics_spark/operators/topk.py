"""Grouped top-k — the ubiquitous 'best N per group' operator.

Spark has no `LIMIT ... PER GROUP`; the canonical plan is a window
`row_number` ≤ k. For small k Spark's window is fine at any scale (one
shuffle, per-partition heapless sort — with AQE skew handling for hot
groups). Ties break by the explicit tiebreaker columns so results stay
deterministic and oracle-comparable.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    k: int,
    ascending: bool = False,
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """k rows per group by order_col (desc by default), deterministic."""
    oc = F.col(order_col).asc() if ascending else F.col(order_col).desc()
    order = [oc] + [F.col(t).asc() for t in tiebreakers]
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy(*order)
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )

"""Aggregate privacy governance for training corpora ([EXT]).

k-anonymity (Sweeney 2002, public): a release is k-anonymous when every
combination of quasi-identifier values is shared by >= k rows — groups
below k single out individuals and must be suppressed or generalized.
This complements ``ext/redact.py`` (pattern-level PII removal) with the
AGGREGATE leak check a curation pipeline runs before exporting metadata
tables alongside a corpus.

Scale shape: one groupBy over the quasi-identifier columns (the same
shuffle a metric view's aggregation pays), then suppression is a
broadcast-able anti-join of the small-group keys — the data table is
never shuffled for suppression.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_groups(
    df: DataFrame, quasi_cols: Sequence[str], k: int = 5
) -> DataFrame:
    """(quasi..., group_size, suppressed): every quasi-identifier
    combination with its row count and whether it violates k."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    return df.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.count(F.lit(1)).alias("group_size")
    ).withColumn("suppressed", F.col("group_size") < k)


def k_anonymity_report(
    df: DataFrame, quasi_cols: Sequence[str], k: int = 5
) -> DataFrame:
    """One summary row: group/row counts on both sides of the k line and
    the achieved anonymity level (min surviving group size; 0 when
    nothing survives)."""
    g = k_anonymity_groups(df, quasi_cols, k)
    return g.agg(
        F.lit(k).alias("k"),
        F.count(F.lit(1)).alias("n_groups"),
        F.count(F.when(F.col("suppressed"), 1)).alias("n_groups_suppressed"),
        F.sum("group_size").alias("n_rows"),
        F.coalesce(
            F.sum(F.when(F.col("suppressed"), F.col("group_size"))), F.lit(0)
        ).alias("n_rows_suppressed"),
        F.coalesce(
            F.min(F.when(~F.col("suppressed"), F.col("group_size"))), F.lit(0)
        ).alias("achieved_k"),
    )


def suppress_small_groups(
    df: DataFrame, quasi_cols: Sequence[str], k: int = 5
) -> DataFrame:
    """Drop every row whose quasi-identifier group is smaller than k —
    the release then IS k-anonymous over those columns. The violating
    keys are a (small) anti-join side; the data table is scanned once."""
    small = (
        k_anonymity_groups(df, quasi_cols, k)
        .filter(F.col("suppressed"))
        .select(*quasi_cols)
    )
    return df.join(F.broadcast(small), list(quasi_cols), "left_anti")

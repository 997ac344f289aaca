"""Sequence packing for training-data preparation ([EXT]).

Pre-training pipelines pack documents into fixed token-budget bins
(context-window fills). Exact first-fit is inherently sequential, so the
scalable recipe is *contiguous packing*: within each partition group
(e.g. language), order documents deterministically, take the running
token total, and assign ``bin_id = floor(previous_cumsum / budget)``.
Each bin's total lands within one document of the budget — the same
guarantee streaming packers give — and the whole operator is one window
cumsum (single shuffle on the partition keys) at any scale.

Determinism: ordering is (token_count DESC, id) so re-runs and different
cluster sizes produce identical bins.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import with_token_stats


def pack_bins(
    docs: DataFrame,
    budget_tokens: int,
    part_cols: Sequence[str] = ("lang",),
    id_col: str = "doc_id",
    text_col: str = "text",
    token_col: str | None = None,
) -> DataFrame:
    """Assign every document a ``bin_id`` within its partition group.

    *token_col* names a precomputed token-count column; when None the
    whitespace token count is derived from *text_col*. Documents larger
    than the budget get their own bin (they'd be truncated downstream).
    Returns the input columns + ``n_tokens`` + ``bin_id``.
    """
    if budget_tokens <= 0:
        raise ValueError("budget_tokens must be positive")
    if token_col is None:
        d = with_token_stats(docs, text_col).withColumn(
            "n_tokens", F.col("ws_token_count").cast("long")
        ).drop("ws_token_count", "bpe_piece_count", "char_len")
    else:
        d = docs.withColumn("n_tokens", F.col(token_col).cast("long"))
    w = (
        Window.partitionBy(*[F.col(c) for c in part_cols])
        .orderBy(F.col("n_tokens").desc(), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return d.withColumn(
        "bin_id",
        F.floor((cum - F.col("n_tokens")) / F.lit(budget_tokens)).cast("long"),
    )


def bin_stats(
    docs: DataFrame,
    budget_tokens: int,
    part_cols: Sequence[str] = ("lang",),
    id_col: str = "doc_id",
    text_col: str = "text",
    token_col: str | None = None,
) -> DataFrame:
    """Per-bin fill summary: (part_cols…, bin_id, n_docs, total_tokens)."""
    packed = pack_bins(docs, budget_tokens, part_cols, id_col, text_col, token_col)
    return packed.groupBy(*[F.col(c) for c in part_cols], "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )

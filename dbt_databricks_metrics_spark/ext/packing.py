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


def shard_plan(
    docs: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic training-shard assignment + balance audit.

    Training jobs consume a corpus as N fixed shards; the assignment must
    be (a) stable across re-runs and engines (resumable training), and
    (b) well-mixed, so no shard is dominated by one crawl segment or id
    range. ``id % N`` fails (b) for clustered ids, and engine-native
    hashes fail (a) — so the shard key is an explicit Knuth
    multiplicative hash, plain int64 arithmetic any engine reproduces
    bit-for-bit. The reduction to N buckets takes the hash's HIGH bits
    (fixed-point range reduction): for a multiplicative hash, bit k of
    ``id·c`` depends only on bits ≤ k of ``id``, so a low-bits ``mod N``
    with power-of-2 N degenerates to ``id mod N`` (c is odd ⇒ c ≡ 1 mod
    small 2^j) — the exact clustered-id failure being avoided:

        shard = (((id · 2654435761) mod 2³²) · N) div 2³²

    Returns one row per shard: (shard_id, n_docs, n_tokens, id_checksum)
    — all integers. The balance check is the consumer's: max(n_tokens) /
    min(n_tokens) ≈ 1 for healthy mixing. One map-only scan + one
    groupBy over an N-row domain; the assignment column itself
    (``assign_shards``) is reusable as a write-partitioning key, so the
    physical shard files fall out of a single ``partitionBy`` write.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    return assign_shards(docs, n_shards, id_col, text_col).groupBy(
        "shard_id"
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.sum(F.col(id_col).cast("bigint")).alias("id_checksum"),
    )


def assign_shards(
    docs: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc shard assignment (see :func:`shard_plan`): adds integer
    ``shard_id`` and ``n_tokens`` columns, map-only."""
    # high-bits reduction (see shard_plan docstring); (2^32-1)·N stays
    # far inside int64 for any sane shard count. Integer DIV — float /
    # would lose exactness past 2^53.
    shard = F.expr(
        f"(pmod(CAST(`{id_col}` AS BIGINT) * 2654435761, 4294967296)"
        f" * {int(n_shards)}) DIV 4294967296"
    )
    n_tok = F.when(
        F.length(F.trim(F.col(text_col))) == 0, F.lit(0)
    ).otherwise(F.size(F.split(F.trim(F.col(text_col)), r"\s+")))
    return docs.withColumn("shard_id", shard.cast("bigint")).withColumn(
        "n_tokens", n_tok.cast("bigint")
    )


def pack_token_stream(
    docs: DataFrame,
    seq_len: int,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """GPT-style contiguous token-stream packing: within each training
    shard, documents concatenate in deterministic id order into one token
    stream that is cut into fixed ``seq_len`` sequences — documents SPAN
    sequence boundaries (the standard pretraining pack; the bin-packing
    in :func:`pack_bins` is the no-splitting alternative for SFT).

    Per-doc placement, all exact integers: (id, shard_id, n_tokens,
    start_tok [exclusive-cumsum offset within the shard's stream],
    end_tok, first_seq, last_seq [global sequence ids =
    shard_id * ceil(shard_stream / seq_len) would need the stream length,
    so sequence ids are SHARD-LOCAL: floor(offset / seq_len)]). Zero-token
    docs occupy no stream space (first_seq = last_seq = the sequence at
    their offset).

    Scale shape: the cumulative offset is a window ordered by id within
    each shard — exactly n_shards reducers, so size n_shards to the
    cluster (hundreds at 100 TB; the same knob shard_plan exposes). One
    shuffle, map-only otherwise.
    """
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    assigned = assign_shards(docs, n_shards, id_col, text_col)
    w = (
        Window.partitionBy("shard_id")
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    out = assigned.select(
        F.col(id_col),
        "shard_id",
        "n_tokens",
        start.alias("start_tok"),
    ).withColumn("end_tok", F.col("start_tok") + F.col("n_tokens"))
    return out.select(
        id_col,
        "shard_id",
        "n_tokens",
        "start_tok",
        "end_tok",
        F.expr("start_tok DIV " + str(int(seq_len))).alias("first_seq"),
        F.expr(
            f"greatest(end_tok - 1, start_tok) DIV {int(seq_len)}"
        ).alias("last_seq"),
    )

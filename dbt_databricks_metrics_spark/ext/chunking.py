"""Document chunking for embedding/RAG pipelines ([EXT]).

Splits long documents into fixed-size, optionally overlapping character
chunks with stable ids and offsets — the standard pre-embedding step.
Pure explode-of-transform (map-side; the only data growth is the overlap
factor), deterministic at any partitioning, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _bind_once


def chunk_documents(
    df: DataFrame,
    chunk_chars: int = 512,
    overlap_chars: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One row per chunk: (id_col, chunk_idx, chunk_start, chunk_text).

    Chunk starts step by ``chunk_chars - overlap_chars``; the final chunk
    may be shorter. Empty and NULL documents produce a single empty chunk
    so no document silently disappears from the pipeline (a NULL text
    would otherwise yield a NULL chunk array that ``explode`` drops).
    ``chunk_start`` is a 0-based character offset (provenance for
    span-level dedup/redaction).
    """
    if chunk_chars <= 0:
        raise ValueError("chunk_chars must be positive")
    if not 0 <= overlap_chars < chunk_chars:
        raise ValueError("overlap_chars must be in [0, chunk_chars)")
    step = chunk_chars - overlap_chars
    t = F.coalesce(F.col(text_col), F.lit(""))
    # number of chunks: ceil(max(len - overlap, 1) / step), at least 1
    n_chunks = F.greatest(
        F.ceil(F.greatest(F.length(t) - F.lit(overlap_chars), F.lit(1)) / F.lit(step)),
        F.lit(1),
    ).cast("int")
    chunks = _bind_once(
        t,
        lambda s: F.transform(
            F.sequence(F.lit(0), n_chunks - F.lit(1)),
            lambda i: F.struct(
                i.alias("chunk_idx"),
                (i * F.lit(step)).alias("chunk_start"),
                s.substr(i * F.lit(step) + F.lit(1), F.lit(chunk_chars)).alias(
                    "chunk_text"
                ),
            ),
        ),
    )
    return df.select(
        F.col(id_col), F.explode(chunks).alias("_c")
    ).select(
        id_col,
        F.col("_c.chunk_idx").alias("chunk_idx"),
        F.col("_c.chunk_start").alias("chunk_start"),
        F.col("_c.chunk_text").alias("chunk_text"),
    )

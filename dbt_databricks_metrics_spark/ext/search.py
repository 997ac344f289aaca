"""Keyword search over a document corpus ([EXT]).

IDF-weighted term matching (the BM25 idf component over distinct-term
presence): ``score(d, q) = Σ_{t ∈ q, t ∈ d} ln(1 + (N - df_t + 0.5) /
(df_t + 0.5))``.

Plan shape for scale: document frequencies for the (few) query terms come
from one filtered aggregate over the exploded token index; the per-doc
scoring pass is then a single scan with the idf weights folded in as
literals — no join against a vocabulary table, no UDFs. At 100 TB the
token index would be a prebuilt bucketed table; the scoring scan is
embarrassingly parallel either way.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _tokens(text_col: str) -> Column:
    """Distinct lowercase word tokens."""
    return F.array_distinct(
        F.split(
            F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"[^a-z0-9\s]", " "),
            r"\s+",
        )
    )


def term_document_frequencies(
    docs: DataFrame, terms: Sequence[str], text_col: str = "text"
) -> dict[str, int]:
    """df_t for each query term, in one aggregate pass."""
    toks = _tokens(text_col)
    row = docs.agg(
        *[
            F.count_if(F.array_contains(toks, t.lower())).alias(f"df_{i}")
            for i, t in enumerate(terms)
        ]
    ).first()
    return {t: int(row[f"df_{i}"]) for i, t in enumerate(terms)}


def idf(n_docs: int, df_t: int) -> float:
    return math.log(1.0 + (n_docs - df_t + 0.5) / (df_t + 0.5))


def _all_tokens(text_col: str) -> Column:
    """All lowercase word tokens (with repeats — BM25 needs tf)."""
    return F.filter(
        F.split(
            F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"[^a-z0-9\s]", " "),
            r"\s+",
        ),
        lambda t: F.length(t) > 0,
    )


def bm25_search(
    docs: DataFrame,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k by full BM25 (Robertson/Spärck Jones, public):

        score(d,q) = Σ_t idf_t · tf_t·(k1+1) / (tf_t + k1·(1−b+b·|d|/avgdl))

    Same two-phase shape as :func:`keyword_search`: ONE aggregate pass
    computes N, avgdl and every query term's document frequency (a
    handful of scalars — the "model"), which fold into the scoring scan
    as literals. The scan is map-only + TakeOrderedAndProject: per doc,
    tf comes from counting the term in the (non-distinct) token array.
    No vocabulary-table join, no UDFs, no global sort.
    """
    terms = [t for t in query.lower().split() if t]
    if not terms:
        raise ValueError("empty query")
    toks_all = _all_tokens(text_col)
    toks_set = _tokens(text_col)
    stats = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.size(toks_all)).alias("avgdl"),
        *[
            F.count_if(F.array_contains(toks_set, t)).alias(f"df_{i}")
            for i, t in enumerate(terms)
        ],
    ).first()
    n_docs, avgdl = int(stats["n"]), float(stats["avgdl"] or 0.0)
    if avgdl <= 0:
        raise ValueError("corpus has no tokens")

    from .dedup import _bind_once

    def score_of(toks: Column) -> Column:
        dl = F.size(toks)
        norm = F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dl / F.lit(avgdl))
        score = F.lit(0.0)
        matched = F.lit(0)
        for i, t in enumerate(terms):
            tf = F.size(F.filter(toks, lambda x: x == F.lit(t)))  # noqa: B023
            w = F.lit(round(idf(n_docs, int(stats[f"df_{i}"])), 9))
            score = score + w * (tf * F.lit(k1 + 1.0)) / (tf + norm)
            matched = matched + (tf > 0).cast("int")
        return F.struct(
            F.round(score, 6).alias("score"), matched.alias("n_matched")
        )

    sm = _bind_once(toks_all, score_of)
    return (
        docs.select(
            F.col(id_col), sm["score"].alias("score"), sm["n_matched"].alias("n_matched")
        )
        .filter(F.col("n_matched") > 0)
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )


def keyword_search(
    docs: DataFrame,
    query: str,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents by summed idf of matched query terms.

    Deterministic: ties break by id. Documents matching no term are
    excluded. Returns (id, score, n_matched).
    """
    terms = [t for t in query.lower().split() if t]
    if not terms:
        raise ValueError("empty query")
    n_docs = docs.count()
    dfs = term_document_frequencies(docs, terms, text_col)
    toks = _tokens(text_col)
    score = None
    matched = None
    for t in terms:
        hit = F.array_contains(toks, t).cast("int")
        s = hit * F.lit(round(idf(n_docs, dfs[t]), 9))
        score = s if score is None else score + s
        matched = hit if matched is None else matched + hit
    return (
        docs.select(
            F.col(id_col),
            F.round(score, 6).alias("score"),
            matched.alias("n_matched"),
        )
        .filter(F.col("n_matched") > 0)
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )

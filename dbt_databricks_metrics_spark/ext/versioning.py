"""Corpus version diffing ([EXT]) — the audit step between two releases
of a training corpus: which documents were added, removed, changed, or
carried unchanged, without ever shuffling document text.

Training-data pipelines re-release corpora constantly (new crawl, new
filter thresholds, dedup policy changes); the release gate wants a diff
summary ("this bump removes 4% and rewrites 11% — expected?") plus the
per-doc status table that downstream incremental jobs consume (re-embed
only added+changed). Content equality is decided on 8-byte xxhash64
fingerprints of normalized text — the same fingerprint ``ext/dedup``
keys on — so the full-outer join that powers the diff moves 16 bytes
per doc, not the text. (Collision risk ~ n²/2⁶⁵: at a billion docs,
~3·10⁻²; at trillion-doc scale switch the fingerprint to a 128-bit
hash — the plan is unchanged.)

Scale shape: two map-only fingerprint scans + ONE full-outer equi-join
on id + one groupBy over a 4-row status domain. No window, no collect,
no text shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import normalized_text


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document diff status between two corpus versions.

    Returns (id_col, status) with status ∈ {'added', 'removed',
    'changed', 'unchanged'}. Ids must be unique within each version.
    """
    fp = F.xxhash64(normalized_text(text_col))
    o = old.select(F.col(id_col), fp.alias("_fp_old"))
    n = new.select(F.col(id_col), fp.alias("_fp_new"))
    j = o.join(n, id_col, "full_outer")
    status = (
        F.when(F.col("_fp_old").isNull(), F.lit("added"))
        .when(F.col("_fp_new").isNull(), F.lit("removed"))
        .when(F.col("_fp_old") == F.col("_fp_new"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(F.col(id_col), status.alias("status"))


def diff_summary(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Release-gate rollup of :func:`corpus_diff`: one row per status
    with the doc count and an id checksum (sum of ids — integer, so the
    summary is bit-reproducible cross-engine and cheap to compare
    against the previous release's gate record).
    """
    d = corpus_diff(old, new, id_col=id_col, text_col=text_col)
    return d.groupBy("status").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(id_col).cast("bigint")).alias("id_checksum"),
    )


def incremental_targets(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The downstream work-list a corpus bump implies: which documents an
    incremental consumer (embedding index, feature store, search index)
    must re-process (``upsert`` = added or changed) and which it must
    evict (``delete`` = removed). Unchanged docs never appear — the whole
    point of consuming the diff instead of the corpus.

    Same single fingerprint full-outer join as :func:`corpus_diff`; the
    work-list is corpus-bump-sized, not corpus-sized.
    """
    d = corpus_diff(old, new, id_col=id_col, text_col=text_col)
    return d.filter(F.col("status") != "unchanged").select(
        F.col(id_col),
        F.when(F.col("status") == "removed", F.lit("delete"))
        .otherwise(F.lit("upsert"))
        .alias("action"),
    )

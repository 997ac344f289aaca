"""Winnowing — local document fingerprints for *passage-level* overlap
([EXT]; Schleimer, Wilkerson & Aiken, "Winnowing: Local Algorithms for
Document Fingerprinting", SIGMOD 2003 — public algorithm).

Whole-document fingerprints (``textstats.with_fingerprint``) and MinHash
(``dedup.py``) answer "are these documents near-identical overall?".
Winnowing answers the complementary question training-data pipelines
also need: "do these documents SHARE A PASSAGE?" — quote reuse,
boilerplate headers, copied paragraphs inside otherwise-different pages.

Algorithm (all native column expressions, zero Python UDFs):

1. normalize text (lower, collapse whitespace — same normalization as
   ``dedup.normalized_text`` so the dedup family agrees on input),
2. hash every character k-gram → sequence ``h[1..n-k+1]``,
3. slide a window of ``w`` consecutive hashes; keep the minimum of each
   window; the distinct kept hashes are the document's fingerprints.

Guarantee (the paper's): any substring of length ≥ ``w + k - 1`` shared
by two documents contributes at least one SHARED fingerprint — detection
is certain above the noise threshold, not probabilistic like LSH. The
density is ~2/(w+1), so a document emits ~2·len/(w+1) fingerprints.

Scale shape (100 TB posture): fingerprinting is map-only and computed
exactly once; the pair finding is ``explode → groupBy fingerprint
(collect ids, capped by max_df) → explode pairs → count per pair`` —
two shuffles total, moving only (8-byte hash, doc_id) tuples, never
text. ``max_df`` bounds the fan-out of boilerplate fingerprints exactly
like contamination's hot-gram guard, so no group array exceeds max_df
ids and the pair expansion is O(max_df²) per hot fingerprint at worst.

Hashing: ``hash_fn="xxhash64"`` (default) is the production choice —
one JVM hash per position. ``hash_fn="md5"`` keeps the first 16 hex
chars of the standardized MD5 digest, which DuckDB reproduces
bit-for-bit — the contract query's oracle uses it (same pattern as
``sampling.bucket(hash_fn="multiplicative")``).

Reference parity: the reference project has no passage-overlap operator;
this extends the dedup/contamination family the way its README's
curation story implies (dbt-databricks-metrics README.md:1-40 frames the
project as the query layer of a curation pipeline).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import _bind_once, _norm_col


def _gram_hash(gram: Column, hash_fn: str) -> Column:
    if hash_fn == "xxhash64":
        return F.xxhash64(gram)
    if hash_fn == "md5":
        # first 64 bits of the standardized digest, as lowercase hex —
        # lexicographic min over these == numeric min over the 64 bits,
        # and DuckDB's md5() emits the identical string.
        return F.md5(gram).substr(1, 16)
    raise ValueError(f"unknown hash_fn {hash_fn!r}")


def winnow_fingerprint_col(
    text_col: str = "text", k: int = 8, w: int = 4, hash_fn: str = "xxhash64"
) -> Column:
    """Array of distinct winnowing fingerprints for a text column.

    Degenerate inputs stay fingerprintable: texts shorter than ``k``
    hash whole (one fingerprint); texts with fewer than ``w`` k-grams
    keep the global minimum hash (the window covers everything).
    NULL text → empty array (the document survives with no passages,
    mirroring ``chunking``'s no-document-disappears rule).
    """
    if k < 2 or w < 1:
        raise ValueError(f"need k >= 2, w >= 1; got k={k}, w={w}")

    def fps(t: Column) -> Column:
        n_grams = F.length(t) - F.lit(k - 1)
        hashes = F.transform(
            F.sequence(F.lit(1), n_grams),
            lambda i: _gram_hash(t.substr(i, F.lit(k)), hash_fn),
        )
        # per-window min via least(element_at...) — w is small, and this
        # avoids allocating a slice array per position (measured ~2x on
        # the sf0.1 corpus vs array_min(slice(...)))
        windowed = _bind_once(
            hashes,
            lambda hs: F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size(hs) - F.lit(w - 1)),
                    lambda j: F.least(
                        *[F.element_at(hs, (j + F.lit(i)).cast("int")) for i in range(w)]
                    )
                    if w > 1
                    else F.element_at(hs, j.cast("int")),
                )
            ),
        )
        return (
            F.when(F.length(t) == 0, F.array().cast(_arr_type(hash_fn)))
            .when(F.length(t) < k, F.array(_gram_hash(t, hash_fn)))
            .when(n_grams < w, _bind_once(hashes, lambda hs: F.array(F.array_min(hs))))
            .otherwise(windowed)
        )

    return _bind_once(F.coalesce(_norm_col(text_col), F.lit("")), fps)


def _arr_type(hash_fn: str) -> str:
    return "array<string>" if hash_fn == "md5" else "array<bigint>"


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id, fingerprint) — one row per distinct fingerprint per document."""
    return df.select(
        F.col(id_col),
        F.explode(winnow_fingerprint_col(text_col, k, w, hash_fn)).alias("fingerprint"),
    )


def winnow_overlap_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
    min_shared: int = 2,
    max_df: int = 50,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Document pairs sharing ≥ ``min_shared`` winnowing fingerprints —
    i.e. pairs that share at least one passage of ≥ w+k-1 chars (and in
    practice several, at min_shared > 1).

    ``max_df`` drops fingerprints present in more than that many
    documents before the join — boilerplate passages ("all rights
    reserved") otherwise create quadratic fan-out on a hot key; this is
    the same guard as contamination's hot-gram filter and is the knob
    that keeps the join skew-free at corpus scale.

    Output: (id_a, id_b, n_shared) with id_a < id_b.
    """
    # Single pass over the corpus: fingerprint once, group ids per
    # fingerprint (bounded by max_df, so each group array is tiny), and
    # expand pairs with two explodes — no self-join, so the expensive
    # per-position hashing is computed exactly once and the plan has two
    # shuffles total (by fingerprint, then by pair).
    fps = winnow_fingerprints(df, id_col, text_col, k, w, hash_fn)
    groups = (
        fps.groupBy("fingerprint")
        .agg(F.collect_list(id_col).alias("_ids"))
        .filter((F.size("_ids") >= 2) & (F.size("_ids") <= max_df))
    )
    return (
        groups.select(F.explode("_ids").alias("id_a"), F.col("_ids"))
        .select("id_a", F.explode("_ids").alias("id_b"))
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= F.lit(min_shared))
    )

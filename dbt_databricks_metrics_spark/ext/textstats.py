"""Text-analysis operators for LLM training-data pipelines ([EXT], SURVEY §0).

All operators are pure `pyspark.sql.functions` column expressions — no
Python UDFs — so they run inside whole-stage codegen and scale linearly
with executors (a 100 TB scan is embarrassingly parallel; the only shuffle
is an optional final aggregate). Operates on the `documents` fixture table
(`doc_id, text, lang, source, n_chars` — FIXTURES.md).

Operators:
* token_count         — whitespace tokens + BPE-ish word/number/punct pieces
* text_quality        — length / punctuation-ratio / stopword-ratio /
                        word-length features + a composite quality score
* language_id         — n-gram/stopword-profile heuristic over en/fr/de/es/it
* fingerprint         — 64-bit document fingerprint of normalized text
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# A BPE-ish tokenization: word pieces, numbers, or single non-space symbols.
# Mirrors the common pre-tokenizer regex (letters | digits | punct runs).
BPE_PIECE_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# tiny deterministic stopword profiles for language ID (public-knowledge
# function-word lists; enough signal for a heuristic classifier)
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "with", "for", "was"),
    "fr": ("le", "la", "les", "de", "et", "est", "une", "dans", "que", "pour"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "zu"),
    "es": ("el", "la", "los", "de", "y", "es", "una", "en", "que", "por"),
    "it": ("il", "la", "di", "e", "che", "una", "per", "non", "con", "sono"),
}


def _stopword_hits(text: Column, words: tuple[str, ...]) -> Column:
    """Count of profile-word occurrences (word-bounded, case-insensitive).

    regexp_count, not size(regexp_extract_all): identical count, but no
    per-row array of match strings is materialized — at scan scale the
    allocation, not the DFA, is the cost."""
    pattern = r"\b(" + "|".join(words) + r")\b"
    return F.regexp_count(F.lower(text), F.lit(pattern))


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish piece count + char length."""
    t = F.col(text_col)
    ws_tokens = F.size(F.split(F.trim(t), r"\s+"))
    return (
        df.withColumn("char_len", F.length(t))
        .withColumn(
            "ws_token_count",
            F.when(F.length(F.trim(t)) == 0, F.lit(0)).otherwise(ws_tokens),
        )
        .withColumn(
            "bpe_piece_count",
            # count-only (no match-array materialization; see _stopword_hits)
            F.regexp_count(t, F.lit(BPE_PIECE_REGEX)),
        )
    )


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features + composite score in [0, 1].

    Features (all codegen-able):
    * punct_ratio    — non-alnum-non-space chars / chars
    * stopword_ratio — English stopword hits / whitespace tokens
    * mean_word_len  — chars / tokens
    Score: penalizes very short docs, punctuation soup, and stopword-free
    (unnatural) text — the standard cheap pre-filter before model-based
    quality classifiers.
    """
    t = F.col(text_col)
    df = with_token_stats(df, text_col)
    punct = F.length(F.regexp_replace(t, r"[A-Za-z0-9\s]", ""))
    tokens = F.greatest(F.col("ws_token_count"), F.lit(1))
    chars = F.greatest(F.col("char_len"), F.lit(1))
    df = (
        df.withColumn("punct_ratio", punct / chars)
        .withColumn(
            "stopword_ratio",
            _stopword_hits(t, LANG_PROFILES["en"]) / tokens,
        )
        .withColumn("mean_word_len", F.col("char_len") / tokens)
    )
    len_score = F.least(F.col("char_len") / F.lit(200.0), F.lit(1.0))
    punct_score = F.greatest(F.lit(0.0), F.lit(1.0) - F.col("punct_ratio") * 4)
    stop_score = F.least(F.col("stopword_ratio") * 4, F.lit(1.0))
    # quality_score_raw is the exact IEEE double (same operation order as
    # the SQL oracle → bit-identical cross-engine); threshold filters must
    # compare against it, NOT the rounded display value — rounding first
    # creates engine-dependent ties exactly at the threshold boundary.
    return df.withColumn(
        "quality_score_raw", (len_score + punct_score + stop_score) / F.lit(3.0)
    ).withColumn("quality_score", F.round(F.col("quality_score_raw"), 6))


def with_language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Argmax-over-profiles language guess + per-language hit counts.

    Ties break by profile order (en > fr > de > es > it), 'und' when no
    profile word matches — deterministic, so oracle-checkable in SQL.
    """
    t = F.col(text_col)
    out = df
    for lang, words in LANG_PROFILES.items():
        out = out.withColumn(f"hits_{lang}", _stopword_hits(t, words))
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in LANG_PROFILES])
    guess = F.lit("und")
    # build reverse so earlier profiles win ties via later overwrite
    for lang in reversed(list(LANG_PROFILES)):
        guess = F.when(
            (F.col(f"hits_{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(guess)
    return out.withColumn("lang_guess", guess)


def with_repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-rule-style within-document repetition signals:

    * ``dup_line_frac``  — 1 − distinct/total over non-empty trimmed lines
    * ``dup_2gram_frac`` — 1 − distinct/total over word 2-grams

    Repetitive boilerplate (headers, templated spam, decoding loops)
    scores high; natural prose near 0. Pure array expressions — the
    expensive splits are bound once per row (Catalyst does not eliminate
    subexpressions re-derived inside transform lambdas).
    """
    from .dedup import _bind_once, _norm_col

    t = F.col(text_col)

    def _dup_frac(arr: Column) -> Column:
        return _bind_once(
            arr,
            lambda a: F.when(
                F.size(a) > 0,
                F.lit(1.0) - F.size(F.array_distinct(a)) / F.size(a),
            ).otherwise(F.lit(0.0)),
        )

    lines = F.filter(
        F.transform(F.split(t, "\n"), lambda l: F.trim(l)),
        lambda l: F.length(l) > 0,
    )
    grams = _bind_once(
        F.split(_norm_col(text_col), " "),
        lambda toks: F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(toks) - F.lit(1), F.lit(1))),
            lambda i: F.array_join(F.slice(toks, i, 2), " "),
        ),
    )
    return df.withColumn(
        "dup_line_frac", F.round(_dup_frac(lines), 6)
    ).withColumn("dup_2gram_frac", F.round(_dup_frac(grams), 6))


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit fingerprint of whitespace/case-normalized text.

    Normalization (lower, collapse whitespace) makes trivially-reformatted
    duplicates collide — the cheap exact-dedup key for 100 TB scans
    (shuffle only the 8-byte fingerprint + doc id, never the text).
    """
    t = F.col(text_col)
    normalized = F.regexp_replace(F.lower(F.trim(t)), r"\s+", " ")
    return df.withColumn("fingerprint", F.xxhash64(normalized))


def vocab_topk(
    df: DataFrame,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus vocabulary head: the k most frequent normalized tokens with
    total occurrences and document frequency.

    Plan shape at scale: token explode (map-side) → one shuffle on the
    token → per-token (count, count_distinct doc). The distinct-doc count
    uses the exact two-level form (token×doc pre-aggregate, then token)
    so no single reducer holds a giant distinct set. Ties break by token
    for determinism.
    """
    from .dedup import _norm_col

    toks = df.select(
        F.col(id_col).alias("_doc"),
        F.explode(F.split(_norm_col(text_col), " ")).alias("token"),
    ).filter(F.length("token") > 0)
    per_doc = toks.groupBy("token", "_doc").agg(
        F.count(F.lit(1)).alias("_n")
    )
    counts = per_doc.groupBy("token").agg(
        F.sum("_n").alias("n_occurrences"),
        F.count(F.lit(1)).alias("doc_freq"),
    )
    return counts.orderBy(
        F.col("n_occurrences").desc(), F.col("token")
    ).limit(k)


def document_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The full per-document feature set in one pass."""
    return with_fingerprint(
        with_language_id(with_quality_score(df, text_col), text_col), text_col
    )

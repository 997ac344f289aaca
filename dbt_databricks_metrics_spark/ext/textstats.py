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


# Gopher quality-rule thresholds (Rae et al. 2021, "Scaling Language
# Models: Methods, Analysis & Insights from Training Gopher", App. A —
# public). Word-count bounds are scaled to the fixture's short docs via
# the min_words parameter; every other threshold is the paper's.
GOPHER_REQUIRED_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_gate(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    required_words: tuple[str, ...] = GOPHER_REQUIRED_WORDS,
    min_required: int = 2,
) -> DataFrame:
    """Per-document Gopher rule flags + overall pass.

    Rules (each an independent boolean so pipelines can loosen one
    without re-deriving the rest):

    * ``words_ok``    — word count in [min_words, max_words]
    * ``mean_len_ok`` — mean word length in [3, 10]
    * ``symbol_ok``   — (# + ellipsis) to word ratio <= 0.1
    * ``bullet_ok``   — <= 90% of lines start with a bullet
    * ``ellipsis_ok`` — <= 30% of lines end with an ellipsis
    * ``alpha_ok``    — >= 80% of words contain an alphabetic character
    * ``stop_ok``     — >= min_required of ``required_words`` present
                        (Gopher's 8 English stop words by default; pass a
                        corpus-appropriate list for non-English or
                        synthetic vocabularies)
    * ``gopher_pass`` — all of the above

    Every ratio divides two per-row INTEGER counts, so both engines
    compute the identical double and every threshold comparison is
    deterministic (no float aggregates anywhere — the hashed-boolean
    rules of BASELINE.md are satisfied). Pure codegen, map-only.
    """
    from .dedup import _bind_once

    t = F.coalesce(F.col(text_col), F.lit(""))
    words = F.filter(F.split(F.trim(t), r"\s+"), lambda w: F.length(w) > 0)
    lines = F.filter(
        F.transform(F.split(t, "\n"), lambda l: F.trim(l)),
        lambda l: F.length(l) > 0,
    )

    def build(w: Column, ln: Column) -> Column:
        n_words = F.size(w)
        nw1 = F.greatest(n_words, F.lit(1)).cast("double")
        n_lines = F.size(ln)
        nl1 = F.greatest(n_lines, F.lit(1)).cast("double")
        n_alpha = F.size(F.filter(w, lambda x: x.rlike("[A-Za-z]")))
        chars_in_words = F.aggregate(
            F.transform(w, lambda x: F.length(x)), F.lit(0), lambda a, b: a + b
        )
        mean_len = chars_in_words.cast("double") / nw1
        hash_n = (F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))).cast("int")
        ell_n = (
            (F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))) / F.lit(3)
        ).cast("int")
        bullet_lines = F.size(
            F.filter(ln, lambda l: l.rlike(r"^[-*•]"))
        )
        ell_lines = F.size(F.filter(ln, lambda l: l.rlike(r"\.\.\.$")))
        stop_present = sum(
            (F.regexp_count(F.lower(t), F.lit(rf"\b{word}\b")) > 0).cast("int")
            for word in required_words
        )
        return F.struct(
            n_words.cast("long").alias("n_words"),
            mean_len.alias("mean_word_len"),
            ((n_words >= min_words) & (n_words <= max_words)).alias("words_ok"),
            ((mean_len >= 3.0) & (mean_len <= 10.0)).alias("mean_len_ok"),
            (((hash_n + ell_n).cast("double") / nw1) <= 0.1).alias("symbol_ok"),
            ((bullet_lines.cast("double") / nl1) <= 0.9).alias("bullet_ok"),
            ((ell_lines.cast("double") / nl1) <= 0.3).alias("ellipsis_ok"),
            ((n_alpha.cast("double") / nw1) >= 0.8).alias("alpha_ok"),
            (stop_present >= min_required).alias("stop_ok"),
        )

    s = _bind_once(words, lambda w: _bind_once(lines, lambda ln: build(w, ln)))
    out = df.withColumn("_g", s)
    flags = [
        "words_ok", "mean_len_ok", "symbol_ok", "bullet_ok",
        "ellipsis_ok", "alpha_ok", "stop_ok",
    ]
    for c in ("n_words", "mean_word_len", *flags):
        out = out.withColumn(c, F.col("_g")[c])
    gate = F.lit(True)
    for c in flags:
        gate = gate & F.col(c)
    return out.withColumn("gopher_pass", gate).drop("_g")


def oov_stats(
    df: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document out-of-vocabulary rate against a reference VOCAB
    table (any DataFrame with a ``token`` column — typically
    ``vocab_topk``'s head, or a tokenizer's real vocabulary) — the
    coverage eval run before committing to a tokenizer: high OOV = the
    vocabulary fragments this slice of the corpus.

    Returns (id, n_tokens, n_oov, oov_rate); counts are exact integers
    and the rate is their quotient (identical-int-operand double). Docs
    with no tokens (empty/NULL text) surface with counts 0 and NULL
    rate — nothing disappears.

    Scale shape: token explode (map-side) → broadcast LEFT join against
    the (small) vocab → one groupBy on the doc id. The corpus shuffles
    once, keyed by doc id; the vocab never shuffles.
    """
    from .dedup import _norm_col

    toks = df.select(
        F.col(id_col).alias("_doc"),
        F.explode(F.split(_norm_col(text_col), " ")).alias("token"),
    ).filter(F.length("token") > 0)
    v = vocab.select("token").distinct().withColumn("_in", F.lit(1))
    per_doc = (
        toks.join(F.broadcast(v), "token", "left")
        .groupBy("_doc")
        .agg(
            F.count(F.lit(1)).alias("_nt"),
            F.count_if(F.col("_in").isNull()).alias("_no"),
        )
    )
    ids = df.select(F.col(id_col).alias("_doc")).distinct()
    nt = F.coalesce(F.col("_nt"), F.lit(0))
    no = F.coalesce(F.col("_no"), F.lit(0))
    return ids.join(per_doc, "_doc", "left").select(
        F.col("_doc").alias(id_col),
        nt.alias("n_tokens"),
        no.alias("n_oov"),
        (no / F.nullif(nt, F.lit(0))).alias("oov_rate"),
    )


def collocation_pairs(
    df: DataFrame,
    vocab_k: int = 50,
    top_pairs: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Document-level co-occurrence collocations over the vocabulary
    head, in PMI-ready integer-rational form (Church & Hanks 1990,
    public): for the *top_pairs* most frequent unordered token pairs
    co-occurring in a document, emit the exact counts PMI derives from —
    ``PMI = log((n_ab·N) / (n_a·n_b))`` with every operand an emitted
    int64 (the log itself is presentation, not hashed — rule 6; libm
    logs are not cross-engine bit-stable).

    Scale shape: the corpus explodes ONCE and is immediately
    semi-joined against the broadcast k-row vocabulary head, so the
    pair self-join fans out at most C(vocab_k, 2) per document (k=50 →
    ≤1,225 pair rows/doc, independent of document length or corpus
    size); the pair shuffle key is the (token_a, token_b) pair. Counts
    are document frequencies (distinct presence per doc — the standard
    collocation event space), so every count is an exact integer.
    Ties rank deterministically (n_ab desc, token_a, token_b).
    """
    if vocab_k < 2:
        raise ValueError(f"vocab_k must be >= 2, got {vocab_k}")
    if top_pairs < 1:
        raise ValueError(f"top_pairs must be >= 1, got {top_pairs}")
    from .dedup import _norm_col

    vocab = vocab_topk(df, k=vocab_k, id_col=id_col, text_col=text_col)
    # checkpoint the presence table: it feeds the marginals AND both
    # sides of the pair self-join — a Catalyst tree would recompute the
    # explode + semi-join + distinct THREE times (guide §5)
    toks = (
        df.select(
            F.col(id_col).alias("_doc"),
            F.explode(F.split(_norm_col(text_col), " ")).alias("token"),
        )
        .filter(F.length("token") > 0)
        .join(F.broadcast(vocab.select("token")), "token", "left_semi")
        .select("_doc", "token")
        .distinct()  # presence per doc — the collocation event space
        .localCheckpoint(eager=False)
    )
    # N rides in the lazy plan (broadcast 1-row aggregate) instead of an
    # eager distinct().count() job — same integer, same output column
    n_row = (
        df.select(F.col(id_col)).distinct().agg(F.count(F.lit(1)).alias("_N"))
    )
    marg = toks.groupBy("token").agg(F.count(F.lit(1)).alias("_df"))
    a, b = toks.alias("a"), toks.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a._doc") == F.col("b._doc"))
            & (F.col("a.token") < F.col("b.token")),
        )
        .groupBy(
            F.col("a.token").alias("token_a"),
            F.col("b.token").alias("token_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    out = (
        pairs.join(
            F.broadcast(marg.select(F.col("token").alias("token_a"),
                                    F.col("_df").alias("n_a"))), "token_a"
        )
        .join(
            F.broadcast(marg.select(F.col("token").alias("token_b"),
                                    F.col("_df").alias("n_b"))), "token_b"
        )
        .crossJoin(F.broadcast(n_row))
        .withColumn("n_docs", F.col("_N").cast("bigint"))
        .select("token_a", "token_b", "n_ab", "n_a", "n_b", "n_docs")
    )
    return out.orderBy(
        F.col("n_ab").desc(), "token_a", "token_b"
    ).limit(top_pairs)

"""Text-analysis operators vs DuckDB oracle ([EXT])."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_databricks_metrics_spark.ext import textstats
from dbt_databricks_metrics_spark.sources import load_table

from .conftest import assert_df_matches_oracle


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").cache()


def test_token_stats_vs_oracle(docs, duck):
    df = textstats.with_token_stats(docs).select(
        "doc_id", "char_len", "ws_token_count", "bpe_piece_count"
    )
    assert_df_matches_oracle(
        df,
        duck,
        r"""
        SELECT doc_id,
               CAST(length(text) AS INT) AS char_len,
               CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS INT)
                   AS ws_token_count,
               CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
                   AS INT) AS bpe_piece_count
        FROM documents
        """,
    )


def test_quality_score_range_and_monotonicity(docs):
    df = textstats.with_quality_score(docs)
    rows = df.select("doc_id", "quality_score", "punct_ratio", "stopword_ratio").collect()
    assert all(0.0 <= r["quality_score"] <= 1.0 for r in rows)
    assert all(0.0 <= r["punct_ratio"] <= 1.0 for r in rows)


def test_language_id_vs_oracle(docs, duck):
    df = textstats.with_language_id(docs).select("doc_id", "lang_guess")
    hits = {
        lang: r"len(regexp_extract_all(lower(text), '\b("
        + "|".join(words)
        + r")\b'))"
        for lang, words in textstats.LANG_PROFILES.items()
    }
    greatest = "greatest(" + ", ".join(hits.values()) + ")"
    cases = " ".join(
        f"WHEN {hits[lang]} = _best THEN '{lang}'" for lang in textstats.LANG_PROFILES
    )
    assert_df_matches_oracle(
        df,
        duck,
        f"""
        SELECT doc_id,
               CASE WHEN _best = 0 THEN 'und' {cases} ELSE 'und' END AS lang_guess
        FROM (SELECT doc_id, text, {greatest} AS _best FROM documents)
        """,
    )


def test_fingerprint_collides_only_on_normalized_equality(spark, docs):
    df = textstats.with_fingerprint(docs)
    n = df.select("fingerprint").distinct().count()
    assert n == docs.count()  # all distinct texts → all distinct fingerprints
    mangled = docs.select(
        F.upper(F.concat(F.lit("  "), F.col("text"))).alias("text")
    )
    fp1 = sorted(
        r["fingerprint"] for r in textstats.with_fingerprint(docs).select("fingerprint").collect()
    )
    fp2 = sorted(
        r["fingerprint"]
        for r in textstats.with_fingerprint(mangled).select("fingerprint").collect()
    )
    assert fp1 == fp2  # normalization-invariant


def test_document_stats_one_pass(docs):
    df = textstats.document_stats(docs)
    cols = set(df.columns)
    assert {
        "char_len",
        "ws_token_count",
        "bpe_piece_count",
        "quality_score",
        "lang_guess",
        "fingerprint",
    } <= cols
    assert df.count() == docs.count()


def test_repetition_stats(spark):
    from dbt_databricks_metrics_spark.ext.textstats import with_repetition_stats

    docs = spark.createDataFrame(
        [
            (1, "buy now\nbuy now\nbuy now\nbuy now"),
            (2, "a perfectly normal sentence with no repeats at all"),
            (3, "spam spam spam spam spam spam"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.dup_line_frac, r.dup_2gram_frac)
        for r in with_repetition_stats(docs).collect()
    }
    assert got[1][0] == 0.75  # 4 identical lines -> 1 - 1/4
    assert got[2] == (0.0, 0.0)
    assert got[3][1] == 0.8  # 5 identical 'spam spam' 2-grams -> 1 - 1/5
    assert got[4] == (0.0, 0.0)


def test_repetition_stats_vs_oracle(docs, duck):
    from dbt_databricks_metrics_spark.ext.textstats import with_repetition_stats

    out = with_repetition_stats(docs).select("doc_id", "dup_line_frac", "dup_2gram_frac")
    assert_df_matches_oracle(
        out,
        duck,
        r"""
        WITH base AS (
            SELECT doc_id,
                   list_filter(list_transform(string_split(text, chr(10)),
                               l -> trim(l)), l -> length(l) > 0) AS lines,
                   string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')
                       AS toks
            FROM documents
        ),
        g AS (
            SELECT doc_id, lines,
                   list_transform(
                       generate_series(1, greatest(len(toks) - 1, 1)),
                       i -> array_to_string(toks[i:i + 1], ' ')) AS grams
            FROM base
        )
        SELECT doc_id,
               round(CASE WHEN len(lines) > 0
                    THEN 1.0 - len(list_distinct(lines)) * 1.0 / len(lines)
                    ELSE 0.0 END, 6) AS dup_line_frac,
               round(CASE WHEN len(grams) > 0
                    THEN 1.0 - len(list_distinct(grams)) * 1.0 / len(grams)
                    ELSE 0.0 END, 6) AS dup_2gram_frac
        FROM g
        """,
    )


def test_vocab_topk_vs_oracle(docs, duck):
    from dbt_databricks_metrics_spark.ext.textstats import vocab_topk

    out = vocab_topk(docs, k=15)
    assert_df_matches_oracle(
        out,
        duck,
        r"""
        WITH toks AS (
            SELECT doc_id,
                   unnest(string_split(
                       regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' '))
                       AS token
            FROM documents
        )
        SELECT token, count(*) AS n_occurrences,
               count(DISTINCT doc_id) AS doc_freq
        FROM toks WHERE length(token) > 0
        GROUP BY token
        ORDER BY n_occurrences DESC, token
        LIMIT 15
        """,
    )


def test_vocab_topk_two_level_distinct(docs):
    """The doc-frequency computation must be the two-level exact form —
    no Expand/distinct aggregate over the raw explode."""
    from dbt_databricks_metrics_spark.ext.textstats import vocab_topk

    plan = vocab_topk(docs, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan, plan[:2000]


class TestGopherGate:
    def test_rule_flags(self, spark):
        from dbt_databricks_metrics_spark.ext.textstats import gopher_gate

        good = ("the quick brown fox jumps over a lazy dog and then it "
                "sat down to rest with all of that energy have spent") * 1
        rows = [
            (1, good),                                   # passes all
            (2, "short text"),                           # words_ok fails
            (3, "### " * 30),                            # symbol + alpha fail
            (4, "- a\n- b\n- c\n- d"),                   # bullets fail
            (5, "w " * 60),                              # mean_len fails (1.0)
        ]
        df = spark.createDataFrame(rows, "doc_id INT, text STRING")
        got = {r["doc_id"]: r for r in gopher_gate(df, min_words=20).collect()}
        assert got[1]["gopher_pass"] is True
        assert got[2]["words_ok"] is False and got[2]["gopher_pass"] is False
        assert got[3]["symbol_ok"] is False and got[3]["alpha_ok"] is False
        assert got[4]["bullet_ok"] is False
        assert got[5]["mean_len_ok"] is False

    def test_stop_word_requirement(self, spark):
        from dbt_databricks_metrics_spark.ext.textstats import gopher_gate

        df = spark.createDataFrame(
            [(1, "lorem ipsum dolor sit amet " * 10),
             (2, "the cat and dog " * 10)],
            "doc_id INT, text STRING",
        )
        got = {r["doc_id"]: r["stop_ok"] for r in gopher_gate(df, min_words=5).collect()}
        assert got[1] is False and got[2] is True

    def test_empty_and_null(self, spark):
        from dbt_databricks_metrics_spark.ext.textstats import gopher_gate

        df = spark.createDataFrame([(1, ""), (2, None)], "doc_id INT, text STRING")
        for r in gopher_gate(df).collect():
            assert r["n_words"] == 0 and r["gopher_pass"] is False


def test_oov_stats_counts_and_rate(spark):
    from dbt_databricks_metrics_spark.ext.textstats import oov_stats

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "quantum flux capacitor"),
            (3, ""),
            (4, None),
        ],
        "doc_id long, text string",
    )
    vocab = spark.createDataFrame(
        [("the",), ("cat",), ("on",), ("mat",)], "token string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_oov"], r["oov_rate"])
        for r in oov_stats(docs, vocab).collect()
    }
    assert got[1] == (6, 1, 1 / 6)  # only 'sat' is OOV
    assert got[2] == (3, 3, 1.0)
    assert got[3] == (0, 0, None)  # empty and NULL docs surface
    assert got[4] == (0, 0, None)


def test_oov_stats_composes_with_vocab_topk(spark, sf_dir):
    from dbt_databricks_metrics_spark.ext.textstats import oov_stats, vocab_topk
    from dbt_databricks_metrics_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    vocab = vocab_topk(docs, k=50)
    out = oov_stats(docs, vocab)
    assert out.count() == docs.count()
    row = out.filter(F.col("n_tokens") > 0).first()
    assert 0.0 <= row["oov_rate"] <= 1.0


def test_collocation_pairs_hand_computed(spark):
    from dbt_databricks_metrics_spark.ext.textstats import collocation_pairs

    df = spark.createDataFrame(
        [
            (1, "spark filter window"),
            (2, "spark filter"),
            (3, "spark window"),
            (4, "filter"),
            (5, None),
        ],
        "doc_id BIGINT, text STRING",
    )
    rows = {
        (r["token_a"], r["token_b"]): r
        for r in collocation_pairs(df, vocab_k=3, top_pairs=10).collect()
    }
    # presence: spark{1,2,3} filter{1,2,4} window{1,3}
    r = rows[("filter", "spark")]
    assert (r["n_ab"], r["n_a"], r["n_b"]) == (2, 3, 3)
    # n_docs counts ALL documents (the PMI event space), incl. null-text
    assert r["n_docs"] == 5
    r2 = rows[("spark", "window")]
    assert (r2["n_ab"], r2["n_a"], r2["n_b"]) == (2, 3, 2)
    assert rows[("filter", "window")]["n_ab"] == 1


def test_collocation_pairs_validates(spark):
    from dbt_databricks_metrics_spark.ext.textstats import collocation_pairs

    df = spark.createDataFrame([(1, "a b")], "doc_id BIGINT, text STRING")
    with pytest.raises(ValueError, match="vocab_k"):
        collocation_pairs(df, vocab_k=1)
    with pytest.raises(ValueError, match="top_pairs"):
        collocation_pairs(df, top_pairs=0)

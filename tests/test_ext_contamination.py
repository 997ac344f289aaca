"""Contamination detection ([EXT]): corpus docs sharing word n-grams
with a benchmark set, cross-checked against a DuckDB oracle and a
constructed ground truth."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_databricks_metrics_spark.ext import contamination
from dbt_databricks_metrics_spark.sources import load_table

from .conftest import assert_df_matches_oracle

_NGRAMS = (
    "list_distinct(list_transform("
    "generate_series(1, greatest(len(toks) - {n} + 1, 1)), "
    "i -> array_to_string(toks[i:i + {n} - 1], ' ')))"
)


def _oracle_sql(n: int, bench_pred: str, corpus_pred: str) -> str:
    return f"""
        WITH tokd AS (
            SELECT doc_id,
                   string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')
                       AS toks
            FROM documents
        ),
        grams AS (
            SELECT doc_id, unnest({_NGRAMS.format(n=n)}) AS ngram FROM tokd
        ),
        c AS (SELECT * FROM grams WHERE {corpus_pred}),
        b AS (SELECT doc_id AS bench_id, ngram FROM grams WHERE {bench_pred})
        SELECT c.doc_id, b.bench_id, count(*) AS n_shared
        FROM c JOIN b USING (ngram)
        GROUP BY 1, 2
    """


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").cache()


def test_constructed_leak_detected(spark):
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (2, "one two three four five six seven eight nine ten"),
            (3, "totally unrelated words that overlap with nothing here at all"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [
            (100, "gamma delta epsilon zeta eta theta"),  # inside doc 1
            (101, "no common phrasing whatsoever in this sentence"),
        ],
        "doc_id long, text string",
    )
    pairs = contamination.ngram_contamination(corpus, bench, n=5)
    got = {(r.doc_id, r.bench_id): r.n_shared for r in pairs.collect()}
    # doc 1 contains the benchmark's full 6-token span -> its two distinct
    # 5-grams both appear in doc 1
    assert got == {(1, 100): 2}
    dropl = contamination.contaminated_docs(corpus, bench, n=5)
    assert [(r.doc_id, r.n_bench_docs, r.max_shared) for r in dropl.collect()] == [
        (1, 1, 2)
    ]


def test_hash_ngrams_same_pairs(spark):
    corpus = spark.createDataFrame(
        [(1, "a b c d e f g h i j"), (2, "k l m n o p q r s t")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(9, "c d e f g h")], "doc_id long, text string"
    )
    plain = contamination.ngram_contamination(corpus, bench, n=5)
    hashed = contamination.ngram_contamination(corpus, bench, n=5, hash_ngrams=True)
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, hashed.collect()))


def test_fixture_split_vs_oracle(docs, duck):
    """Self-split of the fixture corpus: benchmark = every 20th doc,
    corpus = the rest; results must match the DuckDB oracle exactly."""
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    corpus = docs.filter(F.col("doc_id") % 20 != 0)
    pairs = contamination.ngram_contamination(corpus, bench, n=5)
    assert_df_matches_oracle(
        pairs,
        duck,
        _oracle_sql(5, "doc_id % 20 = 0", "doc_id % 20 <> 0"),
    )


def test_contamination_is_equi_join(docs, spark):
    """The O(corpus × bench) comparison must never materialize: the plan
    joins on the n-gram key (hash/merge join), not a nested-loop or
    cartesian product."""
    from pyspark.sql import functions as F

    bench = docs.filter(F.col("doc_id") % 20 == 0)
    corpus = docs.filter(F.col("doc_id") % 20 != 0)
    df = contamination.ngram_contamination(corpus, bench, n=5, hash_ngrams=True)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan, plan[:2000]
    assert any(j in plan for j in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin")), plan[:2000]


def test_gram_novelty_basic(spark):
    from dbt_databricks_metrics_spark.ext.contamination import gram_novelty

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta epsilon"),  # exact copy: all dup
            (3, "one two three four five"),         # unique: no dup
            (4, None),                              # null text survives
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in gram_novelty(df, n=3).collect()}
    assert rows[1]["dup_frac"] == 1.0 and rows[2]["dup_frac"] == 1.0
    assert rows[3]["dup_frac"] == 0.0
    assert rows[4]["n_grams"] == 0 and rows[4]["dup_frac"] is None


def test_gram_novelty_partial_overlap(spark):
    from dbt_databricks_metrics_spark.ext.contamination import gram_novelty

    df = spark.createDataFrame(
        [
            (1, "shared phrase here tail one xx"),
            (2, "shared phrase here tail two yy"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in gram_novelty(df, n=3).collect()}
    # 4 grams each; 'shared phrase here' + 'phrase here tail' shared
    assert rows[1]["n_grams"] == 4 and rows[1]["n_dup_grams"] == 2
    assert rows[1]["dup_frac"] == 0.5 == rows[2]["dup_frac"]


def test_gram_novelty_hashed_keys_equal(spark, sf_dir):
    from dbt_databricks_metrics_spark.ext.contamination import gram_novelty
    from dbt_databricks_metrics_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    raw = {tuple(r) for r in gram_novelty(docs, n=5).collect()}
    hashed = {tuple(r) for r in gram_novelty(docs, n=5, hash_ngrams=True).collect()}
    assert raw == hashed


def test_split_leakage_detects_straddling_dup(spark):
    from dbt_databricks_metrics_spark.ext.contamination import split_leakage

    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, text, "train"),
        (2, text, "test"),  # exact dup of a train doc -> leaks
        (3, "one two three four five six seven eight nine ten", "test"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, split string")
    got = split_leakage(df, n=8).collect()
    assert len(got) == 1
    (r,) = got
    # 10 tokens -> 3 distinct 8-grams, all shared with doc 1
    assert (r["doc_id"], r["n_train_docs"], r["max_shared"], r["total_shared"]) == (
        2, 1, 3, 3,
    )


def test_split_leakage_clean_split_is_empty(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta", "train"),
        (2, "one two three four five six seven eight", "test"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, split string")
    assert split_leakage_count(spark, df) == 0


def split_leakage_count(spark, df):
    from dbt_databricks_metrics_spark.ext.contamination import split_leakage

    return split_leakage(df, n=8).count()

"""Keyword search (IDF scoring) vs DuckDB oracle ([EXT])."""

from __future__ import annotations

import pytest

from dbt_databricks_metrics_spark.ext import search
from dbt_databricks_metrics_spark.sources import load_table

from .conftest import assert_df_matches_oracle

QUERY = "spark filter window"

ORACLE = r"""
WITH toks AS (
    SELECT doc_id,
           list_distinct(regexp_split_to_array(
               regexp_replace(lower(trim(text)), '[^a-z0-9\s]', ' ', 'g'), '\s+'))
               AS t
    FROM documents
),
consts AS (
    SELECT (SELECT count(*) FROM documents) AS n,
           (SELECT count(*) FROM toks WHERE list_contains(t, 'spark')) AS df1,
           (SELECT count(*) FROM toks WHERE list_contains(t, 'filter')) AS df2,
           (SELECT count(*) FROM toks WHERE list_contains(t, 'window')) AS df3
)
SELECT doc_id,
       round(CAST(list_contains(t, 'spark') AS INT) * round(ln(1 + (n - df1 + 0.5)/(df1 + 0.5)), 9)
           + CAST(list_contains(t, 'filter') AS INT) * round(ln(1 + (n - df2 + 0.5)/(df2 + 0.5)), 9)
           + CAST(list_contains(t, 'window') AS INT) * round(ln(1 + (n - df3 + 0.5)/(df3 + 0.5)), 9), 6)
           AS score,
       CAST(list_contains(t, 'spark') AS INT) + CAST(list_contains(t, 'filter') AS INT)
           + CAST(list_contains(t, 'window') AS INT) AS n_matched
FROM toks, consts
WHERE list_contains(t, 'spark') OR list_contains(t, 'filter') OR list_contains(t, 'window')
ORDER BY score DESC, doc_id
LIMIT 10
"""


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").cache()


def test_keyword_search_vs_oracle(docs, duck):
    df = search.keyword_search(docs, QUERY, k=10)
    assert_df_matches_oracle(df, duck, ORACLE)


def test_rarer_terms_score_higher(docs):
    n = docs.count()
    dfs = search.term_document_frequencies(docs, ["spark", "the"])
    # idf must be monotone decreasing in document frequency
    if dfs["spark"] < dfs["the"]:
        assert search.idf(n, dfs["spark"]) > search.idf(n, dfs["the"])


def test_no_match_excluded(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], "doc_id long, text string"
    )
    out = search.keyword_search(df, "alpha", k=10).collect()
    assert [r["doc_id"] for r in out] == [1]


def test_empty_query_rejected(docs):
    with pytest.raises(ValueError, match="empty query"):
        search.keyword_search(docs, "   ")

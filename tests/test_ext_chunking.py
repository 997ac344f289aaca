"""Document chunking ([EXT]): coverage/overlap laws + DuckDB oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_databricks_metrics_spark.ext import chunking
from dbt_databricks_metrics_spark.sources import load_table

from .conftest import assert_df_matches_oracle


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").cache()


def test_reconstruction_and_overlap(spark):
    text = "abcdefghijklmnopqrstuvwxyz0123456789"  # 36 chars
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        chunking.chunk_documents(docs, chunk_chars=10, overlap_chars=2).collect(),
        key=lambda r: r.chunk_idx,
    )
    # step 8: starts 0,8,16,24,32 → 5 chunks
    assert [r.chunk_start for r in rows] == [0, 8, 16, 24, 32]
    assert rows[0].chunk_text == text[0:10]
    assert rows[-1].chunk_text == text[32:]
    # overlap: each chunk's head repeats the previous chunk's tail
    for prev, cur in zip(rows, rows[1:]):
        assert prev.chunk_text[-2:] == cur.chunk_text[:2]
    # dropping the overlap head of every later chunk reconstructs the doc
    rebuilt = rows[0].chunk_text + "".join(r.chunk_text[2:] for r in rows[1:])
    assert rebuilt == text


def test_empty_and_short_docs(spark):
    docs = spark.createDataFrame(
        [(1, ""), (2, "tiny")], "doc_id long, text string"
    )
    rows = chunking.chunk_documents(docs, chunk_chars=100, overlap_chars=10).collect()
    got = {(r.doc_id): (r.chunk_idx, r.chunk_start, r.chunk_text) for r in rows}
    assert len(rows) == 2  # one chunk each, empty doc preserved
    assert got[1] == (0, 0, "")
    assert got[2] == (0, 0, "tiny")


def test_bad_params(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunking.chunk_documents(docs, chunk_chars=0)
    with pytest.raises(ValueError):
        chunking.chunk_documents(docs, chunk_chars=10, overlap_chars=10)


def test_vs_duck_oracle(docs, duck):
    out = chunking.chunk_documents(docs, chunk_chars=500, overlap_chars=50)
    assert_df_matches_oracle(
        out,
        duck,
        """
        SELECT doc_id,
               CAST(i AS INT) AS chunk_idx,
               CAST(i * 450 AS INT) AS chunk_start,
               substring(text, i * 450 + 1, 500) AS chunk_text
        FROM documents,
             LATERAL (SELECT unnest(generate_series(0,
                 CAST(greatest(ceil(greatest(length(text) - 50, 1) / 450.0), 1)
                     AS BIGINT) - 1)) AS i)
        """,
    )


def test_map_only_plan(docs):
    plan = (
        chunking.chunk_documents(docs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan[:1500]


def test_null_text_yields_single_empty_chunk(spark):
    # NULL text must not make the document vanish (explode drops NULL
    # arrays) — it chunks like the empty string
    df = spark.createDataFrame([(1, None), (2, "abcdef")], "doc_id long, text string")
    out = chunking.chunk_documents(df, chunk_chars=4, overlap_chars=0)
    rows = {(r["doc_id"], r["chunk_idx"]): r["chunk_text"] for r in out.collect()}
    assert rows[(1, 0)] == ""
    assert rows[(2, 0)] == "abcd" and rows[(2, 1)] == "ef"
    assert len(rows) == 3

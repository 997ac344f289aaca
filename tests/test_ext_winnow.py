"""Winnowing fingerprint tests ([EXT]): the paper guarantee (shared
substring of length >= w+k-1 => shared fingerprint), degenerate inputs,
cross-engine md5 parity against DuckDB, and plan shape.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_databricks_metrics_spark.ext import winnow
from dbt_databricks_metrics_spark.sources import load_table

K, W = 8, 4
GUARANTEE = W + K - 1  # any shared substring this long must be detected


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").cache()


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_identical_docs_share_all_fingerprints(spark):
    t = "the quick brown fox jumps over the lazy dog again and again"
    df = _df(spark, [(1, t), (2, t)])
    pairs = winnow.winnow_overlap_pairs(df, k=K, w=W, min_shared=1).collect()
    assert len(pairs) == 1
    fps = winnow.winnow_fingerprints(df, k=K, w=W)
    per_doc = {r["doc_id"]: r["n"] for r in fps.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    assert pairs[0]["n_shared"] == per_doc[1] == per_doc[2]


def test_shared_passage_guarantee(spark):
    # two otherwise-different docs share one >= GUARANTEE-char passage
    passage = "copied boilerplate passage here"
    assert len(passage) >= GUARANTEE
    df = _df(
        spark,
        [
            (1, "alpha beta gamma delta " + passage + " epsilon zeta"),
            (2, "one two three four five " + passage + " six seven eight"),
            (3, "completely unrelated text with nothing in common at all xyz"),
        ],
    )
    pairs = {(r["id_a"], r["id_b"]) for r in winnow.winnow_overlap_pairs(df, k=K, w=W, min_shared=1).collect()}
    assert (1, 2) in pairs
    assert not any(3 in p for p in pairs)


def test_normalization_invariance(spark):
    df = _df(
        spark,
        [
            (1, "Some Shared Sentence Of Decent Length in this doc"),
            (2, "  some   shared sentence of decent length IN THIS DOC  "),
        ],
    )
    pairs = winnow.winnow_overlap_pairs(df, k=K, w=W, min_shared=1).collect()
    assert len(pairs) == 1


def test_degenerate_inputs_survive(spark):
    df = _df(spark, [(1, None), (2, ""), (3, "tiny"), (4, "just over k!")])
    fps = winnow.winnow_fingerprints(df, k=K, w=W)
    counts = {r["doc_id"]: r["n"] for r in fps.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    assert 1 not in counts and 2 not in counts  # null/empty emit nothing
    assert counts[3] == 1  # shorter than k: whole-text hash
    assert counts[4] >= 1  # fewer than w grams: global min


def test_max_df_drops_boilerplate(spark):
    t = "all rights reserved standard footer text appears everywhere"
    df = _df(spark, [(i, t) for i in range(1, 12)])
    # 11 docs share everything; max_df=10 drops every fingerprint
    assert winnow.winnow_overlap_pairs(df, k=K, w=W, max_df=10).count() == 0
    assert winnow.winnow_overlap_pairs(df, k=K, w=W, max_df=11).count() == 55


def test_md5_parity_with_duckdb(spark, duck, sf_dir):
    """The md5 hash mode must reproduce bit-for-bit in DuckDB — this is
    what makes the contract query's oracle exact, not approximate."""
    sdf = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    got = {
        (r["doc_id"], r["fingerprint"])
        for r in winnow.winnow_fingerprints(sdf, k=K, w=W, hash_fn="md5").collect()
    }
    want = set(
        duck.execute(
            f"""
            WITH n AS (
              SELECT doc_id,
                     regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
              FROM documents WHERE doc_id < 40 AND text IS NOT NULL
            ),
            h AS (
              SELECT doc_id,
                     [substr(md5(substr(t, i, {K})), 1, 16)
                      for i in range(1, length(t) - {K} + 2)] AS hs
              FROM n WHERE length(t) >= {K}
            )
            SELECT doc_id, unnest(list_distinct(
                     [list_min(hs[j:j+{W - 1}]) for j in range(1, len(hs) - {W} + 2)]
                   )) AS fingerprint
            FROM h WHERE len(hs) >= {W}
            """
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_fingerprint_density(docs):
    """~2/(w+1) of positions selected (paper's expected density)."""
    n_fp = winnow.winnow_fingerprints(docs, k=K, w=W).count()
    n_pos = docs.select(
        F.sum(F.greatest(F.length(F.col("text")) - F.lit(K - 1), F.lit(0)))
    ).collect()[0][0]
    density = n_fp / n_pos
    assert 0.15 < density < 0.55  # 2/(w+1) = 0.4, minus distinct-collapse


def test_plan_no_python_udf(docs):
    plan = winnow.winnow_overlap_pairs(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

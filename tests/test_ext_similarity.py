"""Similarity-search operators vs DuckDB oracle / exact brute force ([EXT])."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_databricks_metrics_spark.ext import similarity
from dbt_databricks_metrics_spark.sources import load_table

from .conftest import assert_df_matches_oracle

DIM = 64


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").cache()


@pytest.fixture(scope="module")
def query_vec(emb):
    return emb.filter(F.col("vec_id") == 0).first()["embedding"]


def test_topk_vs_oracle(emb, duck, query_vec):
    df = similarity.topk_similar(emb, query_vec, k=10)
    assert_df_matches_oracle(
        df,
        duck,
        """
        SELECT b.vec_id,
               round(list_cosine_similarity(CAST(b.embedding AS DOUBLE[]),
                     (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)), 6)
                   AS cosine
        FROM embeddings b
        ORDER BY cosine DESC, b.vec_id
        LIMIT 10
        """,
    )


def test_topk_join_vs_oracle(emb, duck):
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    df = similarity.topk_join(queries, emb, k=3)
    assert_df_matches_oracle(
        df,
        duck,
        """
        SELECT q.vec_id AS query_id, c.vec_id,
               round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 6) AS cosine
        FROM embeddings q, embeddings c
        WHERE q.vec_id < 5
        QUALIFY row_number() OVER (
            PARTITION BY q.vec_id
            ORDER BY round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 6) DESC,
                     c.vec_id
        ) <= 3
        """,
    )


def test_topk_includes_self(emb, query_vec):
    top = similarity.topk_similar(emb, query_vec, k=1).first()
    assert top["vec_id"] == 0 and top["cosine"] == pytest.approx(1.0)


def test_srp_pairs_subset_of_brute(emb):
    from dbt_databricks_metrics_spark.ext.dedup import embedding_dup_pairs

    sub = emb.filter(F.col("vec_id") < 150)
    brute = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_dup_pairs(sub, threshold=0.5).collect()
    }
    srp = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in similarity.srp_similar_pairs(
            sub, DIM, threshold=0.5, n_planes=16, bands=4
        ).collect()
    }
    assert set(srp) <= set(brute)  # verification → no false positives
    if brute:
        # recall sanity: high-cosine pairs should mostly collide in a band
        high = {k for k, v in brute.items() if v >= 0.8}
        if high:
            assert len(set(srp) & high) >= 0.5 * len(high)


def test_ivf_topk_reasonable_recall(emb, query_vec):
    exact = [r["vec_id"] for r in similarity.topk_similar(emb, query_vec, k=10).collect()]
    approx = [
        r["vec_id"]
        for r in similarity.ivf_topk(
            emb, query_vec, k=10, n_cells=8, n_probe=4
        ).collect()
    ]
    assert len(approx) == 10
    # probing half the cells should recover a majority of true neighbors
    assert len(set(exact) & set(approx)) >= 5, (exact, approx)


def test_ivf_assign_total(emb):
    cents = similarity.ivf_centroids(emb, n_cells=8)
    assert cents.count() == 8
    assign = similarity.ivf_assign(emb, cents)
    assert assign.count() == emb.count()
    assert assign.select("vec_id").distinct().count() == emb.count()


def test_no_unpartitioned_window_in_ext_plans(emb):
    """Scale gate: no ext similarity plan may funnel the corpus through a
    single task — centroid selection must be TakeOrderedAndProject (per-
    partition heaps), never an unpartitioned Window (which plans as an
    Exchange SinglePartition + global sort)."""
    def plan_of(df):
        return df._jdf.queryExecution().executedPlan().toString()

    cent_plan = plan_of(similarity.ivf_centroids(emb, n_cells=8))
    assert "TakeOrderedAndProject" in cent_plan, cent_plan[:1500]
    for df in (
        similarity.ivf_centroids(emb, n_cells=8),
        similarity.topk_similar(emb, [0.0] * DIM, k=5),
        similarity.srp_similar_pairs(emb, DIM, threshold=0.9),
    ):
        p = plan_of(df)
        assert "Exchange SinglePartition" not in p, p[:1500]


def test_truncation_agreement_vs_oracle(emb, duck):
    df = similarity.truncation_agreement(emb, trunc_dim=32, k=10, n_queries=4)
    assert_df_matches_oracle(
        df,
        duck,
        """
        WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        q AS (SELECT vec_id AS qid, e AS qv FROM v ORDER BY vec_id LIMIT 4),
        scored AS (
            SELECT qid, v.vec_id AS cid,
                   round(list_cosine_similarity(qv, v.e), 6) AS f,
                   round(list_cosine_similarity(qv[1:32], v.e[1:32]), 6) AS t
            FROM q, v WHERE v.vec_id <> qid
        ),
        ranked AS (
            SELECT qid, cid,
                   row_number() OVER (PARTITION BY qid ORDER BY f DESC, cid) AS rf,
                   row_number() OVER (PARTITION BY qid ORDER BY t DESC, cid) AS rt
            FROM scored
        )
        SELECT qid AS query_id, 32 AS trunc_dim, 10 AS k,
               CAST(sum(CASE WHEN rf <= 10 AND rt <= 10 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_overlap,
               CAST(sum(CASE WHEN rf <= 10 AND rt <= 10 THEN 1 ELSE 0 END) AS BIGINT)
                   / 10.0 AS recall_at_k
        FROM ranked GROUP BY qid
        """,
    )


def test_truncation_agreement_full_dim_is_identity(emb):
    # truncating to the FULL dimension must agree with itself perfectly
    rows = similarity.truncation_agreement(
        emb, trunc_dim=DIM, k=5, n_queries=3
    ).collect()
    assert len(rows) == 3
    assert all(r["n_overlap"] == 5 and r["recall_at_k"] == 1.0 for r in rows)


def test_truncation_agreement_salt_invariance(emb):
    # the two-stage (salted) top-k must be exact: any salt count gives
    # the same answer
    a = sorted(
        (r["query_id"], r["n_overlap"])
        for r in similarity.truncation_agreement(
            emb, trunc_dim=16, k=8, n_queries=3, n_salts=2
        ).collect()
    )
    b = sorted(
        (r["query_id"], r["n_overlap"])
        for r in similarity.truncation_agreement(
            emb, trunc_dim=16, k=8, n_queries=3, n_salts=57
        ).collect()
    )
    assert a == b


def test_truncation_agreement_bad_args(emb):
    with pytest.raises(ValueError, match="trunc_dim"):
        similarity.truncation_agreement(emb, trunc_dim=0)


def test_hamming_topk_vs_oracle(emb, duck, query_vec):
    df = similarity.hamming_topk(emb, query_vec, k=10)
    assert_df_matches_oracle(
        df,
        duck,
        """
        WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        bits AS (
            SELECT vec_id, i // 32 AS w,
                   CAST(sum(CASE WHEN e[i + 1] >= 0
                            THEN CAST(power(2, i % 32) AS BIGINT) ELSE 0 END)
                        AS BIGINT) AS word
            FROM v, range(64) r(i) GROUP BY 1, 2
        ),
        codes AS (SELECT vec_id, list(word ORDER BY w) AS code FROM bits GROUP BY 1),
        qc AS (SELECT code AS qcode FROM codes WHERE vec_id = 0),
        h AS (
            SELECT c.vec_id,
                   CAST(bit_count(xor(c.code[1], qcode[1]))
                      + bit_count(xor(c.code[2], qcode[2])) AS BIGINT) AS hamming
            FROM codes c, qc
        )
        SELECT vec_id, hamming FROM h ORDER BY hamming, vec_id LIMIT 10
        """,
    )


def test_hamming_topk_self_is_zero(emb, query_vec):
    rows = similarity.hamming_topk(emb, query_vec, k=1).collect()
    assert rows[0]["vec_id"] == 0 and rows[0]["hamming"] == 0


def test_hamming_topk_dim_mismatch_raises(emb):
    with pytest.raises(ValueError, match="query dim"):
        similarity.hamming_topk(emb, [1.0] * 32, k=5)

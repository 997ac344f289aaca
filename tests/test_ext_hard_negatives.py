from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_databricks_metrics_spark.ext import similarity
from dbt_databricks_metrics_spark.sources import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding", "label"
    )


def test_negatives_never_share_label(emb, queries):
    got = similarity.hard_negatives(queries, emb, k=3)
    qlab = {r["query_id"]: r["label"] for r in queries.collect()}
    rows = got.collect()
    assert rows
    for r in rows:
        assert r["label"] != qlab[r["query_id"]]


def test_k_per_query_and_rank_dense(emb, queries):
    got = similarity.hard_negatives(queries, emb, k=3).collect()
    per_q: dict[int, list[int]] = {}
    for r in got:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    assert set(per_q) == {0, 1, 2, 3, 4}
    for ranks in per_q.values():
        assert sorted(ranks) == [1, 2, 3]


def test_filter_before_rank_not_after(emb, queries):
    # a post-hoc filter on plain top-k would under-fill when the nearest
    # neighbors share the anchor's label; the miner must not
    plain = similarity.topk_join(queries, emb, k=3)
    lab = emb.select(F.col("vec_id"), F.col("label").alias("_nl"))
    qlab = queries.select(F.col("query_id"), F.col("label").alias("_ql"))
    post = (
        plain.join(lab, "vec_id")
        .join(qlab, "query_id")
        .filter(F.col("_nl") != F.col("_ql"))
    )
    mined = similarity.hard_negatives(queries, emb, k=3)
    assert mined.count() == 15  # 5 anchors x 3, always filled
    assert post.count() <= mined.count()


def test_negatives_sorted_by_similarity(emb, queries):
    got = similarity.hard_negatives(queries, emb, k=3).collect()
    per_q: dict[int, list[tuple[int, float]]] = {}
    for r in got:
        per_q.setdefault(r["query_id"], []).append((r["rank"], r["cosine"]))
    for pairs in per_q.values():
        pairs.sort()
        cosines = [c for _, c in pairs]
        assert cosines == sorted(cosines, reverse=True)

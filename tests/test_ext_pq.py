"""Product quantization (ext/pq.py — Jégou et al. 2011): codebook shape,
encode determinism, compression sanity (identical vectors share codes),
ADC ranking vs exact distance, and plan hygiene."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_databricks_metrics_spark.ext import pq
from dbt_databricks_metrics_spark.sources import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


@pytest.fixture(scope="module")
def trained(emb):
    return pq.pq_train(emb, m=4, n_codes=8, n_iter=1).localCheckpoint(eager=True)


def test_codebook_shape(trained):
    rows = trained.collect()
    assert {(r["sub"]) for r in rows} <= {0, 1, 2, 3}
    assert all(0 <= r["code"] < 8 for r in rows)
    assert all(len(r["cent"]) == 16 for r in rows)
    # k-means may drop empty codes but every subspace keeps >= 1
    per_sub = {s: sum(1 for r in rows if r["sub"] == s) for s in range(4)}
    assert all(v >= 1 for v in per_sub.values())


def test_encode_is_deterministic_and_total(emb, trained):
    a = pq.pq_encode(emb, trained).collect()
    b = pq.pq_encode(emb.repartition(7), trained).collect()
    key = lambda r: r["vec_id"]  # noqa: E731
    assert sorted(map(tuple, a), key=lambda t: t[0]) == sorted(
        map(tuple, b), key=lambda t: t[0]
    )
    assert len(a) == emb.count()


def test_identical_vectors_share_codes(spark, emb, trained):
    twin = emb.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 77000).alias("vec_id"), "embedding"
    )
    both = emb.select("vec_id", "embedding").unionByName(twin)
    codes = {r["vec_id"]: (r["code_0"], r["code_1"], r["code_2"], r["code_3"])
             for r in pq.pq_encode(both, trained).collect()}
    for i in range(5):
        assert codes[i] == codes[i + 77000]


def test_adc_query_finds_itself_first(emb, trained):
    # the query IS vector 0: its own code word combination minimizes the
    # ADC distance (ties broken by id), so vec 0 must rank 1
    qs = pq.subspace_slices(emb.filter(F.col("vec_id") == 0), 4, 16).select("sub", "sv")
    codes = pq.pq_encode(emb, trained)
    top = pq.pq_adc_topk(codes, trained, qs, k=10)
    rows = sorted(top.collect(), key=lambda r: r["adc_rank"])
    assert rows[0]["vec_id"] == 0
    assert [r["adc_rank"] for r in rows] == list(range(1, len(rows) + 1))
    dists = [r["adc_dist"] for r in rows]
    assert dists == sorted(dists)


def test_bad_dim(emb):
    with pytest.raises(ValueError, match="not divisible"):
        pq.pq_train(emb, m=5, dim=64)


def test_plan_no_python_udf(emb, trained):
    df = pq.pq_encode(emb, trained)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_ivfpq_probes_own_cell_and_ranks_self_first(emb, trained):
    qv = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    codes = pq.pq_encode(emb, trained)
    out = sorted(
        pq.ivfpq_topk(emb, codes, trained, qv, k=10, n_cells=4, n_probe=2).collect(),
        key=lambda r: r["adc_rank"],
    )
    # the query's own cell is always its max-cosine cell, so vec 0 is
    # among the candidates and its codes minimize the ADC distance
    assert out[0]["vec_id"] == 0
    assert [r["adc_rank"] for r in out] == list(range(1, len(out) + 1))


def test_ivfpq_is_subset_of_full_adc_candidates(emb, trained):
    # pruning only removes candidates: every ivfpq hit must also appear
    # in the unpruned ADC ranking restricted to the probed population
    qv = emb.filter(F.col("vec_id") == 0).first()["embedding"]
    codes = pq.pq_encode(emb, trained)
    pruned = {r["vec_id"] for r in
              pq.ivfpq_topk(emb, codes, trained, qv, k=50, n_cells=4, n_probe=4).collect()}
    qs = pq.subspace_slices(emb.filter(F.col("vec_id") == 0), 4, 16).select("sub", "sv")
    full = {r["vec_id"] for r in pq.pq_adc_topk(codes, trained, qs, k=50).collect()}
    # with n_probe == n_cells nothing is pruned: identical top-50 sets
    assert pruned == full

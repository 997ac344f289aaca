"""k-means tests ([EXT]): assignment correctness on separable data,
objective improvement over rounds, determinism, empty-cluster handling,
DuckDB unrolled-oracle parity, and plan shape (no Python UDFs).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_databricks_metrics_spark.ext import kmeans
from dbt_databricks_metrics_spark.sources import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").cache()


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_separable_clusters_recovered(spark):
    # two tight direction-bundles; k=2 must split them exactly
    a = [(i, [1.0, 0.0, 0.01 * i]) for i in range(10)]
    b = [(100 + i, [0.0, 1.0, 0.01 * i]) for i in range(10)]
    df = _vecs(spark, a + b)
    cents = kmeans.kmeans_fit(df, n_clusters=2, n_iter=3)
    assign = kmeans.kmeans_assign(df, cents).collect()
    groups = {}
    for r in assign:
        groups.setdefault(r["cluster_id"], set()).add(r["vec_id"])
    parts = sorted(groups.values(), key=lambda s: min(s))
    assert parts == [set(range(10)), set(range(100, 110))]


def test_avg_cosine_improves_over_init(emb):
    def quality(n_iter):
        stats = kmeans.kmeans_cluster_stats(emb, n_clusters=8, n_iter=n_iter)
        r = stats.agg(
            (F.sum(F.col("avg_cosine") * F.col("n_members")) / F.sum("n_members")).alias("q")
        ).collect()[0]
        return r["q"]

    assert quality(2) >= quality(0) - 1e-9


def test_deterministic(emb):
    a = sorted(map(tuple, kmeans.kmeans_cluster_stats(emb, 8, 2).collect()))
    b = sorted(map(tuple, kmeans.kmeans_cluster_stats(emb, 8, 2).collect()))
    assert a == b


def test_all_vectors_assigned(emb):
    cents = kmeans.kmeans_fit(emb, n_clusters=8, n_iter=2)
    assign = kmeans.kmeans_assign(emb, cents)
    assert assign.count() == emb.count()
    assert assign.select("vec_id").distinct().count() == emb.count()


def test_duckdb_oracle_parity(spark, duck, sf_dir):
    """One full Lloyd round (init → assign → update → assign) unrolled in
    DuckDB SQL must give the identical final assignment."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = kmeans.kmeans_fit(emb, n_clusters=4, n_iter=1)
    got = {
        (r["vec_id"], r["cluster_id"])
        for r in kmeans.kmeans_assign(emb, cents).collect()
    }
    want = set(
        duck.execute(
            """
            WITH init AS (
              SELECT vec_id AS cluster_id, CAST(embedding AS DOUBLE[]) AS centroid
              FROM embeddings
              ORDER BY (vec_id % 1000000 * (2654435761 % 1000000)) % 1000000, vec_id
              LIMIT 4
            ),
            a0 AS (
              SELECT vec_id, cluster_id FROM (
                SELECT e.vec_id, i.cluster_id,
                       row_number() OVER (
                         PARTITION BY e.vec_id
                         ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), i.centroid), 6) DESC,
                                  i.cluster_id) AS rk
                FROM embeddings e CROSS JOIN init i)
              WHERE rk = 1
            ),
            dims AS (
              SELECT a0.cluster_id, i AS dim,
                     round(avg(CAST(e.embedding AS DOUBLE[])[i]), 6) AS m
              FROM embeddings e
              JOIN a0 USING (vec_id)
              CROSS JOIN generate_series(1, 64) AS t(i)
              GROUP BY 1, 2
            ),
            c1 AS (
              SELECT cluster_id, list(m ORDER BY dim) AS centroid FROM dims GROUP BY 1
            )
            SELECT vec_id, cluster_id FROM (
              SELECT e.vec_id, c.cluster_id,
                     row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.centroid), 6) DESC,
                                c.cluster_id) AS rk
              FROM embeddings e CROSS JOIN c1 c)
            WHERE rk = 1
            """
        ).fetchall()
    )
    assert got == want


def test_plan_no_python_udf_no_single_partition_sort(emb):
    fit = kmeans.kmeans_fit(emb, n_clusters=4, n_iter=1)
    plan = fit._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # init must be TakeOrderedAndProject, not a global sort
    init_plan = kmeans.kmeans_init(emb, 4)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in init_plan


def test_arrow_assign_matches_expr(emb):
    cents = kmeans.kmeans_fit(emb, n_clusters=8, n_iter=1)
    expr = {
        (r["vec_id"], r["cluster_id"], r["cosine"])
        for r in kmeans.kmeans_assign(emb, cents, method="expr").collect()
    }
    arrow = {
        (r["vec_id"], r["cluster_id"], r["cosine"])
        for r in kmeans.kmeans_assign(emb, cents, method="arrow").collect()
    }
    assert expr == arrow


def test_arrow_assign_throughput_shape(emb):
    cents = kmeans.kmeans_fit(emb, n_clusters=8, n_iter=0)
    plan = (
        kmeans.kmeans_assign(emb, cents, method="arrow")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # Arrow-batched (MapInPandas), not row-at-a-time BatchEvalPython
    assert "MapInPandas" in plan and "BatchEvalPython" not in plan
    assert "Exchange" not in plan  # map-only: no shuffle

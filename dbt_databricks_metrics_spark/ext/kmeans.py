"""Distributed k-means over embedding columns ([EXT]) — Lloyd's
iterations as pure DataFrame operations (public algorithm; the Spark
idiom mirrors how `pyspark.ml.clustering.KMeans` structures each round:
broadcast the centroids, one pass over the data to assign + partially
aggregate, tiny driver-side model update).

Why here: `similarity.ivf_centroids` picks hash-sampled corpus vectors
as IVF cells — cheap, but cells are uneven. A few Lloyd rounds tighten
them; `ivf_topk(centroids=kmeans_fit(...))` plugs the trained cells
straight into the ANN path.

Design choices, all in service of determinism + scale:

* **Assignment is by cosine** (scale-invariant), so centroid updates
  can skip re-normalization — the plain element-wise member mean ranks
  identically to the spherical (normalized) centroid.
* **Deterministic init**: the ``n_clusters`` vectors with the lowest
  multiplicative-hash of their id (the `sampling.bucket` arithmetic,
  reproducible bit-for-bit in any engine — unlike xxhash64). Compiles
  to TakeOrderedAndProject, no global sort.
* **Rounded arithmetic at the decision points**: per-element centroid
  means and assignment cosines round to 6 decimals each round, so a
  fixed-iteration run is reproducible across engines (float summation
  order differs; rounding absorbs it). This is what makes the contract
  query's unrolled-SQL DuckDB oracle exact, same pattern as
  `quality_score` / `embedding_dup_pairs`.
* **Fixed ``n_iter``**, no convergence test — callers pick the round
  count (IVF wants 2-5, not convergence); fixed rounds keep the plan a
  finite DAG (checkpointable, SQL-unrollable). Empty clusters drop out
  (deterministically — both engines lose exactly the memberless ids).

Scale shape (100 TB posture): each round is ONE corpus pass — broadcast
k×d centroids, per-row argmax over k cosines (a codegen'd loop, no
shuffle), then `posexplode → groupBy (cluster, dim) avg` whose shuffle
carries k·d partial sums per task after map-side combine, not the
corpus. Corpus rows are never joined against each other.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .sampling import MODULUS, _KNUTH
from .similarity import _as_double_array, cosine_similarity


def _init_order(id_col: str) -> Column:
    """Cross-engine-reproducible pseudo-random order (see sampling.bucket)."""
    k = F.pmod(F.col(id_col).cast("long"), F.lit(MODULUS))
    return F.pmod(k * F.lit(_KNUTH % MODULUS), F.lit(MODULUS))


def kmeans_init(
    corpus: DataFrame,
    n_clusters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic seed centroids: (cluster_id, centroid)."""
    return (
        corpus.select(
            F.col(id_col).alias("cluster_id"),
            _as_double_array(F.col(vec_col)).alias("centroid"),
        )
        .orderBy(_init_order("cluster_id"), F.col("cluster_id"))
        .limit(n_clusters)
    )


def kmeans_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cluster_id, cosine): each vector's max-cosine centroid.

    Ties (after 6-decimal rounding) break by cluster_id — deterministic
    and engine-independent. Broadcast join: k×d floats to every task.
    """
    scored = corpus.select(
        F.col(id_col), _as_double_array(F.col(vec_col)).alias("_v")
    ).crossJoin(F.broadcast(centroids))
    w = Window.partitionBy(id_col).orderBy(
        F.round(cosine_similarity(F.col("_v"), F.col("centroid")), 6).desc(),
        F.col("cluster_id"),
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(
            id_col,
            "cluster_id",
            F.round(cosine_similarity(F.col("_v"), F.col("centroid")), 6).alias(
                "cosine"
            ),
        )
    )


def _update(
    corpus: DataFrame, assign: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """New centroids = per-cluster element-wise member mean (rounded)."""
    member_vals = (
        corpus.select(F.col(id_col), _as_double_array(F.col(vec_col)).alias("_v"))
        .join(assign.select(id_col, "cluster_id"), id_col)
        .select("cluster_id", F.posexplode("_v").alias("_i", "_x"))
    )
    dim_means = member_vals.groupBy("cluster_id", "_i").agg(
        F.round(F.avg("_x"), 6).alias("_m")
    )
    return dim_means.groupBy("cluster_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("_i", "_m"))), lambda s: s["_m"]
        ).alias("centroid")
    )


def kmeans_fit(
    corpus: DataFrame,
    n_clusters: int = 8,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``n_iter`` Lloyd rounds from the deterministic init; returns the
    final (cluster_id, centroid) table (empty clusters dropped)."""
    if n_clusters < 1 or n_iter < 0:
        raise ValueError(f"need n_clusters >= 1, n_iter >= 0; got {n_clusters}, {n_iter}")
    cents = kmeans_init(corpus, n_clusters, id_col, vec_col)
    for _ in range(n_iter):
        assign = kmeans_assign(corpus, cents, id_col, vec_col)
        cents = _update(corpus, assign, id_col, vec_col)
    return cents


def kmeans_cluster_stats(
    corpus: DataFrame,
    n_clusters: int = 8,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Fit + final assignment rollup: (cluster_id, n_members, avg_cosine)
    — the compact quality summary (avg member-to-centroid cosine rises
    monotonically-ish across rounds; the contract query checks it)."""
    cents = kmeans_fit(corpus, n_clusters, n_iter, id_col, vec_col)
    assign = kmeans_assign(corpus, cents, id_col, vec_col)
    return assign.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.round(F.avg("cosine"), 4).alias("avg_cosine"),
    )

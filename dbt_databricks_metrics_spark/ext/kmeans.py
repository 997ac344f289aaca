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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import _bind_once
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


_LITERAL_K_MAX = 256  # beyond this the literal expression tree gets codegen-hostile


def _literal_argmax(rows):
    """vec-Column → (cos, neg_cid)-struct of the max-cosine centroid,
    with the centroids folded in as single nested literals (ONE Literal
    node each — not k×d CreateArray children re-evaluated per row) and
    driver-precomputed centroid norms, so per row the work is k dot
    products plus one self-norm, each a single fold over the vector.

    argmax by (cosine, -cid): struct max compares fields in order, so
    equal rounded cosines resolve to the SMALLEST cluster_id; try_divide
    keeps zero-norm vectors NULL-cosine (they sort below every real
    match), matching cosine_similarity's contract."""
    cvs = F.lit([[float(x) for x in r["centroid"]] for r in rows])
    cids = F.lit([int(r["cluster_id"]) for r in rows])
    cnorms = F.lit(
        [sum(float(x) * float(x) for x in r["centroid"]) ** 0.5 for r in rows]
    )

    def dot(u: Column, w: Column) -> Column:
        return F.aggregate(
            F.zip_with(u, w, lambda x, y: x * y), F.lit(0.0), lambda a, b: a + b
        )

    def best_of(vec: Column) -> Column:
        # self-norm bound once per row — lambdas get no CSE
        return _bind_once(
            F.sqrt(dot(vec, vec)),
            lambda vnorm: F.array_max(
                F.transform(
                    F.sequence(F.lit(1), F.lit(len(rows))),
                    lambda i: F.struct(
                        F.round(
                            F.try_divide(
                                dot(vec, F.element_at(cvs, i.cast("int"))),
                                vnorm * F.element_at(cnorms, i.cast("int")),
                            ),
                            6,
                        ).alias("cos"),
                        (-F.element_at(cids, i.cast("int"))).alias("neg_cid"),
                    ),
                )
            ),
        )

    return best_of


def _assign_arrow(
    corpus: DataFrame, rows, id_col: str, vec_col: str
) -> DataFrame:
    """Arrow-batched assign kernel: per batch, ONE numpy matmul
    ``V @ Cᵀ`` scores every (vector, centroid) pair — the vectorized
    form the interpreted per-element expressions cannot reach (~50× per
    row). Semantics identical to the expression path: cosine rounded to
    6 decimals, ties to the smallest cluster_id, zero-norm vectors get
    NULL cosine + the smallest cluster_id."""
    import numpy as np

    order = sorted(range(len(rows)), key=lambda i: int(rows[i]["cluster_id"]))
    cids = np.array([int(rows[i]["cluster_id"]) for i in order], dtype=np.int64)
    C = np.array([rows[i]["centroid"] for i in order], dtype=np.float64)
    cnorm = np.sqrt((C * C).sum(axis=1))

    id_type = corpus.schema[id_col].dataType.simpleString()

    def kernel(batches):
        for pdf in batches:
            V = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            if V.ndim == 1:  # empty batch
                V = V.reshape(0, C.shape[1])
            vnorm = np.sqrt((V * V).sum(axis=1))
            denom = vnorm[:, None] * cnorm[None, :]
            with np.errstate(divide="ignore", invalid="ignore"):
                raw = np.where(denom > 0, (V @ C.T) / denom, -np.inf)
            # HALF_UP rounding (away from zero on .5) to match Spark's
            # F.round — np.round is banker's (half-even) and would flip
            # the odd exact-boundary tie the expr path rounds the other
            # way. Residual caveat: Spark rounds the SHORTEST DECIMAL
            # repr (BigDecimal) while this rounds the binary double, so
            # a value whose binary form sits epsilon below a decimal
            # midpoint can still round differently — measure-zero in
            # practice, but arrow≡expr is exact-boundary-approximate,
            # not bit-guaranteed
            cos = np.where(
                np.isfinite(raw),
                np.sign(raw) * np.floor(np.abs(raw) * 1e6 + 0.5) / 1e6,
                raw,
            )
            # argmax takes the FIRST max — centroids sorted by cid, so
            # ties resolve to the smallest cluster_id, like the expr path
            best = cos.argmax(axis=1)
            bc = cos[np.arange(len(best)), best]
            out = pdf[[id_col]].copy()
            out["cluster_id"] = cids[best]
            # zero-norm vectors: None (NULL), matching the expr path's
            # try_divide — not NaN
            out["cosine"] = [float(x) if np.isfinite(x) else None for x in bc]
            yield out

    return corpus.select(id_col, vec_col).mapInPandas(
        kernel, schema=f"{id_col} {id_type}, cluster_id long, cosine double"
    )


def kmeans_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "expr",
) -> DataFrame:
    """(id, cluster_id, cosine): each vector's max-cosine centroid.

    Ties (after 6-decimal rounding) break by cluster_id — deterministic
    and engine-independent.

    Physical strategies, same semantics:

    * ``method="expr"`` (default, the oracle path), k ≤ 256 — the
      centroids (model state, k rows) fold into literal arrays and the
      argmax is a per-row ``array_max`` over a ``transform`` — MAP-ONLY:
      zero shuffle, zero join, one corpus pass. This is the
      parameter-server shape: ship the model inside the closure, never
      move the data.
    * ``method="expr"``, k > 256 — broadcast crossJoin + ``max_by`` hash
      aggregation (partial agg map-side, one shuffle of per-id best
      structs — still no sort window).
    * ``method="arrow"`` — the throughput path for real embedding
      volumes: Arrow-batched ``mapInPandas``, one numpy matmul per
      batch (zero-norm vectors: NaN cosine instead of NULL). Still
      map-only; use it when vectors × k makes the interpreted
      expressions the bottleneck.
    """
    rows = centroids.select("cluster_id", "centroid").collect()
    if not rows:
        raise ValueError("kmeans_assign: empty centroid table")
    if method == "arrow":
        return _assign_arrow(corpus, rows, id_col, vec_col)
    if method != "expr":
        raise ValueError(f"method must be expr|arrow, got {method!r}")
    v = _as_double_array(F.col(vec_col))
    if len(rows) <= _LITERAL_K_MAX:
        best = _bind_once(v, _literal_argmax(rows))
        return corpus.select(
            F.col(id_col),
            (-best["neg_cid"]).cast("long").alias("cluster_id"),
            best["cos"].alias("cosine"),
        )
    scored = corpus.select(F.col(id_col), v.alias("_v")).crossJoin(
        F.broadcast(centroids)
    )
    cos = F.round(cosine_similarity(F.col("_v"), F.col("centroid")), 6)
    best = F.max_by(
        F.struct(F.col("cluster_id"), cos.alias("cos")),
        F.struct(cos.alias("cos"), (-F.col("cluster_id")).alias("neg_cid")),
    )
    return (
        scored.groupBy(id_col)
        .agg(best.alias("_b"))
        .select(id_col, F.col("_b.cluster_id"), F.col("_b.cos").alias("cosine"))
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
    return _means_by_cluster(member_vals)


def _means_by_cluster(member_vals: DataFrame) -> DataFrame:
    """(cluster_id, _i, _x) exploded member values → rounded mean vectors."""
    dim_means = member_vals.groupBy("cluster_id", "_i").agg(
        F.round(F.avg("_x"), 6).alias("_m")
    )
    return dim_means.groupBy("cluster_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("_i", "_m"))), lambda s: s["_m"]
        ).alias("centroid")
    )


def _update_from_rows(corpus: DataFrame, rows, vec_col: str) -> DataFrame:
    """One Lloyd round WITHOUT a join: the same map pass computes each
    vector's argmax cluster (centroids folded in as literals) and keeps
    the vector, so the update is assign-inline → posexplode → groupBy —
    exactly one shuffle per round, carrying k·d partial sums per task
    after map-side combine."""
    v = _as_double_array(F.col(vec_col))
    best = _bind_once(v, _literal_argmax(rows))
    assigned = corpus.select(
        (-best["neg_cid"]).cast("long").alias("cluster_id"), v.alias("_v")
    )
    return _means_by_cluster(
        assigned.select("cluster_id", F.posexplode("_v").alias("_i", "_x"))
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

    # Each round collects the k-row centroid table (model state — the
    # same k-sized model a parameter server would hold; collecting it is
    # the one right driver-side step) and folds it into the next round's
    # literals. Rounds therefore never nest lazy lineage, and with the
    # assignment computed inline (k <= 256) a round is ONE corpus pass +
    # ONE shuffle of k·d partial sums — no join, no window.
    init = kmeans_init(corpus, n_clusters, id_col, vec_col)
    schema = "cluster_id long, centroid array<double>"
    rows = [
        {"cluster_id": r["cluster_id"], "centroid": list(r["centroid"])}
        for r in init.collect()
    ]
    spark = corpus.sparkSession
    for _ in range(n_iter):
        if not rows:
            break  # empty corpus: nothing to refine
        if len(rows) <= _LITERAL_K_MAX:
            nxt = _update_from_rows(corpus, rows, vec_col)
        else:
            cents = spark.createDataFrame(rows, schema)
            nxt = _update(
                corpus, kmeans_assign(corpus, cents, id_col, vec_col), id_col, vec_col
            )
        rows = [
            {"cluster_id": r["cluster_id"], "centroid": list(r["centroid"])}
            for r in nxt.collect()
        ]
    return spark.createDataFrame(rows, schema)


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

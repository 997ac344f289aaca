"""Similarity search over embedding columns ([EXT]).

* **Brute-force top-k** — exact cosine against every corpus vector,
  `orderBy(score).limit(k)`. Exact + parallel: the scan is partitioned,
  each partition computes scores natively (zip_with/aggregate — no UDF),
  and Spark's `TakeOrderedAndProject` merges per-partition top-k heaps —
  no full sort, no full shuffle. This is the baseline/oracle.
* **Top-k join** — k nearest corpus vectors for *each* query vector:
  broadcast the (small) query side, score all pairs, per-query top-k via
  window `row_number`. Exact.
* **SRP-LSH (signed random projection)** — the scale path for 100 TB:
  deterministic pseudo-random hyperplanes (derived from xxhash64, no RNG
  state) give each vector a b-bit sign signature; banding the signature
  turns the similarity join into an equi-join on bucket keys, and only
  candidates get exact cosine. Recall < 1 by construction — the knob is
  (n_planes, bands, band rotations).

IVF (inverted-file) variant: `ivf_assign`/`ivf_topk` cluster by nearest
of C sampled "centroid" vectors and probe the closest cells only.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import cosine_similarity


def _as_double_array(col: Column) -> Column:
    return col.cast("array<double>")


def topk_similar(
    corpus: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine for one query vector.

    The literal query vector is folded into the plan (broadcast to every
    task); ties broken by id for determinism.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = corpus.select(
        F.col(id_col),
        F.round(cosine_similarity(_as_double_array(F.col(vec_col)), q), 6).alias(
            "cosine"
        ),
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col)).limit(k)


def topk_join(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact k-NN join: for each query row, the k most-cosine-similar
    corpus rows. Query side is broadcast (it is the small side by
    contract); per-query top-k via window row_number."""
    q = queries.select(
        F.col(query_id).alias("_qid"), _as_double_array(F.col(vec_col)).alias("_qv")
    )
    c = corpus.select(
        F.col(corpus_id).alias("_cid"), _as_double_array(F.col(vec_col)).alias("_cv")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        F.col("_qid").alias(query_id),
        F.col("_cid").alias(corpus_id),
        F.round(cosine_similarity(F.col("_qv"), F.col("_cv")), 6).alias("cosine"),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("cosine").desc(), F.col(corpus_id))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("rank")
    )


def hard_negatives(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id: str = "query_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive training (the in-batch /
    ANCE-style negative selection idea, Xiong et al. 2021 — public): for
    each query row, the k most-cosine-similar corpus rows whose
    ``label_col`` DIFFERS from the query's — the negatives the model
    currently confuses, which carry the training signal random negatives
    don't.

    The label filter runs BEFORE the per-query rank window (filtering
    after a plain top-k would under-fill queries whose neighborhoods are
    same-label). Plan shape mirrors `topk_join`: the query side is the
    broadcastable anchor batch by contract; the corpus scan is map-only
    into a per-query window over k survivors. For corpus-scale anchor
    sets, run per-IVF-cell (`ivf_topk`) instead of one broadcast.
    """
    q = queries.select(
        F.col(query_id).alias("_qid"),
        _as_double_array(F.col(vec_col)).alias("_qv"),
        F.col(label_col).alias("_qlabel"),
    )
    c = corpus.select(
        F.col(corpus_id).alias("_cid"),
        _as_double_array(F.col(vec_col)).alias("_cv"),
        F.col(label_col).alias("_clabel"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(~F.col("_clabel").eqNullSafe(F.col("_qlabel")))
        .select(
            F.col("_qid").alias(query_id),
            F.col("_cid").alias(corpus_id),
            F.col("_clabel").alias(label_col),
            F.round(
                cosine_similarity(F.col("_qv"), F.col("_cv")), 6
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cosine").desc(), F.col(corpus_id)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# ---------------------------------------------------------------------------
# SRP-LSH
# ---------------------------------------------------------------------------


def srp_signature(vec: Column, dim: int, n_planes: int = 16) -> Column:
    """Sign signature under deterministic pseudo-random hyperplanes.

    Plane p's j-th component is +1/-1 from the parity of
    ``xxhash64(p * dim + j)`` — identical on every executor with no RNG
    shipping. Returns an int (bit p set ⇔ dot(plane_p, v) > 0).
    """
    bits = []
    for p in range(n_planes):
        comps = F.array(
            *[
                F.when(
                    F.xxhash64(F.lit(p * dim + j)).bitwiseAND(F.lit(1)) == 1,
                    F.lit(1.0),
                ).otherwise(F.lit(-1.0))
                for j in range(dim)
            ]
        )
        dot = F.aggregate(
            F.zip_with(vec, comps, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(
            F.when(dot > 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(
                F.lit(0).cast("long")
            )
        )
    out = F.lit(0).cast("long")
    for b in bits:
        out = out.bitwiseOR(b)
    return out


def srp_candidates(
    df: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Candidate similar pairs: equi-join on banded SRP signature chunks.
    High-cosine pairs agree on most sign bits, so they collide in ≥1 band
    with high probability. Returns (id_a, id_b) distinct."""
    width = n_planes // bands
    sg = df.select(
        F.col(id_col).alias("_id"),
        srp_signature(_as_double_array(F.col(vec_col)), dim, n_planes).alias("_sig"),
    )
    chunks = sg.select(
        "_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright(F.col("_sig"), i * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("chunk"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("bc"),
    ).select("_id", "bc.band", "bc.chunk").localCheckpoint(eager=False)
    # checkpointed: the self-join's two sides otherwise each recompute
    # the SRP signature (n_planes dot products per row) over the corpus
    # (guide §5)
    a, b = chunks.alias("a"), chunks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )


def srp_similar_pairs(
    df: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 16,
    bands: int = 4,
    threshold: float = 0.9,
) -> DataFrame:
    """SRP candidates → exact cosine verification (candidates only)."""
    cand = srp_candidates(df, dim, id_col, vec_col, n_planes, bands)
    v = df.select(
        F.col(id_col).alias("_id"), _as_double_array(F.col(vec_col)).alias("_v")
    )
    return (
        cand.join(v.alias("va"), cand.id_a == F.col("va._id"))
        .join(v.alias("vb"), cand.id_b == F.col("vb._id"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine_similarity(F.col("va._v"), F.col("vb._v")), 6).alias(
                "cosine"
            ),
        )
        .filter(F.col("cosine") >= threshold)
    )


# ---------------------------------------------------------------------------
# IVF
# ---------------------------------------------------------------------------


def ivf_centroids(
    corpus: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic coarse quantizer: the n_cells corpus vectors with the
    lowest ``xxhash64(id)`` act as centroids (reservoir-free deterministic
    sample). Real IVF would k-means these; the routing machinery is
    identical and that is what matters for the scale path."""
    sel = corpus.select(
        F.col(id_col).alias("centroid_id"),
        _as_double_array(F.col(vec_col)).alias("centroid_vec"),
    )
    # orderBy+limit compiles to TakeOrderedAndProject: per-partition top-n
    # heaps merged on the driver — no unpartitioned window, no single-task
    # global sort (the n_cells result is tiny by construction).
    return sel.orderBy(
        F.xxhash64(F.col("centroid_id").cast("string")), F.col("centroid_id")
    ).limit(n_cells)


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its max-cosine centroid (broadcast join)."""
    scored = corpus.select(
        F.col(id_col), _as_double_array(F.col(vec_col)).alias("_v")
    ).crossJoin(F.broadcast(centroids))
    w = Window.partitionBy(id_col).orderBy(
        cosine_similarity(F.col("_v"), F.col("centroid_vec")).desc(),
        F.col("centroid_id"),
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(id_col, "centroid_id")
    )


def ivf_topk(
    corpus: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """ANN top-k probing only the n_probe nearest cells (partition pruning
    for vectors: at scale, cell assignment is the storage partition key and
    unprobed cells are never read).

    Pass ``centroids=(centroid_id, centroid_vec)`` to probe trained cells
    (`ext.kmeans.kmeans_fit` output, renamed) instead of the hash-sampled
    default — tighter cells raise recall at the same n_probe."""
    cents = (
        centroids
        if centroids is not None
        else ivf_centroids(corpus, n_cells, id_col, vec_col)
    )
    assign = ivf_assign(corpus, cents, id_col, vec_col)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    probe_cells = [
        r["centroid_id"]
        for r in cents.select(
            "centroid_id",
            cosine_similarity(F.col("centroid_vec"), q).alias("c"),
        )
        .orderBy(F.col("c").desc(), F.col("centroid_id"))
        .limit(n_probe)
        .collect()
    ]
    probed = corpus.join(assign, id_col).filter(F.col("centroid_id").isin(probe_cells))
    return topk_similar(probed, query_vec, k, id_col, vec_col)


def truncation_agreement(
    corpus: DataFrame,
    trunc_dim: int,
    k: int = 10,
    n_queries: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_salts: int = 32,
) -> DataFrame:
    """Retrieval agreement between full-dimension and TRUNCATED-dimension
    cosine top-k — the eval behind the "can we store/search the first d
    dims only?" decision (Matryoshka representation learning, Kusupati
    et al. 2022, public; the index-shrink every 100 TB embedding pipeline
    considers). For each of the first ``n_queries`` ids (deterministic
    probe set), retrieve exact top-k twice — full vectors vs
    ``slice(vec, 1, trunc_dim)`` (cosine renormalizes, so no explicit
    re-norm) — and report the per-query overlap count and recall@k.

    Returns (query_id, trunc_dim, k, n_overlap, recall_at_k); n_overlap
    is an integer and recall derives from it, so the projection hashes
    deterministically. Scores round to 6dp before ranking (the repo's
    bounded-statistic grid) with id tie-breaks, so the top-k SETS are
    layout- and engine-invariant.

    Scale shape: the probe set broadcasts; the corpus is scanned ONCE
    with both scores computed map-side. Per-query top-k then runs in two
    window stages: first partitioned by (query, salt) — n_queries×n_salts
    balanced keys, never the q-reducer skew a bare per-query window has —
    keeping a superset (per-salt top-k under either metric, the standard
    distributed-top-k refinement), then the exact window over the
    surviving n_queries×n_salts×2k rows.
    """
    if trunc_dim < 1:
        raise ValueError(f"trunc_dim must be >= 1, got {trunc_dim}")
    v = corpus.select(
        F.col(id_col).alias("_cid"), _as_double_array(F.col(vec_col)).alias("_cv")
    )
    q = (
        v.select(F.col("_cid").alias("_qid"), F.col("_cv").alias("_qv"))
        .orderBy("_qid")
        .limit(n_queries)
    )
    scored = (
        v.join(F.broadcast(q), F.col("_cid") != F.col("_qid"))
        .select(
            "_qid",
            "_cid",
            F.round(cosine_similarity(F.col("_qv"), F.col("_cv")), 6).alias("_full"),
            F.round(
                cosine_similarity(
                    F.slice(F.col("_qv"), 1, trunc_dim),
                    F.slice(F.col("_cv"), 1, trunc_dim),
                ),
                6,
            ).alias("_trunc"),
        )
        .withColumn("_salt", F.pmod(F.xxhash64(F.col("_cid")), F.lit(n_salts)))
    )
    pre_f = Window.partitionBy("_qid", "_salt").orderBy(
        F.col("_full").desc(), F.col("_cid")
    )
    pre_t = Window.partitionBy("_qid", "_salt").orderBy(
        F.col("_trunc").desc(), F.col("_cid")
    )
    survivors = (
        scored.withColumn("_pf", F.row_number().over(pre_f))
        .withColumn("_pt", F.row_number().over(pre_t))
        .filter((F.col("_pf") <= k) | (F.col("_pt") <= k))
    )
    wf = Window.partitionBy("_qid").orderBy(F.col("_full").desc(), F.col("_cid"))
    wt = Window.partitionBy("_qid").orderBy(F.col("_trunc").desc(), F.col("_cid"))
    flagged = (
        survivors.withColumn("_in_full", F.row_number().over(wf) <= k)
        .withColumn("_in_trunc", F.row_number().over(wt) <= k)
        .filter(F.col("_in_full") | F.col("_in_trunc"))
    )
    return (
        flagged.groupBy(F.col("_qid").alias("query_id"))
        .agg(
            F.lit(trunc_dim).alias("trunc_dim"),
            F.lit(k).alias("k"),
            F.sum(
                F.when(F.col("_in_full") & F.col("_in_trunc"), 1).otherwise(0)
            ).alias("n_overlap"),
        )
        .withColumn("recall_at_k", F.col("n_overlap") / F.lit(float(k)))
    )


def hamming_topk(
    corpus: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    validate_dim: bool = True,
) -> DataFrame:
    """Exact top-k by HAMMING distance over 1-bit binary-quantized
    vectors (``ext.quantize.binary_quantize``) — the 32x-compressed
    retrieval rung: at 100 TB the packed codes fit where floats can't,
    and the scan is integer xor+popcount instead of FMA. The query packs
    driver-side (bit-identical mirror, pinned in tests) and folds into
    the plan; per-partition scoring merges through
    TakeOrderedAndProject — no shuffle, all-integer output
    (id, hamming). Ties break by id.

    The query dimension is validated against ONE sampled corpus vector
    (a mismatched query would NULL every distance via zip_with padding
    and silently return the k lowest ids) — pass
    ``validate_dim=False`` to skip that one tiny job in hot loops where
    the dimension is known."""
    from .quantize import binary_quantize, hamming_distance, pack_sign_bits

    if validate_dim:
        row = corpus.select(F.size(F.col(vec_col)).alias("_n")).first()
        if row is not None and row["_n"] is not None and row["_n"] != len(
            list(query_vec)
        ):
            raise ValueError(
                f"hamming_topk: query dim {len(list(query_vec))} != corpus "
                f"dim {row['_n']} — distances would be NULL"
            )
    q = F.array(
        *[F.lit(w).cast("long") for w in pack_sign_bits(list(query_vec))]
    )
    scored = corpus.select(
        F.col(id_col),
        hamming_distance(
            binary_quantize(_as_double_array(F.col(vec_col))), q
        ).alias("hamming"),
    )
    return scored.orderBy(F.col("hamming"), F.col(id_col)).limit(k)

"""Product quantization over embedding columns ([EXT]) — Jégou, Douze &
Schmid 2011, "Product Quantization for Nearest Neighbor Search" (public).

PQ compresses a d-dim float vector to ``m`` small integer codes: the
vector splits into m subspaces, each subspace gets its own k-codeword
codebook (k-means), and a vector is stored as its m argmin codeword ids
— 64 floats (256 B) become 4 bytes here. Search uses **asymmetric
distance computation (ADC)**: the query precomputes an m×k table of
query-to-codeword distances, and each database vector's approximate
distance is m table lookups summed — no float vector is ever touched at
query time.

This is the embedding-compression scale path that complements
``similarity.ivf_topk``: IVF prunes which vectors to score, PQ makes
scoring them a byte-code lookup (IVF-PQ is their composition).

Spark-first shapes (100 TB posture):

* training: per Lloyd round ONE corpus pass — the m×k codebook (bounded:
  4×8×16 doubles here) broadcasts into an equi-join on the subspace id,
  assignment is a per-(vector, subspace) window over k candidate rows,
  and the update shuffles only (sub, code, dim) partial means.
* encoding: the same broadcast join + argmin window, one pass, output
  m ints per vector.
* ADC top-k: the distance TABLE is m×k rows (driver-bounded); codes
  equi-join it on (sub, code), one groupBy(vector) sums m lookups,
  TakeOrderedAndProject keeps k. The corpus embedding column is never
  read at query time.

Determinism (the kmeans.py contract, applied here): multiplicative-hash
seed selection, and every DECISION value (assignment distance, centroid
mean, ADC cell) rounds to 6 decimals — float summation-order jitter is
absorbed, so a fixed-round run is bit-reproducible across engines and
partition layouts, and the DuckDB oracle is the same algorithm unrolled
in SQL. Distances use the dot-product identity
``|a-b|² = a·a − 2a·b + b·b`` so both engines compute the same three
folds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .kmeans import _init_order
from .similarity import _as_double_array


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _rdist2(a: Column, b: Column) -> Column:
    """round(|a-b|², 6) via the dot identity — the decision arithmetic."""
    return F.round(_dot(a, a) - 2 * _dot(a, b) + _dot(b, b), 6)


def subspace_slices(
    corpus: DataFrame,
    m: int,
    d_sub: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, sub, sv): the m fixed-width subvectors of every vector."""
    vec = _as_double_array(F.col(vec_col))
    return corpus.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("sub"),
        vec.alias("_v"),
    ).select(
        id_col,
        "sub",
        F.slice(F.col("_v"), F.col("sub") * d_sub + 1, F.lit(d_sub)).alias("sv"),
    )


def _assign(slices: DataFrame, codebook: DataFrame, id_col: str) -> DataFrame:
    """(id, sub, code): argmin codeword per subvector (rounded distance,
    lowest code breaks ties). Codebook is m×k rows — always broadcast."""
    cand = slices.join(F.broadcast(codebook), "sub")
    w = Window.partitionBy(id_col, "sub").orderBy(
        _rdist2(F.col("sv"), F.col("cent")).asc(), F.col("code").asc()
    )
    return (
        cand.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(id_col, "sub", "code")
    )


def pq_train(
    corpus: DataFrame,
    m: int = 4,
    n_codes: int = 8,
    n_iter: int = 1,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Train the per-subspace codebooks; returns (sub, code, cent).

    Seeds are the ``n_codes`` vectors with the lowest multiplicative-hash
    order (each seed contributes its slice to EVERY subspace — one seed
    scan, not m). Each Lloyd round: broadcast-join assignment + one
    (sub, code, dim) partial-mean shuffle, means rounded to 6.
    """
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    d_sub = dim // m
    slices = subspace_slices(corpus, m, d_sub, id_col, vec_col)
    # TakeOrderedAndProject picks the n_codes seed ids (no global sort);
    # the code-assignment window then runs over those n_codes rows only
    seed_ids = (
        corpus.select(F.col(id_col))
        .orderBy(_init_order(id_col), F.col(id_col))
        .limit(n_codes)
    )
    seeds = seed_ids.select(
        F.col(id_col),
        (F.row_number().over(
            Window.orderBy(_init_order(id_col), F.col(id_col))
        ) - 1).alias("code"),
    )
    codebook = slices.join(seeds, id_col).select("sub", "code", F.col("sv").alias("cent"))
    for _ in range(n_iter):
        a = _assign(slices, codebook, id_col)
        dims = (
            a.join(slices, [id_col, "sub"])
            .select("sub", "code", F.posexplode("sv").alias("i", "x"))
            .groupBy("sub", "code", "i")
            .agg(F.round(F.avg("x"), 6).alias("mval"))
        )
        codebook = dims.groupBy("sub", "code").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "mval"))),
                lambda s: s["mval"],
            ).alias("cent")
        )
    return codebook


def pq_encode(
    corpus: DataFrame,
    codebook: DataFrame,
    m: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, code_0..code_{m-1}): each vector's m codeword ids — the
    compressed representation (m small ints replace dim floats)."""
    d_sub = dim // m
    slices = subspace_slices(corpus, m, d_sub, id_col, vec_col)
    a = _assign(slices, codebook, id_col)
    return a.groupBy(id_col).agg(
        *[
            F.max(F.when(F.col("sub") == s, F.col("code"))).alias(f"code_{s}")
            for s in range(m)
        ]
    )


def pq_adc_topk(
    codes: DataFrame,
    codebook: DataFrame,
    query_slices: DataFrame,
    k: int = 10,
    m: int = 4,
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC search: (id, adc_dist, adc_rank) for the k nearest codes.

    ``query_slices`` is (sub, sv) for the query vector. The distance
    table (m×k rows, rounded cells) broadcast-joins the codes on
    (sub, code); one groupBy(id) sums the m lookups. Emitted distance
    re-rounds to 6 (sums of 6-decimal cells sit on the 1e-6 grid — the
    round is an exact snap, not a boundary coin-flip)."""
    table = codebook.join(F.broadcast(query_slices), "sub").select(
        "sub", "code", _rdist2(F.col("sv"), F.col("cent")).alias("cell")
    )
    melted = codes.selectExpr(
        id_col,
        "stack({m}, {pairs}) AS (sub, code)".format(
            m=m,
            pairs=", ".join(f"{s}, code_{s}" for s in range(m)),
        ),
    )
    scored = (
        melted.join(F.broadcast(table), ["sub", "code"])
        .groupBy(id_col)
        .agg(F.round(F.sum("cell"), 6).alias("adc_dist"))
    )
    # top-k via TakeOrderedAndProject; the rank window then orders only
    # the k surviving rows (the hybrid_search-accepted tiny-input window)
    top = scored.orderBy(F.col("adc_dist").asc(), F.col(id_col).asc()).limit(k)
    w = Window.orderBy(F.col("adc_dist").asc(), F.col(id_col).asc())
    return top.withColumn("adc_rank", F.row_number().over(w)).select(
        id_col, "adc_dist", "adc_rank"
    )


def ivfpq_topk(
    corpus: DataFrame,
    codes: DataFrame,
    codebook: DataFrame,
    query_vec,
    k: int = 10,
    n_cells: int = 4,
    n_probe: int = 2,
    m: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ: coarse cells prune WHICH vectors to score, PQ codes decide
    HOW CHEAPLY — the composition behind billion-vector ANN indices
    (Jégou et al. 2011 §V). Cells here are the deterministic
    multiplicative-hash seed vectors (``similarity.ivf_centroids``'s
    routing machinery with the kmeans.py reproducible ordering), cell
    assignment/probing use 6-decimal-rounded cosines, and scoring is ADC
    over the probed cells' codes only.

    At scale the cell id is the storage partition key: unprobed cells
    are never read, and the probed ones are scored from m-int codes —
    the scan touches neither the unprobed partitions nor any embedding.
    """
    from .kmeans import _init_order
    from .similarity import cosine_similarity

    cents = (
        corpus.select(
            F.col(id_col).alias("cid"),
            _as_double_array(F.col(vec_col)).alias("cv"),
        )
        .orderBy(_init_order("cid"), F.col("cid"))
        .limit(n_cells)
    )
    scored = corpus.select(
        F.col(id_col), _as_double_array(F.col(vec_col)).alias("_v")
    ).crossJoin(F.broadcast(cents))
    w = Window.partitionBy(id_col).orderBy(
        F.round(cosine_similarity(F.col("_v"), F.col("cv")), 6).desc(),
        F.col("cid"),
    )
    assign = (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(id_col, "cid")
    )
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    probe_cells = [
        r["cid"]
        for r in cents.select(
            "cid", F.round(cosine_similarity(F.col("cv"), q), 6).alias("c")
        )
        .orderBy(F.col("c").desc(), F.col("cid"))
        .limit(n_probe)
        .collect()
    ]
    probed = (
        codes.join(assign, id_col)
        .filter(F.col("cid").isin(probe_cells))
        .drop("cid")
    )
    d_sub = dim // m
    qs_rows = [
        (s, [float(x) for x in query_vec[s * d_sub:(s + 1) * d_sub]])
        for s in range(m)
    ]
    spark = corpus.sparkSession
    query_slices = spark.createDataFrame(qs_rows, "sub INT, sv ARRAY<DOUBLE>")
    return pq_adc_topk(probed, codebook, query_slices, k=k, m=m, id_col=id_col)

"""Feature-hashed TF-IDF document vectors ([EXT]) — the bridge from raw
text to every embedding-space operator in this engine (cosine top-k,
SRP/IVF ANN, k-means, SemDeDup, PCA, int8 quantization).

The hashing trick (public: Weinberger et al. 2009) maps each token to
``hash(token) mod dim`` — a fixed-width vector with NO vocabulary table
to build, broadcast, or keep consistent across runs; exactly why it is
the standard first vectorizer at corpus scale.

Scale shape (100 TB posture): token-keyed and doc-keyed shuffles only —
(doc, token) term frequencies, a document-frequency aggregate joined
back for IDF, then (doc, bucket) sums assembled into a dense array via
``map_from_entries`` + a ``sequence`` transform. Everything is codegen
column expressions; the vector width is a constant, so state per doc is
``dim`` doubles regardless of corpus size.

Hashing: ``hash_fn="xxhash64"`` (default, one JVM hash per token) or
``"md5"`` — first 8 md5 hex chars as an integer, which DuckDB computes
bit-identically (``('0x' || substr(md5(t),1,8))::UBIGINT``), making the
whole vectorizer oracle-reproducible end to end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .lm import _token_col


def _bucket(tok: Column, dim: int, hash_fn: str) -> Column:
    if hash_fn == "xxhash64":
        return F.pmod(F.xxhash64(tok), F.lit(dim))
    if hash_fn == "md5":
        return F.pmod(
            F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long"),
            F.lit(dim),
        )
    raise ValueError(f"unknown hash_fn {hash_fn!r}")


def hashed_doc_vectors(
    docs: DataFrame,
    dim: int = 64,
    idf: bool = True,
    normalize: bool = True,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "xxhash64",
    n_docs: int | None = None,
) -> DataFrame:
    """``(id, vector array<double>)`` — hashed bag-of-words, optionally
    IDF-weighted (smooth: ``ln((N+1)/(df+1)) + 1``) and L2-normalized
    (so dot products ARE cosines downstream).

    Empty/NULL-text documents surface with the zero vector — nothing
    disappears from the pipeline.
    """
    if dim < 1:
        raise ValueError(f"dim must be positive, got {dim}")
    if not idf:
        return _hashed_vectors_maponly(
            docs, dim, normalize, id_col, text_col, hash_fn
        )
    toks = docs.select(
        F.col(id_col), F.explode(_token_col(text_col)).alias("tok")
    )
    # tf feeds BOTH the document-frequency aggregate and the IDF join's
    # probe side; Catalyst plans are trees, so without a checkpoint the
    # token explode + (id, tok) aggregation runs twice — once per branch
    # (guide §5: cut the diamond at its smallest edge). The checkpoint
    # holds one row per distinct (id, token): far smaller than the raw
    # token stream, and the per-row values are unchanged, so results are
    # bit-identical.
    tf = (
        toks.groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    joined = tf.join(dfreq, "tok")
    if n_docs is not None:
        # callers that already hold count(distinct id) (e.g. hybrid
        # search's fused stats pass) pass it in as a literal
        n_col = F.lit(n_docs)
    else:
        # N rides in the lazy plan as a broadcast 1-row aggregate instead
        # of an eager distinct().count() driver round-trip — one fewer
        # Spark job per call, same integer (distinct-then-count keeps a
        # NULL id as one group, exactly like the old .count()),
        # bit-identical weights
        n_row = (
            docs.select(id_col).distinct().agg(F.count(F.lit(1)).alias("_N"))
        )
        joined = joined.crossJoin(F.broadcast(n_row))
        n_col = F.col("_N")
    weighted = joined.select(
        id_col,
        "tok",
        (
            F.col("tf")
            * (F.log((n_col + 1.0) / (F.col("df") + 1.0)) + 1.0)
        ).alias("w"),
    )

    by_bucket = (
        weighted.withColumn("b", _bucket(F.col("tok"), dim, hash_fn))
        .groupBy(id_col, "b")
        .agg(F.sum("w").alias("v"))
    )
    assembled = by_bucket.groupBy(id_col).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("b"), F.col("v")))
        ).alias("_m")
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(
            F.try_element_at(F.col("_m"), i.cast("long")), F.lit(0.0)
        ),
    )
    # bind the assembled array (and its norm) to named columns so neither
    # expression tree is re-derived per element (Catalyst does not CSE
    # across lambda boundaries — same lesson as dedup._bind_once)
    out = assembled.select(F.col(id_col), dense.alias("_raw"))
    if normalize:
        out = out.select(
            id_col,
            "_raw",
            F.sqrt(
                F.aggregate(F.col("_raw"), F.lit(0.0), lambda a, x: a + x * x)
            ).alias("_n"),
        ).select(
            id_col,
            F.when(
                F.col("_n") > 0,
                F.transform(F.col("_raw"), lambda x: x / F.col("_n")),
            )
            .otherwise(F.col("_raw"))
            .alias("vector"),
        )
    else:
        out = out.select(F.col(id_col), F.col("_raw").alias("vector"))
    # zero vector for docs with no tokens (they never reach the explode)
    ids = docs.select(id_col).distinct()
    zero = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)), lambda _: F.lit(0.0)
    )
    return ids.join(out, id_col, "left").select(
        id_col, F.coalesce(F.col("vector"), zero).alias("vector")
    )


def _hashed_vectors_maponly(
    docs: DataFrame,
    dim: int,
    normalize: bool,
    id_col: str,
    text_col: str,
    hash_fn: str,
) -> DataFrame:
    """The ``idf=False`` fast path: bucket counts fold per row with a
    higher-order aggregate (zero shuffles, zero joins — the old shape
    shuffled (id, token) rows through three exchanges plus a zero-vector
    join-back), then ONE id-keyed combine of dim-wide count arrays merges
    multi-row ids and restores the one-row-per-distinct-id contract. All
    entries are integer token counts summed as doubles — exact under any
    order, so the output is bit-identical to the exchange-based plan
    (guide §2.3/§2.4: shuffle dim doubles per doc instead of every
    token)."""
    zeros = F.array_repeat(F.lit(0.0), dim)
    bkts = F.transform(_token_col(text_col), lambda t: _bucket(t, dim, hash_fn))
    raw = F.aggregate(
        bkts,
        zeros,
        lambda acc, b: F.transform(
            acc,
            lambda x, i: x
            + F.when(i.cast("long") == b, F.lit(1.0)).otherwise(F.lit(0.0)),
        ),
    )
    per_row = docs.select(F.col(id_col), raw.alias("_r"))
    total = F.aggregate(
        F.col("_rs"),
        zeros,
        lambda acc, r: F.zip_with(acc, r, lambda a, b: a + b),
    )
    combined = (
        per_row.groupBy(id_col)
        .agg(F.collect_list("_r").alias("_rs"))
        .select(
            F.col(id_col),
            # a NULL id never matched the old zero-vector join-back, so
            # NULL-id docs surface with the zero vector there — keep that
            F.when(F.col(id_col).isNull(), zeros)
            .otherwise(total)
            .alias("_raw"),
        )
    )
    if not normalize:
        return combined.select(F.col(id_col), F.col("_raw").alias("vector"))
    return combined.select(
        id_col,
        "_raw",
        F.sqrt(
            F.aggregate(F.col("_raw"), F.lit(0.0), lambda a, x: a + x * x)
        ).alias("_n"),
    ).select(
        id_col,
        F.when(
            F.col("_n") > 0,
            F.transform(F.col("_raw"), lambda x: x / F.col("_n")),
        )
        .otherwise(F.col("_raw"))
        .alias("vector"),
    )

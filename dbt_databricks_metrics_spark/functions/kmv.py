"""K-minimum-values distinct sketches and set-operation estimates.

KMV (Bar-Yossef et al. 2002; Beyer et al. 2007 "On synopses for
distinct-value estimation", both public): keep the k smallest hash
values of a set; the k-th smallest h_(k) estimates the distinct count as
``(k-1)·M / h_(k)`` (M = hash-space size). Unlike HLL, KMV sketches
support INTERSECTION estimates (Jaccard over the merged sketch), which
is what audience-overlap questions need — "how many customers are in
BOTH segments" cannot be answered from two HLLs without the union trick
losing precision.

Engine-portability: the hash is the first 15 hex digits of md5 (a
60-bit value) — bit-identical in Spark (`conv(substring(md5(x),1,15),
16,10)`) and DuckDB (`CAST('0x'||substr(md5(x),1,15) AS BIGINT)`), so
sketches, estimates, and the driver's value hash all reproduce exactly.

Scale shape: one distinct-projection shuffle of (group, 8-byte hash),
then a per-group top-k window (k rows survive per group) — the sketch
table is |groups|·k rows no matter the corpus. Merges (union /
intersection) operate on k-row sketches only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HASH_SPACE = 1 << 60  # 15 hex digits


def h60(col: Column) -> Column:
    """Portable 60-bit hash (md5 prefix), identical in Spark and DuckDB."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "bigint"
    )


def kmv_sketch(
    df: DataFrame, key_col: str, group_cols: list[str], k: int = 64
) -> DataFrame:
    """Per group: the k smallest distinct 60-bit hashes of ``key_col``.

    Returns (group_cols..., kmv array<bigint> ascending, kmv_n = how many
    survived — < k means the group's distinct count is EXACTLY kmv_n).
    """
    dist = df.select(
        *[F.col(c) for c in group_cols], h60(F.col(key_col)).alias("_h")
    ).distinct()
    w = Window.partitionBy(*group_cols).orderBy("_h")
    kept = dist.withColumn("_rk", F.row_number().over(w)).filter(
        F.col("_rk") <= k
    )
    return kept.groupBy(*group_cols).agg(
        F.array_sort(F.collect_list("_h")).alias("kmv"),
        F.max("_rk").cast("long").alias("kmv_n"),
    )


def kmv_estimate(kmv: Column, kmv_n: Column, k: int) -> Column:
    """Distinct-count estimate: exact below k, (k-1)·M/h_(k) at k."""
    hk = F.element_at(kmv, -1).cast("double")
    return F.when(kmv_n < k, kmv_n.cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(float(HASH_SPACE)) / hk
    )


def kmv_merge(a: Column, b: Column, k: int) -> Column:
    """Union sketch: k smallest of the merged distinct hash sets."""
    return F.slice(F.array_sort(F.array_distinct(F.concat(a, b))), 1, k)

"""KMV distinct sketches (functions/kmv.py): portability of the 60-bit
hash, exactness below k, estimator accuracy, and merge semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_databricks_metrics_spark.functions import kmv


def test_h60_matches_duckdb(spark, duck):
    vals = ["hello", "42", "spark"]
    got = {
        r["v"]: r["h"]
        for r in spark.createDataFrame([(v,) for v in vals], "v STRING")
        .select("v", kmv.h60(F.col("v")).alias("h"))
        .collect()
    }
    for v in vals:
        (dh,) = duck.execute(
            f"SELECT CAST(('0x' || substr(md5('{v}'), 1, 15)) AS BIGINT)"
        ).fetchone()
        assert got[v] == dh, v


def test_exact_below_k(spark):
    df = spark.createDataFrame([(i, i % 3) for i in range(30)], "id INT, g INT")
    sk = kmv.kmv_sketch(df, "id", ["g"], k=64)
    rows = sk.withColumn(
        "est", kmv.kmv_estimate(F.col("kmv"), F.col("kmv_n"), 64)
    ).collect()
    for r in rows:
        assert r["kmv_n"] == 10 and r["est"] == 10.0
        assert r["kmv"] == sorted(r["kmv"])


def test_estimator_accuracy_at_k(spark):
    n = 5000
    df = spark.createDataFrame([(i, 0) for i in range(n)], "id INT, g INT")
    sk = kmv.kmv_sketch(df, "id", ["g"], k=128)
    (row,) = sk.withColumn(
        "est", kmv.kmv_estimate(F.col("kmv"), F.col("kmv_n"), 128)
    ).collect()
    assert row["kmv_n"] == 128
    # KMV standard error ~ 1/sqrt(k-2) ≈ 9%; allow 3 sigma
    assert abs(row["est"] - n) / n < 0.27


def test_merge_estimates_union(spark):
    a = spark.createDataFrame([(i, 0) for i in range(3000)], "id INT, g INT")
    b = spark.createDataFrame(
        [(i, 0) for i in range(1500, 4500)], "id INT, g INT"
    )
    k = 128
    ska = kmv.kmv_sketch(a, "id", ["g"], k=k).select(
        F.col("kmv").alias("ka"), F.col("kmv_n").alias("na")
    )
    skb = kmv.kmv_sketch(b, "id", ["g"], k=k).select(
        F.col("kmv").alias("kb"), F.col("kmv_n").alias("nb")
    )
    merged = ska.crossJoin(skb).select(
        kmv.kmv_merge(F.col("ka"), F.col("kb"), k).alias("ku")
    )
    (row,) = merged.select(
        kmv.kmv_estimate(F.col("ku"), F.size("ku").cast("long"), k).alias("est")
    ).collect()
    assert abs(row["est"] - 4500) / 4500 < 0.27

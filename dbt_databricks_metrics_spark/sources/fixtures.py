"""Source connectors for the test fixture tables.

The reference reads Unity Catalog tables (``samples.tpch.orders``,
``models/staging/stg_orders.sql:20``); our sources are parquet directories
(TESTDATA.md): one file per table under ``/root/testdata/sf*/``. Reads go
through ``spark.read.parquet`` so Catalyst gets predicate pushdown, column
pruning and (for partitioned layouts) partition pruning for free — check
``PushedFilters`` / ``ReadSchema`` in ``df.explain("formatted")``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def perturb_layout(df: DataFrame) -> DataFrame:
    """Test-only hook: when SPARK_GRAFT_PERTURB_REPARTITION=N is set,
    adversarially repartition every source read so downstream results can
    be checked for partition-layout invariance (check_entry --paranoid —
    the property the driver's hash gate actually tests). No-op otherwise."""
    n = int(os.environ.get("SPARK_GRAFT_PERTURB_REPARTITION", "0") or 0)
    return df.repartition(n) if n > 0 else df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        return perturb_layout(_load_events(spark, path))
    return perturb_layout(spark.read.parquet(path))


def _load_events(spark: SparkSession, path: str) -> DataFrame:
    """events.parquet stores `ts` as parquet TIMESTAMP(NANOS). Depending on
    the Spark build that surfaces as a long (with the legacy nanosAsLong
    conf) or as TIMESTAMP_NTZ; normalize either to a session-tz TIMESTAMP so
    downstream time ops (watermarks, session_window, unix_micros) all see
    the type they require. The session tz is pinned to UTC (session.py), so
    the NTZ cast is micros-preserving."""
    from pyspark.sql import functions as F

    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # conf removed in newer builds that read nanos natively
    df = spark.read.parquet(path)
    dt = dict(df.dtypes).get("ts")
    if dt == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dt == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_tables(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Register each fixture table as a temp view (catalog-scan analogue)."""
    out: dict[str, DataFrame] = {}
    for t in tables:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if not os.path.exists(path):
            continue
        df = load_table(spark, sf_dir, t)
        df.createOrReplaceTempView(t)
        out[t] = df
    return out

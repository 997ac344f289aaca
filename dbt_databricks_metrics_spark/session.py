"""SparkSession factory tuned for the test harness (local[N]) while keeping
the conf surface a 1000-executor cluster would want (AQE, skew handling,
broadcast threshold). On a real cluster only master/memory change."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "dbt_databricks_metrics_spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
    )
    # optional split-size override (bytes). Note: fixture parquet holds a
    # single row group, so shrinking splits does NOT parallelize those
    # scans — explicit repartition after load is the lever there (see
    # bench.py); at 100 TB keep Spark's 128 MiB default or larger.
    mpb = os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES")
    if mpb:
        builder = builder.config("spark.sql.files.maxPartitionBytes", mpb)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark

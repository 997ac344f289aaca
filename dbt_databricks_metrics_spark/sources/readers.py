"""Generic source readers / sinks beyond the fixture parquet.

The reference reads Unity Catalog tables only; a standalone engine needs
the common lake formats. All readers return plain DataFrames so the model
DAG / metric-view layers are storage-agnostic, and all writes support
`partition_by` (partition pruning is the first scale lever — SURVEY §4).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession


_FORMATS = ("parquet", "csv", "json", "orc")


def read_source(
    spark: SparkSession,
    path: str,
    format: str = "parquet",
    schema=None,
    **options: str,
) -> DataFrame:
    """Read *path* in *format*. CSV defaults to header+inferSchema unless a
    schema is given (explicit schema avoids the extra inference pass —
    always pass one in production)."""
    fmt = format.lower()
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported source format {format!r} (one of {_FORMATS})")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        options = {"header": "true", **({} if schema is not None else {"inferSchema": "true"}), **options}
    return reader.options(**options).format(fmt).load(path)


def write_sink(
    df: DataFrame,
    path: str,
    format: str = "parquet",
    mode: str = "overwrite",
    partition_by: Sequence[str] = (),
    **options: str,
) -> None:
    fmt = format.lower()
    if fmt not in _FORMATS:
        raise ValueError(f"unsupported sink format {format!r} (one of {_FORMATS})")
    writer = df.write.mode(mode).options(**options)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.format(fmt).save(path)

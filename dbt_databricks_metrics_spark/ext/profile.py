"""Table profiling ([EXT]) — the `dbt docs` / data-quality companion to
`checks.py`: per-column statistics computed in ONE aggregate pass.

For every profiled column: row count, null count, exact distinct count,
lexical/numeric min and max (stringified so heterogeneous columns share
one output schema), and the mean for numeric columns.

Plan shape at scale: a single `agg()` carrying every statistic — nulls
and min/max are plain partial aggregates; the exact multi-column
distincts expand via Spark's Expand operator (one pass over the data,
one row-group per distinct column), which is the standard exact form.
For quick profiles of very wide tables pass ``approx=True`` to swap the
distincts for HLL `approx_count_distinct` (mergeable sketches — the
warehouse-profiling default); the contract query keeps the exact form so
DuckDB can oracle it. The single aggregate row is then unpivoted
driver-side into (column, …) rows — k rows of metadata, not data.

Timestamps stringify as ``yyyy-MM-dd HH:mm:ss`` to match how both
engines' test harnesses canonicalize datetimes.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)


def _str_of(c: F.Column, dt: T.DataType) -> F.Column:
    if isinstance(dt, T.TimestampType):
        return F.date_format(c, "yyyy-MM-dd HH:mm:ss")
    if isinstance(dt, T.DateType):
        return F.date_format(c, "yyyy-MM-dd")
    return c.cast("string")


def profile_table(
    df: DataFrame,
    columns: Optional[Sequence[str]] = None,
    approx: bool = False,
) -> DataFrame:
    """(column, dtype, n_rows, n_nulls, n_distinct, min_value, max_value,
    mean_value) — one row per profiled column, one data pass total."""
    cols = list(columns) if columns is not None else list(df.columns)
    unknown = [c for c in cols if c not in df.columns]
    if unknown:
        raise ValueError(f"profile_table: unknown columns {unknown}")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, name in enumerate(cols):
        c = F.col(name)
        dt = df.schema[name].dataType
        distinct = (
            F.approx_count_distinct(c) if approx else F.count_distinct(c)
        )
        aggs += [
            F.count_if(c.isNull()).alias(f"_null_{i}"),
            distinct.alias(f"_dist_{i}"),
            _str_of(F.min(c), dt).alias(f"_min_{i}"),
            _str_of(F.max(c), dt).alias(f"_max_{i}"),
            (
                # cast: avg over DecimalType collects a Decimal, which the
                # double output schema would reject
                F.round(F.avg(c), 4).cast("double")
                if isinstance(dt, _NUMERIC)
                else F.lit(None).cast("double")
            ).alias(f"_mean_{i}"),
        ]
    row = df.agg(*aggs).first()
    out = [
        (
            name,
            df.schema[name].dataType.simpleString(),
            int(row["_n"]),
            int(row[f"_null_{i}"]),
            int(row[f"_dist_{i}"]),
            row[f"_min_{i}"],
            row[f"_max_{i}"],
            row[f"_mean_{i}"],
        )
        for i, name in enumerate(cols)
    ]
    return df.sparkSession.createDataFrame(
        out,
        "column string, dtype string, n_rows long, n_nulls long, "
        "n_distinct long, min_value string, max_value string, mean_value double",
    )

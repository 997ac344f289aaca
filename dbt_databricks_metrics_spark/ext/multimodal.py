"""Multimodal (image/audio/video) column plumbing ([EXT]).

Media travel as opaque `binary` columns + typed metadata structs; all
per-item compute (decode, resize, feature-extract, frame-sample) runs as
Arrow-batched Pandas functions over `mapInPandas` — the right shape for
100 TB: bytes never pass through Python row-at-a-time, batches stream
through Arrow, and partitioning is by file/row-group.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so
the decode kernels are STUBBED: `decode_stub=True` (default) derives
deterministic fake features from the bytes so the Spark-side plumbing —
schema, batch iteration, partition behavior — is fully real and tested;
`decode_stub=False` raises NotImplementedError where the codec call
belongs.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("content_hash", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)

_FEATURE_DIM = 8


def _fake_feature(content: bytes) -> list[float]:
    """Deterministic stand-in for a decoded-media feature vector."""
    if content is None:
        return [0.0] * _FEATURE_DIM
    h = 1469598103934665603  # FNV-1a 64
    out = []
    for i in range(_FEATURE_DIM):
        for b in content[i::_FEATURE_DIM] or b"\x00":
            h = ((h ^ b) * 1099511628211) % (1 << 64)
        out.append(((h >> 11) % 10_000) / 10_000.0)
    return out


def extract_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """binary media → fixed-width feature vectors via mapInPandas.

    Real pipeline: replace `_fake_feature` with the codec + model call —
    the batching, schema, and partitioning do not change.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not decode_stub:
                raise NotImplementedError(
                    "media codecs (PIL/ffmpeg) are not available in this "
                    "environment — decode kernel is stubbed"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["content"].map(
                        lambda b: 0 if b is None else len(b)
                    ),
                    "content_hash": pdf["content"].map(
                        # blake2b, not hash(): Python's bytes hash is salted
                        # per process (PYTHONHASHSEED), which would make the
                        # column differ across executors and runs
                        lambda b: 0
                        if b is None
                        else int.from_bytes(
                            hashlib.blake2b(bytes(b), digest_size=8).digest(), "big"
                        )
                        % (1 << 62)
                    ),
                    "feature": pdf["content"].map(_fake_feature),
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def resize_images(
    media: DataFrame, width: int, height: int, decode_stub: bool = True
) -> DataFrame:
    """image binary → resized binary (stub passes bytes through and
    rewrites the metadata — the real kernel decodes/resizes/encodes)."""

    out_schema = MEDIA_SCHEMA

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not decode_stub:
                raise NotImplementedError("image codec not available — stubbed")
            meta = pdf["meta"].map(
                lambda m: {
                    "mime": (m or {}).get("mime"),
                    "width": width,
                    "height": height,
                    "duration_ms": (m or {}).get("duration_ms"),
                }
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "content": pdf["content"],
                    "meta": meta,
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(
        batches, schema=out_schema
    )


def sample_video_frames(
    media: DataFrame, every_ms: int = 1000, decode_stub: bool = True
) -> DataFrame:
    """video binary → one row per sampled frame timestamp (stub emits the
    frame schedule from duration_ms without decoding)."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_ts_ms", T.LongType(), False),
            T.StructField("frame", T.BinaryType(), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not decode_stub:
                raise NotImplementedError("video codec not available — stubbed")
            rows = []
            for _, r in pdf.iterrows():
                dur = (r["meta"] or {}).get("duration_ms") or 0
                for ts in range(0, int(dur), every_ms):
                    rows.append((r["media_id"], ts, None))
            yield pd.DataFrame(rows, columns=["media_id", "frame_ts_ms", "frame"])

    return media.filter(F.col("kind") == "video").mapInPandas(batches, schema=schema)


def media_from_documents(documents: DataFrame) -> DataFrame:
    """Deterministic media fixture derived from the `documents` table:
    text bytes act as the opaque payload (the fixtures ship no real
    media), with metadata synthesized from doc properties."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            (F.col("n_chars") % 1920).cast("int").alias("width"),
            (F.col("n_chars") % 1080).cast("int").alias("height"),
            (F.col("n_chars") * 10).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )

"""Multimodal plumbing tests ([EXT]): binary columns + mapInPandas kernels
with stubbed codecs (FIXTURES ship no real media — derive opaque payloads
from the documents table)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbt_databricks_metrics_spark.ext import multimodal
from dbt_databricks_metrics_spark.sources import load_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return multimodal.media_from_documents(docs).cache()


def test_media_schema(media):
    # names + types must match the contract; nullability is projection-
    # dependent in Spark and not part of it
    got = [(f.name, f.dataType.simpleString()) for f in media.schema.fields]
    want = [(f.name, f.dataType.simpleString()) for f in multimodal.MEDIA_SCHEMA.fields]
    assert got == want
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_extract_features_shapes(media):
    feats = multimodal.extract_features(media)
    rows = feats.collect()
    assert len(rows) == media.count()
    for r in rows[:20]:
        assert len(r["feature"]) == 8
        assert all(0.0 <= x <= 1.0 for x in r["feature"])
        assert r["n_bytes"] > 0


def test_extract_features_deterministic(media):
    a = {r["media_id"]: r["feature"] for r in multimodal.extract_features(media).collect()}
    b = {r["media_id"]: r["feature"] for r in multimodal.extract_features(media).collect()}
    assert a == b


def test_features_partition_invariant(media):
    """Arrow batch boundaries must not change per-item results."""
    one = {
        r["media_id"]: r["feature"]
        for r in multimodal.extract_features(media.repartition(1)).collect()
    }
    many = {
        r["media_id"]: r["feature"]
        for r in multimodal.extract_features(media.repartition(13)).collect()
    }
    assert one == many


def test_resize_images_only_images(media):
    out = multimodal.resize_images(media, 256, 256)
    rows = out.collect()
    n_images = media.filter(F.col("kind") == "image").count()
    assert len(rows) == n_images
    assert all(r["meta"]["width"] == 256 and r["meta"]["height"] == 256 for r in rows)


def test_sample_video_frames_schedule(media):
    frames = multimodal.sample_video_frames(media, every_ms=1000)
    joined = (
        frames.groupBy("media_id")
        .count()
        .join(media.filter(F.col("kind") == "video"), "media_id")
        .select("media_id", "count", F.col("meta.duration_ms").alias("dur"))
        .collect()
    )
    for r in joined:
        import math

        assert r["count"] == math.ceil(r["dur"] / 1000), r


def test_unstubbed_decode_raises(media):
    import pytest as _pytest

    with _pytest.raises(Exception, match="NotImplementedError|stubbed|codec"):
        multimodal.extract_features(media, decode_stub=False).collect()

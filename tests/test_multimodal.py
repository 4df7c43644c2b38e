"""Multimodal operator tests: the input_hint per-row invariants (decoded-pixel
allclose + caption equality) over the encode->decode Spark pipeline, resize
and embedding plumbing, stub gating."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from stac_catalog_builder_spark import synth
from stac_catalog_builder_spark.functions.codecs import decode_raw
from stac_catalog_builder_spark.operators import multimodal
from stac_catalog_builder_spark.operators.footprints import with_footprint

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def images_small(spark):
    return with_footprint(synth.images(spark, SF)).limit(60)


@pytest.fixture(scope="module")
def encoded(images_small):
    df = multimodal.with_encoded_bytes(images_small)
    df.cache().count()
    return df


def test_encoded_bytes_schema(encoded):
    row = encoded.select("bytes", "fmt").first()
    assert isinstance(row.bytes, (bytes, bytearray))
    assert row.fmt in ("raw", "png")


def test_pixel_and_caption_invariants(encoded):
    """The driver gate (BASELINE.json input_hint): decoded pixels match the
    reference raster exactly for lossless formats; captions match exactly."""
    stats = multimodal.decode_stats(encoded).collect()
    assert len(stats) == 60
    assert all(r.pixel_ok for r in stats)
    assert all(r.caption_ok for r in stats)
    # decoded dims come from the payload, not the metadata columns
    by_id = {r.image_id: r for r in stats}
    for r in encoded.select("image_id", "w", "h").collect():
        assert (by_id[r.image_id].px_w, by_id[r.image_id].px_h) == (r.w, r.h)


def test_decode_stats_detects_corruption(spark, encoded):
    """Flip the payload -> pixel_ok must go false (the invariant is real)."""
    corrupted = encoded.withColumn(
        "bytes",
        F.when(F.col("fmt") == "raw", F.concat(F.col("bytes"), F.lit(b"x"))).otherwise(
            F.col("bytes")
        ),
    ).withColumn("phash", F.col("phash") + 1)  # wrong reference raster
    stats = multimodal.decode_stats(corrupted).collect()
    assert not any(r.pixel_ok for r in stats)


def test_resize_images(encoded):
    out = multimodal.resize_images(encoded, 32, 32).collect()
    assert len(out) == 60
    arr = decode_raw(out[0].bytes)
    assert arr.shape == (32, 32)


def test_image_embedding_normalized(encoded):
    rows = multimodal.image_embedding(encoded, dim=16).collect()
    assert len(rows) == 60
    v = np.array(rows[0].embedding)
    assert v.shape == (16,)
    assert abs(np.linalg.norm(v) - 1.0) < 1e-5


def test_stubs_raise_not_implemented(encoded):
    with pytest.raises(NotImplementedError):
        multimodal.audio_features(encoded)
    with pytest.raises(NotImplementedError):
        multimodal.video_frame_sample(encoded)

"""Multimodal column operators: encode/decode/feature-extract/resize over
opaque ``binary`` image columns, plus stubbed audio/video hooks.

The Spark-side plumbing is real and tested (schemas, Arrow batch shapes,
mapInPandas iterators); only codecs that would need external libraries
(JPEG/MP3/H.264) are stubbed behind NotImplementedError — the engine's own
raw/png/dct codecs (functions/codecs.py) run for real.

Scale notes: ``bytes`` stays out of every plan that doesn't need pixels
(column pruning — the reference hand-rolled the same idea with "lightweight
dict rows", terracatalog.py:623-626). Decode paths use ``mapInPandas`` so one
task never holds more than one Arrow batch of images; with
``spark.sql.execution.arrow.maxRecordsPerBatch`` this bounds executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.codecs import (
    decode_image,
    encode_image,
    make_raster,
    psnr,
    resize_nearest,
)


def with_encoded_bytes(df: DataFrame) -> DataFrame:
    """Materialize the ``bytes`` column of the input_hint schema: encode the
    deterministic phash-seeded raster in the row's ``fmt``. This is the
    synthetic stand-in for reading real image payloads from the lake."""

    @F.pandas_udf(T.BinaryType())
    def enc(phash: pd.Series, w: pd.Series, h: pd.Series, fmt: pd.Series) -> pd.Series:
        out = [
            encode_image(make_raster(int(p), int(ww), int(hh)), f)
            for p, ww, hh, f in zip(phash, w, h, fmt)
        ]
        return pd.Series(out)

    return df.withColumn("bytes", enc("phash", "w", "h", "fmt"))


_STATS_SCHEMA = (
    "image_id string, fmt string, mean_x1000 bigint, std_x1000 bigint, "
    "px_w int, px_h int, pixel_ok boolean, caption_ok boolean"
)


def decode_stats(df: DataFrame) -> DataFrame:
    """Decode every image and emit pixel stats + the per-row invariants the
    driver gate demands (BASELINE.json input_hint): decoded pixels allclose
    to the reference raster (exact for raw/png, PSNR>=40dB for dct) and
    exact caption equality vs the deterministic template."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = decode_image(r.bytes, r.fmt)
                ref = make_raster(int(r.phash), int(r.w), int(r.h))
                if r.fmt in ("raw", "png"):
                    ok = bool(np.array_equal(arr, ref))
                else:
                    ok = psnr(arr, ref) >= 40.0
                rows.append(
                    {
                        "image_id": r.image_id,
                        "fmt": r.fmt,
                        "mean_x1000": int(np.floor(arr.mean() * 1000.0 + 0.5)),
                        "std_x1000": int(np.floor(arr.std() * 1000.0 + 0.5)),
                        "px_w": arr.shape[1],
                        "px_h": arr.shape[0],
                        "pixel_ok": ok,
                        "caption_ok": bool(r.caption == r.caption_expected),
                    }
                )
            yield pd.DataFrame(rows)

    with_expected = df.withColumn(
        "caption_expected",
        F.format_string(
            "%s observation %04d-%02d over item %d",
            F.col("asset_type"),
            F.col("year"),
            F.col("month"),
            F.expr("img_key div 2"),
        ),
    )
    cols = [
        "image_id", "bytes", "fmt", "phash", "w", "h", "caption", "caption_expected",
    ]
    return with_expected.select(*cols).mapInPandas(gen, schema=_STATS_SCHEMA)


def resize_images(df: DataFrame, out_w: int = 64, out_h: int = 64) -> DataFrame:
    """Decode -> nearest-neighbor resize -> re-encode (raw). Emits the resized
    payload + its stats; the shape every thumbnailing pipeline has."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = resize_nearest(decode_image(r.bytes, r.fmt), out_h, out_w)
                rows.append(
                    {
                        "image_id": r.image_id,
                        "bytes": encode_image(arr, "raw"),
                        "mean_x1000": int(np.floor(arr.mean() * 1000.0 + 0.5)),
                    }
                )
            yield pd.DataFrame(rows)

    return df.select("image_id", "bytes", "fmt").mapInPandas(
        gen, schema="image_id string, bytes binary, mean_x1000 bigint"
    )


def image_embedding(df: DataFrame, dim: int = 16) -> DataFrame:
    """Cheap content embedding: block-mean grid flattened + L2-normalized —
    the feature-extraction slot (a real model would replace the kernel; the
    Spark plumbing — Arrow batches in, array<float> out — is identical)."""
    side = int(np.sqrt(dim))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                arr = resize_nearest(decode_image(r.bytes, r.fmt), side, side)
                v = arr.astype(np.float64).ravel()
                n = np.linalg.norm(v)
                rows.append(
                    {
                        "image_id": r.image_id,
                        "embedding": (v / n if n > 0 else v).astype(np.float32).tolist(),
                    }
                )
            yield pd.DataFrame(rows)

    return df.select("image_id", "bytes", "fmt").mapInPandas(
        gen, schema="image_id string, embedding array<float>"
    )


# --- stubbed modalities (no codec libraries in this environment) -----------

def audio_features(df: DataFrame) -> DataFrame:  # pragma: no cover - stub
    """Audio feature extraction stub: the UDF signature/batching is the real
    contract; the codec needs an external library."""
    raise NotImplementedError(
        "audio decode requires an external codec library (not in this image); "
        "plumbing contract: binary column -> mapInPandas -> array<float> features"
    )


def video_frame_sample(df: DataFrame, every_n: int = 30) -> DataFrame:  # pragma: no cover - stub
    """Video frame sampling stub (same contract: binary -> exploded frames)."""
    raise NotImplementedError(
        "video decode requires an external codec library (not in this image); "
        "plumbing contract: binary column -> mapInPandas -> one row per frame"
    )

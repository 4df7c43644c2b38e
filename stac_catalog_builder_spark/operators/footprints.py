"""Footprint derivation — the Spark analogue of ``AssetMetadata._ensure_geoms``.

The reference derives the closure over {bbox_projected, bbox_lat_lon,
geometry_proj, geometry_lat_lon, proj_epsg} per row in a Pydantic hook
(reference stacbuilder/metadata.py:199-236). Here the same "whichever spatial
field you have, derive the rest" step is a deterministic *column stage*:
pure JVM-side expressions (no Python in the hot path), fully codegen'd.

Placement is seeded by the scramble columns (h1, h2) per FIXTURES.md §1 so
Spark, DuckDB and numpy all reproduce identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..synth import (
    HOT_JITTER_SCALE,
    HOT_JITTER_STEPS,
    HOT_LAT0,
    HOT_LON0,
    HOT_LT,
    HOT_MOD,
    LAT_STEPS,
    LON_STEPS,
    PIXEL_RES_DEG,
    STEP_SCALE,
)


def with_footprint(df: DataFrame) -> DataFrame:
    """Add centroid (lon, lat), per-image bbox and the hot-cluster flag.

    bbox = centroid ± (w,h) * PIXEL_RES_DEG / 2 — the raster footprint, like
    the reference's bounds-from-transform (stacbuilder/mapper.py:138-144).
    """
    hot = (F.col("img_key") % HOT_MOD) < HOT_LT
    lon = F.when(
        hot, F.lit(HOT_LON0) + (F.col("h1") % HOT_JITTER_STEPS) / F.lit(HOT_JITTER_SCALE)
    ).otherwise(F.lit(-180.0) + (F.col("h1") % LON_STEPS) / F.lit(STEP_SCALE))
    lat = F.when(
        hot, F.lit(HOT_LAT0) + (F.col("h2") % HOT_JITTER_STEPS) / F.lit(HOT_JITTER_SCALE)
    ).otherwise(F.lit(-60.0) + (F.col("h2") % LAT_STEPS) / F.lit(STEP_SCALE))
    half_w = F.col("w") * F.lit(PIXEL_RES_DEG / 2.0)
    half_h = F.col("h") * F.lit(PIXEL_RES_DEG / 2.0)
    return (
        df.withColumn("is_hot", hot)
        .withColumn("lon", lon)
        .withColumn("lat", lat)
        .withColumn("fp_w", F.col("lon") - half_w)
        .withColumn("fp_e", F.col("lon") + half_w)
        .withColumn("fp_s", F.col("lat") - half_h)
        .withColumn("fp_n", F.col("lat") + half_h)
    )

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

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.geo import reproject_bbox_to_lonlat_np
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


_LONLAT_BBOX_T = T.StructType(
    [
        T.StructField("fp_w", T.DoubleType()),
        T.StructField("fp_s", T.DoubleType()),
        T.StructField("fp_e", T.DoubleType()),
        T.StructField("fp_n", T.DoubleType()),
    ]
)


def with_lonlat_bbox_from_projected(
    df: DataFrame,
    x_min: str = "bbox_x_min",
    y_min: str = "bbox_y_min",
    x_max: str = "bbox_x_max",
    y_max: str = "bbox_y_max",
    epsg_col: str = "proj_epsg",
) -> DataFrame:
    """Complete the ``_ensure_geoms`` closure for PROJECTED inputs: derive
    the lat/lon bbox (fp_w/fp_s/fp_e/fp_n) from a projected bbox + EPSG —
    the direction the reference gets from pyproj (metadata.py:199-236
    derives bbox_lat_lon FROM proj_bbox via projections.py:61-67;
    terracatalog.py:700-770 feeds projected coordinates in).

    Vectorized Arrow UDF: each batch groups rows by EPSG (a batch is almost
    always single-zone — real ingests partition by tile/zone) and runs the
    numpy inverse kernel per group; no per-row Python. Supports UTM
    326xx/327xx and plate-carree 32662, like the forward kernels."""

    @F.pandas_udf(_LONLAT_BBOX_T)
    def inv(
        xmin: pd.Series, ymin: pd.Series, xmax: pd.Series, ymax: pd.Series,
        epsg: pd.Series,
    ) -> pd.DataFrame:
        out = pd.DataFrame(
            index=xmin.index, columns=["fp_w", "fp_s", "fp_e", "fp_n"], dtype=float
        )
        for code, idx in epsg.groupby(epsg).groups.items():
            w, s, e, n = reproject_bbox_to_lonlat_np(
                xmin[idx].to_numpy(), ymin[idx].to_numpy(),
                xmax[idx].to_numpy(), ymax[idx].to_numpy(), int(code),
            )
            out.loc[idx, "fp_w"] = w
            out.loc[idx, "fp_s"] = s
            out.loc[idx, "fp_e"] = e
            out.loc[idx, "fp_n"] = n
        return out

    bb = inv(F.col(x_min), F.col(y_min), F.col(x_max), F.col(y_max), F.col(epsg_col))
    return (
        df.withColumn("_bb", bb)
        .withColumn("fp_w", F.col("_bb.fp_w"))
        .withColumn("fp_s", F.col("_bb.fp_s"))
        .withColumn("fp_e", F.col("_bb.fp_e"))
        .withColumn("fp_n", F.col("_bb.fp_n"))
        .withColumn("lon", (F.col("fp_w") + F.col("fp_e")) / 2.0)
        .withColumn("lat", (F.col("fp_s") + F.col("fp_n")) / 2.0)
        .drop("_bb")
    )

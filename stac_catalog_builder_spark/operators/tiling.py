"""Raster -> vector tile-grid assignment (north rule: "assign raster assets to
vector tile grids").

Slippy-map (Web Mercator / XYZ) tile math as pure JVM column expressions —
``floor`` over ``ln``/``tan`` — so the whole stage is codegen'd and the DuckDB
oracle can reproduce it exactly. The reference's closest analogue is the
y/m/d item path layout (stacbuilder/builder.py:512-519) and the
"E09N27" tile-id parsing (stacbuilder/terracatalog.py:773-791); here tiles are
first-class join keys.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MAX_MERCATOR_LAT = 85.05112878


def tile_x_col(lon: Column, zoom: int) -> Column:
    n = 2**zoom
    return F.least(
        F.greatest(F.floor((lon + 180.0) / 360.0 * n), F.lit(0)), F.lit(n - 1)
    ).cast("bigint")


def tile_y_col(lat: Column, zoom: int) -> Column:
    n = 2**zoom
    clamped = F.least(F.greatest(lat, F.lit(-MAX_MERCATOR_LAT)), F.lit(MAX_MERCATOR_LAT))
    rad = F.radians(clamped)
    merc = F.log(F.tan(rad) + F.lit(1.0) / F.cos(rad))
    return F.least(
        F.greatest(F.floor((1.0 - merc / F.lit(math.pi)) / 2.0 * n), F.lit(0)),
        F.lit(n - 1),
    ).cast("bigint")


def with_tile(df: DataFrame, zoom: int, lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """Add tile_x/tile_y/zoom for the centroid — one codegen'd projection."""
    return (
        df.withColumn("tile_x", tile_x_col(F.col(lon_col), zoom))
        .withColumn("tile_y", tile_y_col(F.col(lat_col), zoom))
        .withColumn("zoom", F.lit(zoom))
    )


def tile_cover(df: DataFrame, zoom: int) -> DataFrame:
    """All tiles a *footprint rectangle* (fp_w/s/e/n) overlaps: generates the
    (image, tile) assignment rows via a bounded sequence-explode — stays
    JVM-side (``sequence`` + ``explode``), no UDF, linear output size."""
    x0, x1 = tile_x_col(F.col("fp_w"), zoom), tile_x_col(F.col("fp_e"), zoom)
    # tile_y grows southward: north edge gives the smaller y
    y0, y1 = tile_y_col(F.col("fp_n"), zoom), tile_y_col(F.col("fp_s"), zoom)
    return (
        df.withColumn("tile_x", F.explode(F.sequence(x0, x1)))
        .withColumn("tile_y", F.explode(F.sequence(y0, y1)))
        .withColumn("zoom", F.lit(zoom))
    )

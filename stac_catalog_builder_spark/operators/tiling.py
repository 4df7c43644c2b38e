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


def quadkey_col(x: Column, y: Column, zoom: int) -> Column:
    """Bing-style quadkey string of tile (x, y) at ``zoom``: one base-4 digit
    per level, MSB first (digit = x_bit + 2*y_bit). Pure codegen — an
    unrolled concat of ``zoom`` integer digit expressions, no UDF.

    The property that matters at scale: the quadkey of a tile's ancestor at
    zoom z' < z is EXACTLY the first z' characters, so pyramid rollups and
    coarse-to-fine containment joins become string-prefix operations on an
    already-aggregated tile table instead of repeated fact-table shuffles,
    and a quadkey-sorted layout range-scans any subtree."""
    digits = [
        (
            F.shiftright(x, i).bitwiseAND(F.lit(1))
            + F.shiftright(y, i).bitwiseAND(F.lit(1)) * F.lit(2)
        ).cast("string")
        for i in range(zoom - 1, -1, -1)
    ]
    return F.concat(*digits)


def tile_pyramid(
    df: DataFrame, base_zoom: int, levels: list[int], lon_col: str = "lon", lat_col: str = "lat"
) -> DataFrame:
    """Multi-resolution tile density pyramid: (zoom, quadkey, n_images) for
    ``base_zoom`` and every coarser zoom in ``levels``.

    The fact table shuffles ONCE — the count aggregate at ``base_zoom``
    (bounded by the tile count, with map-side partial combine). Every
    coarser level folds from that dimension-sized aggregate by quadkey
    prefix truncation + sum, so adding pyramid levels costs tile-table
    aggregates only, never another pass over the data. (The reference has
    no pyramid; its closest shape is the per-year rollup of collection
    extents, builder.py:575-612.)
    """
    if any(lv >= base_zoom or lv < 1 for lv in levels):
        raise ValueError(f"levels must be in [1, {base_zoom - 1}]: {levels}")
    base = (
        with_tile(df, base_zoom, lon_col, lat_col)
        .select(quadkey_col(F.col("tile_x"), F.col("tile_y"), base_zoom).alias("quadkey"))
        .groupBy("quadkey")
        .agg(F.count("*").alias("n_images"))
        .select(F.lit(base_zoom).alias("zoom"), "quadkey", "n_images")
        # every pyramid level reads this dimension-sized aggregate; without
        # the (lazy) checkpoint each union branch re-plans the whole fact
        # scan + shuffle (measured: 3 scans, 5 exchanges at 2 levels —
        # exchange reuse does not fire across union branches under AQE)
        .localCheckpoint(eager=False)
    )
    out = base
    for lv in sorted(set(levels), reverse=True):
        coarser = (
            base.select(
                F.substring("quadkey", 1, lv).alias("quadkey"), "n_images"
            )
            .groupBy("quadkey")
            .agg(F.sum("n_images").alias("n_images"))
            .select(F.lit(lv).alias("zoom"), "quadkey", "n_images")
        )
        out = out.unionByName(coarser)
    return out


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

"""Focal (neighborhood) map algebra over the cell grid: density surfaces.

The raster<->vector half of the north rule so far covers encode (cells,
tiles, quadkeys, geohash), cover (tile_cover, compact_cover) and zonal
statistics (zonal_stats); this adds the FOCAL class — each cell aggregates
its (2r+1) x (2r+1) neighborhood — which is how a point catalogue becomes a
smoothed density raster (acquisition-density heatmaps, hot-spot detection,
cloud-of-points -> coverage surface).

Scale design: the fact table is reduced to per-cell counts FIRST (one
data-sized shuffle with map-side combine); the focal convolution then runs
entirely on the density table, which is bounded by the cell grid
(dimension-sized), not the input.  Each density row is exploded to the
neighbor cells it contributes to (two tiny ``sequence`` explodes — the
scatter form of the convolution) and summed per target cell.  The cell's
own count rides the SAME aggregate as a conditional sum (dx = dy = 0), so
no self-join is needed.  Longitude wraps around the antimeridian
(``pmod`` on gx); latitude clamps at the poles (out-of-range target rows
are dropped, and the focal mean divides by the exact count of VALID
neighbor positions, a closed-form least/greatest expression).

All arithmetic is int64 (counts, integer cell coordinates, the mean as a
``* 1000 div`` fixed-point) — DuckDB replays the whole chain value-exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.cells import GRID_RES_BITS, GRID_X_BITS, grid_cell_col


def cell_density(
    df: DataFrame, lon_col: str, lat_col: str, res: int
) -> DataFrame:
    """Per-cell point counts at grid resolution ``res``: (gx, gy, cnt).

    The one data-sized aggregate of the focal pipeline — map-side combined,
    so the exchange carries at most one row per (partition, occupied cell).
    """
    cell = grid_cell_col(F.col(lon_col), F.col(lat_col), res)
    return (
        df.select(cell.alias("cell"))
        .select(
            F.expr(f"(cell % {2**GRID_RES_BITS}) div {2**GRID_X_BITS}").alias("gx"),
            F.pmod(F.col("cell"), F.lit(2**GRID_X_BITS)).alias("gy"),
        )
        .groupBy("gx", "gy")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def focal_smooth(
    density: DataFrame, res: int, radius: int = 1
) -> DataFrame:
    """Neighborhood sum/mean over a (gx, gy, cnt) density table.

    Output, one row per cell that RECEIVES any mass (occupied cells and
    their halo): ``gx, gy, cnt`` (the cell's own count, 0 for halo cells),
    ``focal_cnt`` (sum over the (2r+1)^2 window, wrapping in x, clamped in
    y), ``n_window`` (exact count of valid neighbor positions — smaller at
    the poles), ``focal_mean_e3 = focal_cnt * 1000 div n_window``.
    """
    if radius < 1:
        raise ValueError(f"radius must be >= 1, got {radius}")
    nx, ny = 2 ** (res + 1), 2**res
    r = int(radius)
    scattered = (
        density.select(
            "gx",
            "gy",
            "cnt",
            F.explode(F.sequence(F.lit(-r), F.lit(r))).alias("dx"),
        )
        .select(
            "gx",
            "gy",
            "cnt",
            "dx",
            F.explode(F.sequence(F.lit(-r), F.lit(r))).alias("dy"),
        )
        .select(
            F.pmod(F.col("gx") + F.col("dx"), F.lit(nx)).alias("tx"),
            (F.col("gy") + F.col("dy")).alias("ty"),
            "cnt",
            "dx",
            "dy",
        )
        .where((F.col("ty") >= 0) & (F.col("ty") < ny))
    )
    out = scattered.groupBy("tx", "ty").agg(
        F.sum(
            F.when((F.col("dx") == 0) & (F.col("dy") == 0), F.col("cnt")).otherwise(
                F.lit(0)
            )
        ).alias("cnt"),
        F.sum("cnt").alias("focal_cnt"),
    )
    # valid window positions: x always spans 2r+1 (wrap; nx > 2r+1 assumed),
    # y clips at the poles — least(ty + r, ny - 1) - greatest(ty - r, 0) + 1
    n_window = (F.lit(2 * r + 1)) * (
        F.least(F.col("ty") + F.lit(r), F.lit(ny - 1))
        - F.greatest(F.col("ty") - F.lit(r), F.lit(0))
        + F.lit(1)
    )
    return out.select(
        F.col("tx").alias("gx"),
        F.col("ty").alias("gy"),
        "cnt",
        "focal_cnt",
        n_window.cast("bigint").alias("n_window"),
        F.expr(f"(focal_cnt * 1000) div ({2 * r + 1} * "
               f"(least(ty + {r}, {ny - 1}) - greatest(ty - {r}, 0) + 1))")
        .alias("focal_mean_e3"),
    )

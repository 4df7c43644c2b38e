"""Point/footprint-in-polygon spatial join (north rule J4).

Two-stage, the standard distributed spatial-join shape:

1. **Cover-cell equi-join**: every polygon is covered by grid cells at a
   coarse resolution (driver-side, polygons are a small dimension table); the
   cover table is exploded to (cell, polygon_idx) rows and **broadcast**.
   Images join on their centroid's cell — a broadcast hash join, no shuffle
   of the fact side, prunable by Catalyst.
2. **Exact PIP refinement**: candidates are refined with a vectorized
   numpy ray-cast pandas UDF; the prepared polygon vertex arrays ride to
   executors in a Spark broadcast variable (the analogue of shapely
   "prepared geometry").

Skew: a hot cell (e.g. a dense city) maps to ONE cover row, so the broadcast
join itself cannot skew the fact side (no shuffle). Skew only matters for the
downstream *aggregation*, handled by salting in operators/grouping.py and AQE.

The reference never joins spatially — it groups by exact bbox equality
(stacbuilder/builder.py:780-793) and aggregates extents (builder.py:484-510);
this operator generalizes that to real polygon containment.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.cells import grid_cell_col, grid_cover_bbox
from ..functions.geo import points_in_polygons_np, polygon_bounds

DEFAULT_COVER_RES = 3  # 22.5-degree cells: fine for continent-scale polygons;
# raise for city-scale polygon sets (cover rows stay ~|polygons| * O(cells)).


def spatial_join_pip(
    images: DataFrame,
    polygons: list[dict],
    cover_res: int = DEFAULT_COVER_RES,
    lon_col: str = "lon",
    lat_col: str = "lat",
    keep_cols: tuple[str, ...] = ("tile_id", "collection_id"),
) -> DataFrame:
    """Join image centroids against boundary polygons.

    ``polygons``: list of dicts with ``ring_x``/``ring_y`` (vertex arrays) and
    any identifier fields named in ``keep_cols``. Returns ``images`` columns +
    ``keep_cols`` (inner join: images outside every polygon are dropped,
    mirroring the reference's unknown-asset-type drop, builder.py:191-198).
    """
    spark = images.sparkSession

    # --- driver-side: cover cells for each polygon (dimension-table sized) ---
    cover_rows = []
    prepared: list[tuple[np.ndarray, np.ndarray]] = []
    meta_rows = []
    for idx, poly in enumerate(polygons):
        vx = np.asarray(poly["ring_x"], dtype=np.float64)
        vy = np.asarray(poly["ring_y"], dtype=np.float64)
        prepared.append((vx, vy))
        meta_rows.append({"poly_idx": idx, **{c: poly[c] for c in keep_cols}})
        w, s, e, n = polygon_bounds(vx, vy)
        for cell in grid_cover_bbox(w, s, e, n, cover_res):
            cover_rows.append((int(cell), idx))

    cover_df = spark.createDataFrame(
        cover_rows, schema="cover_cell bigint, poly_idx int"
    )
    meta_df = spark.createDataFrame(pd.DataFrame(meta_rows))

    # broadcast variable: prepared vertex arrays, shared by all tasks
    bc = spark.sparkContext.broadcast(prepared)

    @F.pandas_udf(T.BooleanType())
    def pip(px: pd.Series, py: pd.Series, pidx: pd.Series) -> pd.Series:
        return pd.Series(
            points_in_polygons_np(
                px.to_numpy(), py.to_numpy(), pidx.to_numpy(), bc.value
            )
        )

    candidates = images.withColumn(
        "cover_cell", grid_cell_col(F.col(lon_col), F.col(lat_col), cover_res)
    ).join(F.broadcast(cover_df), "cover_cell")

    refined = candidates.where(
        pip(F.col(lon_col), F.col(lat_col), F.col("poly_idx"))
    )
    return refined.join(F.broadcast(meta_df), "poly_idx").drop(
        "poly_idx", "cover_cell"
    )


def spatial_join_bbox(
    images: DataFrame,
    boxes: DataFrame,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """Rectangle fast path: broadcast range join with half-open semantics
    (w <= lon < e, s <= lat < n) — pure JVM expressions, no UDF.

    ``boxes`` must carry bbox_w/bbox_s/bbox_e/bbox_n. Use when boundaries are
    axis-aligned (tile grids): Catalyst turns this into a broadcast
    nested-loop join with a cheap residual predicate.
    """
    cond = (
        (F.col(lon_col) >= boxes.bbox_w)
        & (F.col(lon_col) < boxes.bbox_e)
        & (F.col(lat_col) >= boxes.bbox_s)
        & (F.col(lat_col) < boxes.bbox_n)
    )
    return images.join(F.broadcast(boxes), cond, "inner").drop(
        "bbox_w", "bbox_s", "bbox_e", "bbox_n"
    )

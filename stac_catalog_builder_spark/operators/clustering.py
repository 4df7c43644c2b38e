"""Grid-density spatial clustering (grid DBSCAN): acquisition-site
extraction from scene centroids.

The reference groups scenes only by their catalogue metadata (item_id /
collection — stacbuilder/builder.py:484-510 rebuilds collections from item
lists); it has no notion of "these 40,000 scenes are the same physical
campaign area". The catalogue question — "which contiguous regions does
this archive actually cover, and how much sits in each?" — is density-based
clustering, which at 10^12 rows cannot be point-level DBSCAN (eps-range
self-join).

Grid DBSCAN is the scalable formulation (cell-level density, eps = one grid
cell, minPts per cell):

1. the fact table reduces to per-cell counts — the ONLY data-sized shuffle,
   map-side combined;
2. cells with >= min_pts points are CORE; everything after this step runs
   on the dimension-sized cell table;
3. core cells adjacent in the 8-neighborhood (antimeridian x-wrap, like
   operators/focal.py) connect into clusters via the same alternating-star
   connected-components machinery the text/phash dedup uses
   (operators/graph.py — one shuffle + one probe job per round);
4. non-core cells holding points but touching a core cell are BORDER cells:
   they adopt the minimum cluster id among their core neighbors
   (deterministic, matching classic DBSCAN's border-point semantics);
   remaining occupied cells are NOISE and are not emitted.

Output is per-cell (cell id, cx, cy, n_points, cluster, is_core), so both
per-cluster rollups (size, extent) and point->cluster assignment (one
equi-join on the cell id) are one step away.

DuckDB replays the whole chain value-exactly (tests/test_parity_rowsonly):
integer cell math, neighbor self-join, recursive-CTE min-label components,
border adoption.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# half of the 8-neighborhood: each undirected adjacency generated once
_HALF_NEIGHBORS = ((1, 0), (1, 1), (0, 1), (-1, 1))
_ALL_NEIGHBORS = tuple(
    (dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1) if (dx, dy) != (0, 0)
)


def _grid_xy(lon: Column, lat: Column, res: int) -> tuple[Column, Column, int, int]:
    """Equirectangular grid coords at ``res``: nx = 2^(res+1), ny = 2^res —
    the same IEEE floor/clamp assignment as the revisit-cadence query, so
    DuckDB reproduces the cell ids bit-for-bit."""
    nx, ny = 2 ** (res + 1), 2**res
    gx = F.least(
        F.greatest(F.floor((lon + F.lit(180.0)) / F.lit(360.0) * nx), F.lit(0)),
        F.lit(nx - 1),
    )
    gy = F.least(
        F.greatest(F.floor((lat + F.lit(90.0)) / F.lit(180.0) * ny), F.lit(0)),
        F.lit(ny - 1),
    )
    return gx, gy, nx, ny


def grid_dbscan(
    df: DataFrame,
    lon_col: str,
    lat_col: str,
    res: int,
    min_pts: int,
    max_iter: int = 25,
) -> DataFrame:
    """Cluster occupied grid cells by density; see module docstring.

    Returns (cell, cx, cy, n_points, cluster, is_core): core cells carry
    their component's minimum cell id as ``cluster``; border cells adopt
    the minimum cluster among their 8 core neighbors; noise cells are
    dropped. ``cell = cy * nx + cx`` (int64). The x-axis wraps at the
    antimeridian; y clamps at the poles (no wrap).
    """
    from .graph import connected_components

    if min_pts < 1:
        raise ValueError(f"min_pts must be >= 1, got {min_pts}")
    gx, gy, nx, ny = _grid_xy(F.col(lon_col), F.col(lat_col), res)
    counts = (
        df.select(gx.cast("long").alias("cx"), gy.cast("long").alias("cy"))
        .groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).alias("n_points"))
        .withColumn("cell", F.col("cy") * nx + F.col("cx"))
    )
    core = counts.where(F.col("n_points") >= min_pts)

    def neighbor_cells(src: DataFrame, offsets) -> DataFrame:
        """Scatter each cell to its neighbor coordinates (wrap-x, clamp-y):
        rows (cell, ncx, ncy) — one explode, no shuffle."""
        pairs = F.array(
            *[
                F.struct(
                    F.pmod(F.col("cx") + F.lit(dx), F.lit(nx)).alias("ncx"),
                    (F.col("cy") + F.lit(dy)).alias("ncy"),
                )
                for dx, dy in offsets
            ]
        )
        return (
            src.select("cell", F.explode(pairs).alias("p"))
            .select("cell", F.col("p.ncx").alias("ncx"), F.col("p.ncy").alias("ncy"))
            .where((F.col("ncy") >= 0) & (F.col("ncy") < ny))
        )

    # core-core adjacency: half-neighborhood scatter joined back to core —
    # each undirected edge produced exactly once (dimension-sized join)
    edges = (
        neighbor_cells(core, _HALF_NEIGHBORS)
        .join(
            core.select(
                F.col("cx").alias("ncx"),
                F.col("cy").alias("ncy"),
                F.col("cell").alias("ncell"),
            ),
            ["ncx", "ncy"],
        )
        .select(F.col("cell").alias("id_a"), F.col("ncell").alias("id_b"))
    )
    comp = connected_components(edges, max_iter=max_iter)
    core_lab = core.join(comp, core.cell == comp.node, "left").select(
        "cell",
        "cx",
        "cy",
        "n_points",
        F.coalesce(F.col("component"), F.col("cell")).alias("cluster"),
        F.lit(True).alias("is_core"),
    )

    # border cells: occupied non-core cells adjacent to >= 1 core cell adopt
    # the MIN cluster among those neighbors (deterministic tie-break)
    non_core = counts.where(F.col("n_points") < min_pts)
    border = (
        neighbor_cells(non_core, _ALL_NEIGHBORS)
        .join(
            core_lab.select(
                F.col("cx").alias("ncx"),
                F.col("cy").alias("ncy"),
                F.col("cluster").alias("ncluster"),
            ),
            ["ncx", "ncy"],
        )
        .groupBy("cell")
        .agg(F.min("ncluster").alias("cluster"))
        .join(non_core, "cell")
        .select("cell", "cx", "cy", "n_points", "cluster", F.lit(False).alias("is_core"))
    )
    return core_lab.unionByName(border)


def cluster_stats(cells: DataFrame) -> DataFrame:
    """Per-cluster rollup of a grid_dbscan cell table: cell/point counts and
    the grid-bbox extent — dimension-sized aggregate, one exchange."""
    return cells.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.sum(F.when(F.col("is_core"), 1).otherwise(0)).alias("n_core_cells"),
        F.sum("n_points").alias("n_points"),
        F.min("cx").alias("cx_min"),
        F.max("cx").alias("cx_max"),
        F.min("cy").alias("cy_min"),
        F.max("cy").alias("cy_max"),
    )

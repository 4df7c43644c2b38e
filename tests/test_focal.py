"""Focal map algebra: numpy convolution oracle, wrap/clamp edges, identities."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from stac_catalog_builder_spark import synth
from stac_catalog_builder_spark.operators.focal import cell_density, focal_smooth
from stac_catalog_builder_spark.operators.footprints import with_footprint

SF = "/root/testdata/sf0.001"


def _brute_focal(density: pd.DataFrame, res: int, radius: int) -> pd.DataFrame:
    """Dense-grid scatter oracle: wrap x, clamp y, receiving cells only."""
    nx, ny = 2 ** (res + 1), 2**res
    grid = np.zeros((nx, ny), dtype=np.int64)
    for gx, gy, cnt in density.itertuples(index=False):
        grid[gx, gy] = cnt
    focal = np.zeros_like(grid)
    receives = np.zeros_like(grid, dtype=bool)
    occ = np.argwhere(grid > 0)
    for gx, gy in occ:
        for dx in range(-radius, radius + 1):
            for dy in range(-radius, radius + 1):
                tx, ty = (gx + dx) % nx, gy + dy
                if 0 <= ty < ny:
                    focal[tx, ty] += grid[gx, gy]
                    receives[tx, ty] = True
    rows = []
    for tx, ty in np.argwhere(receives):
        n_win = (2 * radius + 1) * (
            min(ty + radius, ny - 1) - max(ty - radius, 0) + 1
        )
        rows.append(
            (tx, ty, grid[tx, ty], focal[tx, ty], n_win, focal[tx, ty] * 1000 // n_win)
        )
    return pd.DataFrame(
        rows, columns=["gx", "gy", "cnt", "focal_cnt", "n_window", "focal_mean_e3"]
    ).sort_values(["gx", "gy"], ignore_index=True)


@pytest.mark.parametrize("res,radius", [(6, 1), (5, 2)])
def test_focal_exact_vs_numpy(spark, res, radius):
    df = with_footprint(synth.images(spark, SF))
    dens = cell_density(df, "lon", "lat", res)
    got = (
        focal_smooth(dens, res, radius)
        .toPandas()
        .sort_values(["gx", "gy"], ignore_index=True)
    )
    want = _brute_focal(dens.toPandas(), res, radius)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # own counts conserve the input
    assert got["cnt"].sum() == df.count()


def _points(spark, pts):
    return spark.createDataFrame(pd.DataFrame(pts, columns=["lon", "lat"]))


def test_focal_wraps_antimeridian(spark):
    """Two points just each side of the antimeridian are focal neighbors."""
    res = 6  # 128 x-cells, 2.8125 deg wide
    df = _points(spark, [(-179.9, 10.0), (179.9, 10.0)])
    out = focal_smooth(cell_density(df, "lon", "lat", res), res, 1).toPandas()
    occupied = out[out.cnt > 0]
    assert set(occupied.gx) == {0, 2 ** (res + 1) - 1}
    # each occupied cell sees BOTH points through the wrap
    assert (occupied.focal_cnt == 2).all()


def test_focal_clamps_at_pole(spark):
    """A point in the top latitude row has a truncated (2-row) window, and
    no mass leaks past the pole."""
    res = 4  # 16 y-cells
    df = _points(spark, [(10.0, 89.5)])
    out = focal_smooth(cell_density(df, "lon", "lat", res), res, 1).toPandas()
    assert out.gy.max() == 2**res - 1  # nothing beyond the top row
    top = out[out.cnt > 0].iloc[0]
    assert top["n_window"] == 3 * 2  # 3 x-cols, 2 valid y-rows
    assert out["focal_cnt"].sum() == 6  # the point lands in 6 valid cells


def test_focal_radius_validation(spark):
    df = _points(spark, [(0.0, 0.0)])
    with pytest.raises(ValueError):
        focal_smooth(cell_density(df, "lon", "lat", 6), 6, 0)

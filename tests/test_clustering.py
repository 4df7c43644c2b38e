"""Grid-DBSCAN tests: numpy flood-fill oracle (8-connectivity with
antimeridian x-wrap), border adoption, noise exclusion, and the rollup."""

from __future__ import annotations

from collections import deque

import numpy as np
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as e
from stac_catalog_builder_spark.operators.clustering import (
    cluster_stats,
    grid_dbscan,
)

SF = "/root/testdata/sf0.001"


def _dbscan_np(lon, lat, res, min_pts):
    """Dense-grid reference: counts -> core flood fill (8-conn, x wraps,
    y clamps) with min-cell-id labels -> border adoption. Returns
    {cell: (cx, cy, n_points, cluster, is_core)}."""
    nx, ny = 2 ** (res + 1), 2**res
    cx = np.clip(np.floor((np.asarray(lon) + 180.0) / 360.0 * nx).astype(np.int64), 0, nx - 1)
    cy = np.clip(np.floor((np.asarray(lat) + 90.0) / 180.0 * ny).astype(np.int64), 0, ny - 1)
    counts = np.zeros((ny, nx), dtype=np.int64)
    np.add.at(counts, (cy, cx), 1)
    core = counts >= min_pts
    label = -np.ones((ny, nx), dtype=np.int64)
    # flood fill each core component; label = min cell id inside it
    for y0 in range(ny):
        for x0 in range(nx):
            if not core[y0, x0] or label[y0, x0] >= 0:
                continue
            comp = []
            q = deque([(y0, x0)])
            seen = {(y0, x0)}
            while q:
                y, x = q.popleft()
                comp.append((y, x))
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        if dx == dy == 0:
                            continue
                        yy, xx = y + dy, (x + dx) % nx
                        if 0 <= yy < ny and core[yy, xx] and (yy, xx) not in seen:
                            seen.add((yy, xx))
                            q.append((yy, xx))
            lab = min(y * nx + x for y, x in comp)
            for y, x in comp:
                label[y, x] = lab
    out = {}
    for y in range(ny):
        for x in range(nx):
            if counts[y, x] == 0:
                continue
            cell = y * nx + x
            if core[y, x]:
                out[cell] = (x, y, int(counts[y, x]), int(label[y, x]), True)
            else:
                nbr = [
                    int(label[y + dy, (x + dx) % nx])
                    for dy in (-1, 0, 1)
                    for dx in (-1, 0, 1)
                    if (dx, dy) != (0, 0)
                    and 0 <= y + dy < ny
                    and core[y + dy, (x + dx) % nx]
                ]
                if nbr:
                    out[cell] = (x, y, int(counts[y, x]), min(nbr), False)
    return out


def _rows_to_dict(rows):
    return {
        r["cell"]: (r["cx"], r["cy"], r["n_points"], r["cluster"], r["is_core"])
        for r in rows
    }


def test_grid_dbscan_matches_numpy_on_catalog(spark):
    pts = e._images_fp(spark, SF).select("lon", "lat").toPandas()
    want = _dbscan_np(pts["lon"], pts["lat"], e.DBSCAN_RES, e.DBSCAN_MIN_PTS)
    got = _rows_to_dict(e.q_spatial_clusters(spark, SF).collect())
    assert got == want


def _cell_pts(spark, cells, res, reps):
    """Points at cell centers: [(cx, cy, n_copies)] -> DataFrame(lon, lat)."""
    nx, ny = 2 ** (res + 1), 2**res
    rows = []
    for (cx, cy), n in zip(cells, reps):
        lon = -180.0 + (cx + 0.5) * 360.0 / nx
        lat = -90.0 + (cy + 0.5) * 180.0 / ny
        rows += [(lon, lat)] * n
    return spark.createDataFrame(rows, "lon double, lat double")


def test_antimeridian_wrap_merges_clusters(spark):
    """Core cells at cx=0 and cx=nx-1 on the same row are 8-neighbors
    through the antimeridian: one cluster, labelled by the smaller cell."""
    res = 5
    nx = 2 ** (res + 1)
    df = _cell_pts(spark, [(0, 10), (nx - 1, 10)], res, [3, 3])
    out = grid_dbscan(df, "lon", "lat", res, min_pts=3).collect()
    assert len(out) == 2
    assert len({r["cluster"] for r in out}) == 1
    assert all(r["cluster"] == 10 * nx + 0 for r in out)


def test_border_adoption_and_noise(spark):
    """A lone point next to a core cell becomes a border member of that
    cluster (min core neighbor when two clusters touch it); a lone point
    far away is noise and is absent from the output."""
    res = 5
    nx = 2 ** (res + 1)
    cells = [(10, 10), (12, 10), (11, 10), (20, 20)]
    df = _cell_pts(spark, cells, res, [3, 3, 1, 1])
    out = _rows_to_dict(grid_dbscan(df, "lon", "lat", res, min_pts=3).collect())
    c1, c2 = 10 * nx + 10, 10 * nx + 12
    assert out[c1][3] == c1 and out[c1][4] is True
    assert out[c2][3] == c2 and out[c2][4] is True
    # border cell between the two singleton clusters adopts the MIN
    assert out[10 * nx + 11] == (11, 10, 1, c1, False)
    assert 20 * nx + 20 not in out  # noise
    with pytest.raises(ValueError):
        grid_dbscan(df, "lon", "lat", res, min_pts=0)


def test_cluster_stats_rollup(spark):
    res = 5
    nx = 2 ** (res + 1)
    df = _cell_pts(spark, [(10, 10), (11, 10), (11, 11), (30, 20)], res, [3, 4, 1, 5])
    cells = grid_dbscan(df, "lon", "lat", res, min_pts=3)
    stats = {r["cluster"]: r for r in cluster_stats(cells).collect()}
    big = stats[10 * nx + 10]
    assert big["n_cells"] == 3 and big["n_core_cells"] == 2
    assert big["n_points"] == 8
    assert (big["cx_min"], big["cx_max"], big["cy_min"], big["cy_max"]) == (10, 11, 10, 11)
    lone = stats[20 * nx + 30]
    assert lone["n_cells"] == 1 and lone["n_points"] == 5

"""Unit tests for the cell indexes: hierarchy, ring adjacency, prefix parents.

Table-driven like the reference's projection tests
(reference tests/test_projections.py:12-124).
"""

from __future__ import annotations

import numpy as np
import pytest

from stac_catalog_builder_spark.functions.cells import (
    grid_bounds_np,
    grid_cell_np,
    grid_cover_bbox,
    grid_parent_np,
    hex_cell_np,
    hex_center_np,
    hex_kring_np,
    hex_parent_np,
    s2_cell_np,
    s2_level_np,
    s2_parent_np,
)

RNG = np.random.default_rng(42)
N = 2000
LON = RNG.uniform(-179.9, 179.9, N)
LAT = RNG.uniform(-59.9, 59.9, N)


# --- grid -------------------------------------------------------------------

@pytest.mark.parametrize("res", [5, 7, 9, 12])
def test_grid_point_in_own_cell(res):
    cells = grid_cell_np(LON, LAT, res)
    w, s, e, n = grid_bounds_np(cells)
    assert ((LON >= w) & (LON < e + 1e-9) & (LAT >= s) & (LAT < n + 1e-9)).all()


@pytest.mark.parametrize("res", [6, 8, 12])
def test_grid_parent_containment(res):
    child = grid_cell_np(LON, LAT, res)
    parent_direct = grid_cell_np(LON, LAT, res - 1)
    assert (grid_parent_np(child) == parent_direct).all()


def test_grid_cover_contains_point_cells():
    cover = set(grid_cover_bbox(3.9, 50.9, 5.1, 52.1, 7))
    pts = grid_cell_np(np.array([4.0, 5.0, 4.5]), np.array([51.0, 52.0, 51.5]), 7)
    assert set(int(c) for c in pts) <= cover


# --- hex (H3-like) -----------------------------------------------------------

@pytest.mark.parametrize("res", [5, 7, 9, 12])
def test_hex_center_roundtrip(res):
    cells = hex_cell_np(LON, LAT, res)
    cx, cy = hex_center_np(cells)
    again = hex_cell_np(cx, cy, res)
    assert (again == cells).all()


@pytest.mark.parametrize("res", [5, 8, 12])
def test_hex_parent_contains_child_center(res):
    """H3-like approximate containment: the child's center lies in the
    parent cell (hexes never nest exactly; same property real H3 has)."""
    child = hex_cell_np(LON, LAT, res)
    parent = hex_parent_np(child)
    cx, cy = hex_center_np(child)
    # the parent of the child must be the res-1 cell of the child's center
    assert (parent == hex_cell_np(cx, cy, res - 1)).all()


def test_hex_kring_counts_and_symmetry():
    c = int(hex_cell_np(np.array([4.0]), np.array([51.0]), 7)[0])
    for k in (0, 1, 2, 3):
        ring = hex_kring_np(c, k)
        assert len(ring) == 1 + 3 * k * (k + 1)  # hexagonal number
        assert len(set(ring.tolist())) == len(ring)
    # symmetry: b in kring(a) <=> a in kring(b)
    ring1 = hex_kring_np(c, 1)
    for b in ring1:
        assert c in set(hex_kring_np(int(b), 1).tolist())


def test_hex_neighbors_are_close():
    c = int(hex_cell_np(np.array([4.0]), np.array([51.0]), 7)[0])
    cx, cy = hex_center_np(np.array([c]))
    ring = hex_kring_np(c, 1)
    nx, ny = hex_center_np(ring)
    d = np.hypot(nx - cx[0], ny - cy[0])
    d = d[d > 0]
    assert np.allclose(d, d[0], rtol=1e-9)  # all 6 neighbors equidistant


# --- s2-style ----------------------------------------------------------------

@pytest.mark.parametrize("level", [5, 10, 20, 30])
def test_s2_exact_prefix_parent(level):
    child = s2_cell_np(LON, LAT, level)
    parent_direct = s2_cell_np(LON, LAT, level - 1)
    assert (s2_parent_np(child) == parent_direct).all()


def test_s2_level_decode():
    for level in (0, 5, 12, 30):
        cells = s2_cell_np(LON[:100], LAT[:100], level)
        assert (s2_level_np(cells) == level).all()


def test_s2_locality():
    """Nearby points share high-level cells; antipodal points never do."""
    a = s2_cell_np(np.array([4.0]), np.array([51.0]), 10)
    b = s2_cell_np(np.array([4.0001]), np.array([51.0001]), 10)
    far = s2_cell_np(np.array([-176.0]), np.array([-51.0]), 10)
    assert a[0] == b[0]
    assert a[0] != far[0]


def test_s2_distinct_faces():
    lon = np.array([0.0, 90.0, 0.0, 180.0, -90.0, 0.0])
    lat = np.array([0.0, 0.0, 89.9, 0.0, 0.0, -89.9])
    cells = s2_cell_np(lon, lat, 0)
    assert len(set(cells.tolist())) == 6


# --- quadkey / tile pyramid -------------------------------------------------

def _quadkey_py(x: int, y: int, zoom: int) -> str:
    return "".join(
        str(((x >> i) & 1) + 2 * ((y >> i) & 1)) for i in range(zoom - 1, -1, -1)
    )


def test_quadkey_matches_reference_and_prefix_property(spark):
    from pyspark.sql import functions as F
    from stac_catalog_builder_spark.operators.tiling import quadkey_col

    rows = [(x, y) for x in (0, 1, 5, 37, 255) for y in (0, 2, 9, 101, 255)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select(
        "x", "y",
        quadkey_col(F.col("x"), F.col("y"), 8).alias("qk8"),
        quadkey_col(F.shiftright("x", 2), F.shiftright("y", 2), 6).alias("qk6"),
    ).collect()
    for r in got:
        assert r["qk8"] == _quadkey_py(r["x"], r["y"], 8)
        # the zoom-6 ancestor's quadkey is EXACTLY the first 6 characters
        assert r["qk6"] == r["qk8"][:6]


def test_tile_pyramid_levels_consistent_and_single_fact_pass(spark):
    """Each coarser level must be the exact prefix-fold of the base level,
    totals conserved; and after the base checkpoint materializes, the final
    plan touches no parquet and only tile-table exchanges remain."""
    import __spark_entry__ as e
    from pyspark.sql import functions as F

    df = e.q_tile_pyramid(spark, "/root/testdata/sf0.001")
    df.write.format("noop").mode("overwrite").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 0, plan
    assert plan.count("Exchange hashpartitioning") <= 2, plan

    pdf = df.toPandas()
    base = pdf[pdf.zoom == 8]
    n_total = base.n_images.sum()
    for lv in (6, 4):
        level = pdf[pdf.zoom == lv].set_index("quadkey")["n_images"]
        fold = base.groupby(base.quadkey.str[:lv])["n_images"].sum()
        assert level.sort_index().equals(fold.sort_index())
        assert level.sum() == n_total


# --- geohash ---------------------------------------------------------------


def _geohash_py(lon: float, lat: float, precision: int) -> str:
    """Textbook bit-subdivision geohash (independent of the engine's
    closed-form integer encode)."""
    alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"
    lo = [-180.0, -90.0]
    hi = [180.0, 90.0]
    bits = []
    dim = 0  # lon first
    while len(bits) < 5 * precision:
        mid = (lo[dim] + hi[dim]) / 2
        v = lon if dim == 0 else lat
        if v >= mid:
            bits.append(1)
            lo[dim] = mid
        else:
            bits.append(0)
            hi[dim] = mid
        dim ^= 1
    return "".join(
        alphabet[int("".join(map(str, bits[i : i + 5])), 2)]
        for i in range(0, len(bits), 5)
    )


def test_geohash_known_value(spark):
    from pyspark.sql import functions as F

    from stac_catalog_builder_spark.functions.cells import geohash_col

    # the canonical public example: (42.605, -5.603) -> ezs42
    df = spark.createDataFrame([(-5.603, 42.605)], "lon double, lat double")
    got = df.select(geohash_col(F.col("lon"), F.col("lat"), 5).alias("g")).collect()
    assert got[0]["g"] == "ezs42"


def test_geohash_matches_subdivision_reference_and_numpy(spark):
    import numpy as np
    from pyspark.sql import functions as F

    from stac_catalog_builder_spark.functions.cells import geohash_col, geohash_np

    rng = np.random.default_rng(7)
    lon = rng.uniform(-180, 180, 200)
    lat = rng.uniform(-90, 90, 200)
    df = spark.createDataFrame(
        list(zip(lon.tolist(), lat.tolist())), "lon double, lat double"
    )
    got = [
        r["g"]
        for r in df.select(
            geohash_col(F.col("lon"), F.col("lat"), 7).alias("g")
        ).collect()
    ]
    want_np = geohash_np(lon, lat, 7)
    for g, n, lo, la in zip(got, want_np, lon, lat):
        assert g == n == _geohash_py(lo, la, 7)


def test_geohash_prefix_property(spark):
    """The precision-p ancestor is EXACTLY the first p characters — same
    rollup contract as the quadkey pyramid."""
    import __spark_entry__ as e

    df = e.q_geohash_cells(spark, "/root/testdata/sf0.001")
    bad = df.where("substr(gh5, 1, 3) <> gh3").count()
    assert bad == 0


# --- Hilbert curve index ---------------------------------------------------

from pyspark.sql import functions as F

from stac_catalog_builder_spark.functions.cells import (
    _hilbert_xy_to_d,
    hilbert_d_col,
)


def test_hilbert_col_matches_numpy_exhaustive(spark):
    """Every point of the order-4 grid (16x16) — the JVM fold must equal the
    numpy reference bit-for-bit (the masked rotation is algebraically
    identical to the reference's unmasked one: mod-2^k subtraction keeps
    all consulted low bits equal)."""
    order, n = 4, 16
    df = spark.createDataFrame(
        [(x, y) for x in range(n) for y in range(n)], "x long, y long"
    )
    got = (
        df.select("x", "y", hilbert_d_col(F.col("x"), F.col("y"), order).alias("d"))
        .toPandas()
        .sort_values(["x", "y"])
    )
    want = _hilbert_xy_to_d(order, got["x"].to_numpy(), got["y"].to_numpy())
    assert (got["d"].to_numpy() == want).all()
    # bijectivity: d is a permutation of 0..n^2-1
    assert sorted(got["d"]) == list(range(n * n))


def test_hilbert_col_matches_numpy_random_order16(spark):
    rng = np.random.default_rng(7)
    xs = rng.integers(0, 1 << 16, 300)
    ys = rng.integers(0, 1 << 16, 300)
    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in zip(xs, ys)], "x long, y long"
    )
    got = df.select(
        "x", "y", hilbert_d_col(F.col("x"), F.col("y"), 16).alias("d")
    ).toPandas()
    want = _hilbert_xy_to_d(16, got["x"].to_numpy(), got["y"].to_numpy())
    assert (got["d"].to_numpy() == want).all()


def test_hilbert_adjacency_and_quadrant_recursion():
    """The two properties that make Hilbert the LAYOUT key: consecutive d
    are always unit-step grid neighbors (no Z-order teleports), and each
    quarter of the d-range fills exactly one quadrant (recursive locality).
    Checked on the numpy reference the JVM fold is pinned to."""
    order, n = 5, 32
    xs, ys = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    d = _hilbert_xy_to_d(order, xs.ravel(), ys.ravel())
    by_d = np.empty((n * n, 2), dtype=np.int64)
    by_d[d] = np.stack([xs.ravel(), ys.ravel()], axis=1)
    steps = np.abs(np.diff(by_d, axis=0)).sum(axis=1)
    assert (steps == 1).all()
    quarter = by_d[: n * n // 4]
    assert quarter[:, 0].max() - quarter[:, 0].min() < n // 2
    assert quarter[:, 1].max() - quarter[:, 1].min() < n // 2


def test_hilbert_order_validation(spark):
    import pytest as _pytest

    with _pytest.raises(ValueError):
        hilbert_d_col(F.lit(0), F.lit(0), 0)
    with _pytest.raises(ValueError):
        hilbert_d_col(F.lit(0), F.lit(0), 32)

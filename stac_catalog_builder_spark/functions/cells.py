"""Cell indexes: quad grid, hexagonal (H3-like) and S2-style cell IDs.

Three systems, all deterministic and pure-numpy (no h3/s2 C libraries exist in
this environment; SURVEY.md §7.0):

- **grid**: a quad lon/lat grid with closed-form arithmetic — expressible as
  plain Spark column expressions AND plain SQL, so the DuckDB oracle can check
  cell assignment end-to-end. Used as the cover-cell index of the spatial
  join (cheap, prunable) and for salting decisions.
- **hex**: an H3-like hierarchical hexagon index (axial coordinates on the
  equirectangular plane, aperture-4 size ladder, res 5-12), with exact k-ring
  adjacency — drives kNN ring expansion. Like real H3, parent/child
  containment is "child center lies in parent" (hexes never nest exactly).
- **s2**: an S2-style 64-bit cell id — face cube projection + quadratic
  s-t transform + Hilbert curve position, 3 face bits / 2*level position bits
  / sentinel bit. The *exact-prefix* parent property holds by construction:
  ``encode(p, l-1) == parent(encode(p, l))`` for every point p.

The reference has no cell index (its spatial grouping is exact-bbox equality,
stacbuilder/builder.py:780-793); the north rule adds H3/S2 as first-class.
Spark surface: grid = JVM column expressions; hex/s2 = Arrow-batched
``pandas_udf`` (Series -> Series, no per-row Python).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Quad grid cells (closed form; mirrored in oracles.py SQL)
# ---------------------------------------------------------------------------

GRID_RES_BITS = 32  # cell = res * 2^32 + gx * 2^16 + gy
GRID_X_BITS = 16


def grid_cell_col(lon: Column, lat: Column, res: int) -> Column:
    """Grid cell id as a pure JVM column expression (codegen'd, no UDF)."""
    nx, ny = 2 ** (res + 1), 2**res
    gx = F.least(
        F.greatest(F.floor((lon + 180.0) / 360.0 * nx), F.lit(0)), F.lit(nx - 1)
    )
    gy = F.least(
        F.greatest(F.floor((lat + 90.0) / 180.0 * ny), F.lit(0)), F.lit(ny - 1)
    )
    return (F.lit(res) * F.lit(2**GRID_RES_BITS) + gx * F.lit(2**GRID_X_BITS) + gy).cast(
        "bigint"
    )


def grid_cell_np(lon: np.ndarray, lat: np.ndarray, res: int) -> np.ndarray:
    nx, ny = 2 ** (res + 1), 2**res
    gx = np.clip(np.floor((lon + 180.0) / 360.0 * nx).astype(np.int64), 0, nx - 1)
    gy = np.clip(np.floor((lat + 90.0) / 180.0 * ny).astype(np.int64), 0, ny - 1)
    return res * 2**GRID_RES_BITS + gx * 2**GRID_X_BITS + gy


def grid_decode_np(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """-> (res, gx, gy)"""
    cell = np.asarray(cell, dtype=np.int64)
    res = cell // 2**GRID_RES_BITS
    rem = cell % 2**GRID_RES_BITS
    return res, rem // 2**GRID_X_BITS, rem % 2**GRID_X_BITS


def grid_parent_np(cell: np.ndarray) -> np.ndarray:
    res, gx, gy = grid_decode_np(cell)
    return (res - 1) * 2**GRID_RES_BITS + (gx // 2) * 2**GRID_X_BITS + (gy // 2)


def grid_bounds_np(cell: np.ndarray) -> tuple[np.ndarray, ...]:
    res, gx, gy = grid_decode_np(cell)
    nx, ny = 2.0 ** (res + 1), 2.0**res
    w = -180.0 + gx * (360.0 / nx)
    s = -90.0 + gy * (180.0 / ny)
    return w, s, w + 360.0 / nx, s + 180.0 / ny


def grid_cover_bbox(w: float, s: float, e: float, n: float, res: int) -> list[int]:
    """All grid cells at ``res`` intersecting the bbox (driver-side, for small
    dimension tables — the polygon cover of the spatial join)."""
    nx, ny = 2 ** (res + 1), 2**res
    gx0 = int(np.clip(np.floor((w + 180.0) / 360.0 * nx), 0, nx - 1))
    gx1 = int(np.clip(np.floor((e + 180.0) / 360.0 * nx), 0, nx - 1))
    gy0 = int(np.clip(np.floor((s + 90.0) / 180.0 * ny), 0, ny - 1))
    gy1 = int(np.clip(np.floor((n + 90.0) / 180.0 * ny), 0, ny - 1))
    return [
        res * 2**GRID_RES_BITS + gx * 2**GRID_X_BITS + gy
        for gx in range(gx0, gx1 + 1)
        for gy in range(gy0, gy1 + 1)
    ]


# ---------------------------------------------------------------------------
# Hexagonal H3-like cells (axial coordinates, pointy-top)
# ---------------------------------------------------------------------------

HEX_BASE_SIZE = 45.0  # circumradius (deg) at res 0; aperture-4: size = 45/2^res
HEX_OFF = 2**25  # axial coordinate offset for packing
HEX_RES_SHIFT = 2**52
HEX_Q_SHIFT = 2**26
_SQRT3 = np.sqrt(3.0)


def hex_size(res: int) -> float:
    return HEX_BASE_SIZE / (2.0**res)


def hex_cell_np(lon: np.ndarray, lat: np.ndarray, res: int) -> np.ndarray:
    """Encode lon/lat to a hex cell id at ``res`` (vectorized cube-rounding)."""
    s = hex_size(res)
    x = np.asarray(lon, dtype=np.float64)
    y = np.asarray(lat, dtype=np.float64)
    qf = (_SQRT3 / 3.0 * x - y / 3.0) / s
    rf = (2.0 / 3.0 * y) / s
    q, r = _cube_round(qf, rf)
    return res * HEX_RES_SHIFT + (q + HEX_OFF) * HEX_Q_SHIFT + (r + HEX_OFF)


def _cube_round(qf: np.ndarray, rf: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    sf = -qf - rf
    q = np.rint(qf)
    r = np.rint(rf)
    sr = np.rint(sf)
    dq, dr, ds = np.abs(q - qf), np.abs(r - rf), np.abs(sr - sf)
    fix_q = (dq > dr) & (dq > ds)
    fix_r = ~fix_q & (dr > ds)
    q = np.where(fix_q, -r - sr, q)
    r = np.where(fix_r, -q - sr, r)
    return q.astype(np.int64), r.astype(np.int64)


def hex_decode_np(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    cell = np.asarray(cell, dtype=np.int64)
    res = cell // HEX_RES_SHIFT
    rem = cell % HEX_RES_SHIFT
    return res, rem // HEX_Q_SHIFT - HEX_OFF, rem % HEX_Q_SHIFT - HEX_OFF


def hex_center_np(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    res, q, r = hex_decode_np(cell)
    s = HEX_BASE_SIZE / (2.0**res)
    x = s * (_SQRT3 * q + _SQRT3 / 2.0 * r)
    y = s * (1.5 * r)
    return x, y


def hex_parent_np(cell: np.ndarray) -> np.ndarray:
    """Parent = hex at res-1 containing this cell's center (H3-like
    approximate containment — hexes never nest exactly)."""
    res, _, _ = hex_decode_np(cell)
    x, y = hex_center_np(cell)
    out = np.empty_like(np.asarray(cell, dtype=np.int64))
    # res is constant in practice; handle mixed-res input anyway
    for rv in np.unique(res):
        m = res == rv
        out[m] = hex_cell_np(x[m], y[m], int(rv) - 1)
    return out


def hex_kring_np(cell: int, k: int) -> np.ndarray:
    """All hex cells within graph distance k of ``cell`` (inclusive).

    Exact axial-ring formula: {(q+dq, r+dr) : max(|dq|,|dr|,|dq+dr|) <= k}.
    """
    res, q, r = hex_decode_np(np.asarray([cell]))
    res, q, r = int(res[0]), int(q[0]), int(r[0])
    dq = np.arange(-k, k + 1)
    dqg, drg = np.meshgrid(dq, dq)
    mask = np.maximum(
        np.maximum(np.abs(dqg), np.abs(drg)), np.abs(dqg + drg)
    ) <= k
    qq = (q + dqg[mask]).astype(np.int64)
    rr = (r + drg[mask]).astype(np.int64)
    return res * HEX_RES_SHIFT + (qq + HEX_OFF) * HEX_Q_SHIFT + (rr + HEX_OFF)


def hex_min_width_deg(res: int) -> float:
    """Minimum center-to-edge*2 (inradius*2 = sqrt(3)*size): a conservative
    lower bound on the distance from a cell to outside its k-ring is
    ``k * hex_min_width_deg`` (in equirectangular degrees)."""
    return _SQRT3 * hex_size(res)


def hex_cell_udf(res: int):
    """Arrow-batched pandas UDF: (lon, lat) -> hex cell id at ``res``."""

    @F.pandas_udf(T.LongType())
    def _enc(lon: pd.Series, lat: pd.Series) -> pd.Series:
        return pd.Series(hex_cell_np(lon.to_numpy(), lat.to_numpy(), res))

    return _enc


# ---------------------------------------------------------------------------
# S2-style cells (face cube + quadratic ST + Hilbert position)
# ---------------------------------------------------------------------------

S2_MAX_LEVEL = 30


def _lonlat_to_xyz(lon: np.ndarray, lat: np.ndarray):
    phi = np.radians(lat)
    theta = np.radians(lon)
    cosphi = np.cos(phi)
    return cosphi * np.cos(theta), cosphi * np.sin(theta), np.sin(phi)


def _xyz_to_face_uv(x, y, z):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(
        (ax >= ay) & (ax >= az),
        np.where(x >= 0, 0, 3),
        np.where(ay >= az, np.where(y >= 0, 1, 4), np.where(z >= 0, 2, 5)),
    ).astype(np.int64)
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (uf, vf, wf) in enumerate(
        [
            (lambda: y / x, lambda: z / x, None),
            (lambda: -x / y, lambda: z / y, None),
            (lambda: -x / z, lambda: -y / z, None),
            (lambda: z / x, lambda: y / x, None),
            (lambda: z / y, lambda: -x / y, None),
            (lambda: -y / z, lambda: -x / z, None),
        ]
    ):
        m = face == f
        if m.any():
            with np.errstate(divide="ignore", invalid="ignore"):
                u[m] = uf()[m]
                v[m] = vf()[m]
    return face, u, v


def _uv_to_st(u: np.ndarray) -> np.ndarray:
    # S2's quadratic projection: equalizes cell areas across a face.
    with np.errstate(invalid="ignore"):
        return np.where(
            u >= 0, 0.5 * np.sqrt(1.0 + 3.0 * u), 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u)
        )


def _hilbert_xy_to_d(order: int, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Classic Hilbert curve xy->d, vectorized (order iterations)."""
    x = x.astype(np.int64).copy()
    y = y.astype(np.int64).copy()
    d = np.zeros_like(x, dtype=np.int64)
    s = np.int64(1) << (order - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = np.where(flip, s - 1 - x, x)
        y_f = np.where(flip, s - 1 - y, y)
        x, y = np.where(swap, y_f, x_f), np.where(swap, x_f, y_f)
        s >>= 1
    return d


def s2_cell_np(lon: np.ndarray, lat: np.ndarray, level: int) -> np.ndarray:
    """S2-style cell id at ``level`` (0..30).

    Layout (like real S2): 3 face bits | 2*level Hilbert bits | 1 sentinel |
    zeros. Exact prefix-parent: ``s2_cell_np(p, l-1) == s2_parent_np(
    s2_cell_np(p, l))``.
    """
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    face, u, v = _xyz_to_face_uv(*_lonlat_to_xyz(lon, lat))
    smax = np.int64(1) << S2_MAX_LEVEL
    i = np.clip((_uv_to_st(u) * smax).astype(np.int64), 0, smax - 1)
    j = np.clip((_uv_to_st(v) * smax).astype(np.int64), 0, smax - 1)
    pos = _hilbert_xy_to_d(S2_MAX_LEVEL, i, j)  # 60 bits
    pos_l = pos >> np.int64(2 * (S2_MAX_LEVEL - level))
    fu = face.astype(np.uint64) << np.uint64(61)
    body = ((pos_l.astype(np.uint64) << np.uint64(1)) | np.uint64(1)) << np.uint64(
        60 - 2 * level
    )
    return (fu | body).view(np.int64)


def s2_parent_np(cell: np.ndarray) -> np.ndarray:
    """Parent cell id (level-1): zero the two lowest position bits, move the
    sentinel up — the standard lsb trick."""
    c = np.asarray(cell, dtype=np.int64).view(np.uint64)
    lsb = c & (~c + np.uint64(1))
    new_lsb = lsb << np.uint64(2)
    return ((c & (~(new_lsb - np.uint64(1)) | new_lsb)) | new_lsb).view(np.int64)


def s2_level_np(cell: np.ndarray) -> np.ndarray:
    c = np.asarray(cell, dtype=np.int64).view(np.uint64)
    lsb = c & (~c + np.uint64(1))
    # lsb = 2^(60-2*level) -> level = (60 - log2(lsb)) / 2
    log2 = np.zeros_like(c, dtype=np.int64)
    v = lsb.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        m = v >= (np.uint64(1) << np.uint64(shift))
        log2 += np.where(m, shift, 0)
        v = np.where(m, v >> np.uint64(shift), v)
    return (60 - log2) // 2


def s2_cell_udf(level: int):
    """Arrow-batched pandas UDF: (lon, lat) -> s2-style cell id."""

    @F.pandas_udf(T.LongType())
    def _enc(lon: pd.Series, lat: pd.Series) -> pd.Series:
        return pd.Series(s2_cell_np(lon.to_numpy(), lat.to_numpy(), level))

    return _enc


# ---------------------------------------------------------------------------
# Geohash (base-32 interleaved lat/lon; mirrored in oracles.py SQL)
# ---------------------------------------------------------------------------

GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _geohash_idx_bits(precision: int) -> tuple[int, int]:
    total = 5 * precision
    return (total + 1) // 2, total // 2  # lon leads the interleave


def geohash_col(lon: Column, lat: Column, precision: int) -> Column:
    """Geohash string of ``precision`` characters as a pure codegen column.

    The classic public-domain geocode (Niemeyer 2008): lon/lat are binary-
    subdivided and bit-interleaved (lon first), 5 bits per base-32 char.
    Like the quadkey, a geohash PREFIX is exactly the containing coarser
    cell, so prefix-truncation rollups and prefix-range scans work on an
    aggregated geohash table with no further fact shuffles. Implementation:
    the subdivision bits are just the binary expansion of
    ``floor((lon+180)/360 * 2^nbits)``, so the whole encode is two integer
    projections + an unrolled shift/mask concat — no UDF, no loop at row
    scope, bit-exactly replayable in any SQL engine (oracles.sql_geohash).
    """
    if not (1 <= precision <= 12):
        raise ValueError(f"precision must be in [1, 12]: {precision}")
    lon_bits, lat_bits = _geohash_idx_bits(precision)
    nx, ny = 2**lon_bits, 2**lat_bits
    xi = F.least(
        F.greatest(F.floor((lon + 180.0) / 360.0 * nx), F.lit(0)), F.lit(nx - 1)
    ).cast("bigint")
    yi = F.least(
        F.greatest(F.floor((lat + 90.0) / 180.0 * ny), F.lit(0)), F.lit(ny - 1)
    ).cast("bigint")
    chars = []
    for c in range(precision):
        val = F.lit(0)
        for t in range(5):
            j = 5 * c + t  # interleaved bit position, MSB first
            src, bits = (xi, lon_bits) if j % 2 == 0 else (yi, lat_bits)
            val = val + F.shiftright(src, bits - 1 - j // 2).bitwiseAND(
                F.lit(1)
            ) * F.lit(1 << (4 - t))
        chars.append(F.substr(F.lit(GEOHASH32), (val + 1).cast("int"), F.lit(1)))
    return F.concat(*chars)


def geohash_np(lon: np.ndarray, lat: np.ndarray, precision: int) -> np.ndarray:
    """Numpy twin of ``geohash_col`` (pytest oracle)."""
    lon_bits, lat_bits = _geohash_idx_bits(precision)
    nx, ny = 2**lon_bits, 2**lat_bits
    xi = np.clip(np.floor((lon + 180.0) / 360.0 * nx).astype(np.int64), 0, nx - 1)
    yi = np.clip(np.floor((lat + 90.0) / 180.0 * ny).astype(np.int64), 0, ny - 1)
    out = []
    for x, y in zip(xi, yi):
        s = []
        for c in range(precision):
            val = 0
            for t in range(5):
                j = 5 * c + t
                src, bits = (x, lon_bits) if j % 2 == 0 else (y, lat_bits)
                val = (val << 1) | ((int(src) >> (bits - 1 - j // 2)) & 1)
            s.append(GEOHASH32[val])
        out.append("".join(s))
    return np.array(out, dtype=object)


def hilbert_d_col(x: Column, y: Column, order: int) -> Column:
    """Hilbert-curve index d of integer grid coordinates (x, y) at ``order``
    (grid 2^order x 2^order) — pure JVM column algebra, value-identical to
    ``_hilbert_xy_to_d`` (pytest asserts this exhaustively).

    Built as ONE ``F.aggregate`` fold over the literal bit-plane array
    [2^(order-1), ..., 1]: the classic per-level quadrant digit + rotation
    recurrence runs as a runtime loop inside a single expression. An
    unrolled chain of ``withColumn`` levels would either collapse into an
    exponentially-duplicated expression tree (CollapseProject inlines each
    level's x/y into the next, which references them twice) or gamble on
    optimizer heuristics to keep the stages apart; the fold is loop-shaped
    at runtime, so plan size and codegen stay O(1) in ``order``.

    The rotation uses the masked variant (x,y reduced below s before
    reflecting): every intermediate stays in [0, 2^63) — no reliance on
    two's-complement behavior of negative BIGINTs, which keeps the DuckDB
    recursive-CTE replay (oracles.sql_hilbert_index) trivially exact.
    Why Hilbert for LAYOUT (vs the quadkey/Z-order in operators/tiling.py):
    successive d values are always grid NEIGHBORS (unit steps, no Z-jumps),
    so sorting a 10^12-row fact table by d gives every output file a
    spatially compact footprint and bbox probes touch the fewest files —
    the clustering key Delta/Iceberg OPTIMIZE ZORDER approximates, exact
    here because the curve never teleports.
    """
    if not 1 <= order <= 31:
        raise ValueError(f"order must be in [1, 31], got {order}")
    planes = F.array(
        *[F.lit(1 << i).cast("long") for i in range(order - 1, -1, -1)]
    )
    init = F.struct(
        x.cast("long").alias("x"),
        y.cast("long").alias("y"),
        F.lit(0).cast("long").alias("d"),
    )

    def step(acc: Column, s: Column) -> Column:
        ax, ay, ad = acc.getField("x"), acc.getField("y"), acc.getField("d")
        rx_set = ax.bitwiseAND(s) > 0
        ry_set = ay.bitwiseAND(s) > 0
        xm = ax.bitwiseAND(s - 1)
        ym = ay.bitwiseAND(s - 1)
        digit = (
            F.when(rx_set, 3).otherwise(0).bitwiseXOR(F.when(ry_set, 1).otherwise(0))
        ).cast("long")
        # ry=1: keep (xm, ym); ry=0 & rx=1: reflect both then swap;
        # ry=0 & rx=0: swap
        nx = F.when(ry_set, xm).otherwise(
            F.when(rx_set, s - 1 - ym).otherwise(ym)
        )
        ny = F.when(ry_set, ym).otherwise(
            F.when(rx_set, s - 1 - xm).otherwise(xm)
        )
        return F.struct(
            nx.alias("x"), ny.alias("y"), (ad + s * s * digit).alias("d")
        )

    return F.aggregate(planes, init, step, lambda acc: acc.getField("d"))

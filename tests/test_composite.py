"""composite_tiles: pixel-level mosaic compositing vs a per-pixel twin.

The twin replays the WHOLE pipeline (micro bbox, center-in-scene cell
range, nearest-neighbor gather, north-down tile layout, integer mean) one
pixel at a time in pure python — byte equality certifies the vectorized
block path end to end.
"""

from __future__ import annotations

import numpy as np
import pytest

from stac_catalog_builder_spark import synth
from stac_catalog_builder_spark.functions.codecs import decode_image, decode_raw
from stac_catalog_builder_spark.operators import multimodal
from stac_catalog_builder_spark.operators.composite import (
    PX_MICRO,
    _cell_range,
    _micro_bbox,
    composite_tiles,
)
from stac_catalog_builder_spark.operators.footprints import with_footprint

SF = "/root/testdata/sf0.001"
T = 64


def _twin(rows):
    acc, cnt = {}, {}
    for r in rows:
        arr = decode_image(bytes(r.bytes), r.fmt)
        h, w = arr.shape
        xw, xe, ys, yn = _micro_bbox(r.fp_w, r.fp_s, r.fp_e, r.fp_n)
        gx_lo, gx_hi = _cell_range(xw, xe)
        gy_lo, gy_hi = _cell_range(ys, yn)
        for gx in range(gx_lo, gx_hi + 1):
            j = min(max((PX_MICRO * gx + 5 - xw) // PX_MICRO, 0), w - 1)
            for gy in range(gy_lo, gy_hi + 1):
                i = min(max((yn - (PX_MICRO * gy + 5) - 1) // PX_MICRO, 0), h - 1)
                k = (gx // T, gy // T)
                if k not in acc:
                    acc[k] = np.zeros((T, T), np.int64)
                    cnt[k] = np.zeros((T, T), np.int32)
                row = (k[1] + 1) * T - 1 - gy  # north-down
                col = gx - k[0] * T
                acc[k][row, col] += int(arr[i, j])
                cnt[k][row, col] += 1
    tiles = {}
    for k in acc:
        out = np.zeros((T, T), np.uint8)
        cov = cnt[k] > 0
        out[cov] = (acc[k][cov] // cnt[k][cov]).astype(np.uint8)
        tiles[k] = (out, int(cov.sum()))
    return tiles


def test_composite_matches_per_pixel_twin(spark):
    imgs = multimodal.with_encoded_bytes(
        with_footprint(synth.images(spark, SF)).where("img_key < 60")
    )
    got = {
        (r.tile_x, r.tile_y): r for r in composite_tiles(imgs, tile_cells=T).collect()
    }
    want = _twin(
        imgs.select("image_id", "bytes", "fmt", "fp_w", "fp_s", "fp_e", "fp_n").collect()
    )
    assert set(got) == set(want) and len(got) > 5
    hot_overlap = False
    for k, (tile, covered) in want.items():
        r = got[k]
        assert np.array_equal(decode_raw(bytes(r.bytes)), tile), k
        assert r.covered_px == covered
        hot_overlap = hot_overlap or r.n_scenes > 1
    assert hot_overlap  # the fixture genuinely composites overlapping scenes


def test_composite_single_scene_identity_and_determinism(spark):
    """A tile covered by ONE scene must equal that scene's regridded block
    exactly (mean of one value is the value); repartitioning must not
    change a single byte."""
    imgs = multimodal.with_encoded_bytes(
        with_footprint(synth.images(spark, SF)).where("img_key < 60")
    )
    base = {
        (r.tile_x, r.tile_y): (r.n_scenes, bytes(r.bytes))
        for r in composite_tiles(imgs, tile_cells=T).collect()
    }
    re = {
        (r.tile_x, r.tile_y): (r.n_scenes, bytes(r.bytes))
        for r in composite_tiles(imgs.repartition(13), tile_cells=T).collect()
    }
    assert re == base
    singles = [k for k, (n, _) in base.items() if n == 1]
    assert singles  # fixture has isolated scenes too
    want = _twin(
        imgs.select("image_id", "bytes", "fmt", "fp_w", "fp_s", "fp_e", "fp_n").collect()
    )
    for k in singles:
        assert np.array_equal(
            decode_raw(base[k][1]), want[k][0]
        )  # identity through the mean


def test_composite_guard(spark):
    imgs = multimodal.with_encoded_bytes(
        with_footprint(synth.images(spark, SF)).where("img_key < 4")
    )
    with pytest.raises(ValueError):
        composite_tiles(imgs, tile_cells=0)


# --- tile_change -------------------------------------------------------------


def _flat_scene(spark, image_id, value, fp_w=0.0, fp_s=0.0, w=64, h=64):
    from stac_catalog_builder_spark.functions.codecs import encode_raw

    arr = np.full((h, w), value, dtype=np.uint8)
    row = (
        image_id,
        bytearray(encode_raw(arr)),
        "raw",
        fp_w,
        fp_s,
        fp_w + w * 0.00025,
        fp_s + h * 0.00025,
    )
    return spark.createDataFrame(
        [row],
        "image_id string, bytes binary, fmt string, "
        "fp_w double, fp_s double, fp_e double, fp_n double",
    )


def test_tile_change_known_deltas(spark):
    """Epoch B = epoch A shifted by +17 grey levels over the same ground:
    every shared pixel must report |diff| exactly 17 (mean_abs_diff_e3 =
    17000), the threshold classifies all-or-nothing around it, and an
    epoch-B-only scene reports zero shared pixels with n_scenes_a = 0."""
    from stac_catalog_builder_spark.operators.composite import tile_change

    a = _flat_scene(spark, "a1", 100)
    b = _flat_scene(spark, "b1", 117).unionAll(
        _flat_scene(spark, "b2", 50, fp_w=10.0, fp_s=10.0)
    )
    out = {(r.tile_x, r.tile_y): r for r in tile_change(a, b, threshold=8).collect()}
    shared = [r for r in out.values() if r.n_both_px > 0]
    assert len(shared) == 1
    r = shared[0]
    assert r.n_both_px == 64 * 64
    assert r.n_changed_px == 64 * 64  # |117-100| = 17 >= 8 everywhere
    assert r.mean_abs_diff_e3 == 17_000
    assert r.n_scenes_a == 1 and r.n_scenes_b == 1
    only_b = [r for r in out.values() if r.n_scenes_a == 0]
    assert only_b and all(
        r.n_both_px == 0 and r.n_scenes_b == 1 and r.mean_abs_diff_e3 == 0
        for r in only_b
    )
    # a higher threshold flips the classification to zero changed pixels
    calm = {
        (r.tile_x, r.tile_y): r
        for r in tile_change(a, b, threshold=18).collect()
    }
    r2 = [r for r in calm.values() if r.n_both_px > 0][0]
    assert r2.n_changed_px == 0 and r2.mean_abs_diff_e3 == 17_000


def test_tile_change_identical_epochs_are_silent(spark):
    from stac_catalog_builder_spark.operators.composite import tile_change

    imgs = multimodal.with_encoded_bytes(
        with_footprint(synth.images(spark, SF)).where("img_key < 30")
    )
    out = tile_change(imgs, imgs, threshold=1).collect()
    assert len(out) > 0
    for r in out:
        assert r.n_changed_px == 0 and r.mean_abs_diff_e3 == 0
        assert r.n_both_px > 0 and r.n_scenes_a == r.n_scenes_b


# --- rasterize_polygons --------------------------------------------------------


def test_rasterize_rect_exact_by_coordinates(spark):
    """For an axis-aligned rectangle the inside test is a pure coordinate
    comparison — an oracle independent of the production ray-cast kernel.
    Full-inside tiles are all-ones, boundary tiles match cell-by-cell, and
    bbox-covered-but-empty tiles are absent."""
    from stac_catalog_builder_spark.functions.codecs import decode_raw
    from stac_catalog_builder_spark.operators.composite import rasterize_polygons

    # rect [0.004, 0.037) x [0.006, 0.029) deg, deliberately off tile grid
    rect = {
        "ring_x": [0.004, 0.037, 0.037, 0.004],
        "ring_y": [0.006, 0.006, 0.029, 0.029],
        "collection_id": "c0",
    }
    T, C = 16, 40  # tile = 640 micro = 0.016 deg
    out = {
        (r.tile_x, r.tile_y): r
        for r in rasterize_polygons(
            spark, [rect], tile_cells=T, cell_micro=C
        ).collect()
    }
    assert out
    total = 0
    for (tx, ty), r in out.items():
        mask = decode_raw(bytes(r.mask))
        assert mask.shape == (T, T)
        gx = tx * T + np.arange(T)
        gy = ty * T + np.arange(T)
        lon = (C * gx + C // 2) / 40000.0 - 180.0
        lat = (C * gy[::-1] + C // 2) / 40000.0 - 90.0
        want = (
            (lon[None, :] >= 0.004)
            & (lon[None, :] < 0.037)
            & (lat[:, None] >= 0.006)
            & (lat[:, None] < 0.029)
        )
        assert np.array_equal(mask.astype(bool), want), (tx, ty)
        assert r.n_inside_px == int(want.sum()) > 0
        total += r.n_inside_px
    # every inside cell accounted for exactly once across tiles (cell
    # indices run from 0 at lon/lat = -180/-90 on this lattice)
    want_total = 0
    for g in range(int(360 * 40000 / C)):
        c = (C * g + C // 2) / 40000.0 - 180.0
        if 0.004 <= c < 0.037:
            want_total += 1
    rows_total = 0
    for g in range(int(180 * 40000 / C)):
        c = (C * g + C // 2) / 40000.0 - 90.0
        if 0.006 <= c < 0.029:
            rows_total += 1
    assert total == want_total * rows_total > 0


def test_rasterize_hexagon_vs_winding_number(spark):
    """A (convex) hexagon checked against an independently-written
    winding-number PIP — a different algorithm from the production
    even-odd ray cast; centers are off every edge, so the two must agree
    on all cells."""
    from stac_catalog_builder_spark.functions.codecs import decode_raw
    from stac_catalog_builder_spark.operators.composite import rasterize_polygons

    ang = np.linspace(0, 2 * np.pi, 7)[:-1] + 0.3
    vx = (0.02 + 0.017 * np.cos(ang)).tolist()
    vy = (0.015 + 0.013 * np.sin(ang)).tolist()
    hexa = {"ring_x": vx, "ring_y": vy, "collection_id": "hex"}

    def winding_inside(px, py):
        wn = 0
        n = len(vx)
        for i in range(n):
            x1, y1, x2, y2 = vx[i], vy[i], vx[(i + 1) % n], vy[(i + 1) % n]
            if y1 <= py:
                if y2 > py and (x2 - x1) * (py - y1) - (px - x1) * (y2 - y1) > 0:
                    wn += 1
            elif y2 <= py and (x2 - x1) * (py - y1) - (px - x1) * (y2 - y1) < 0:
                wn -= 1
        return wn != 0

    T, C = 16, 40
    out = rasterize_polygons(spark, [hexa], tile_cells=T, cell_micro=C).collect()
    assert out
    checked = inside_seen = 0
    for r in out:
        mask = decode_raw(bytes(r.mask)).astype(bool)
        gx = r.tile_x * T + np.arange(T)
        gy = r.tile_y * T + np.arange(T)
        lon = (C * gx + C // 2) / 40000.0 - 180.0
        lat = (C * gy[::-1] + C // 2) / 40000.0 - 90.0
        for i in range(T):
            for j in range(T):
                want = winding_inside(lon[j], lat[i])
                assert mask[i, j] == want, (r.tile_x, r.tile_y, i, j)
                checked += 1
                inside_seen += int(want)
    assert checked > 0 and inside_seen > 50


def test_rasterize_guards(spark):
    from stac_catalog_builder_spark.operators.composite import rasterize_polygons

    poly = {"ring_x": [0.0, 1.0, 0.0], "ring_y": [0.0, 0.0, 1.0], "collection_id": "t"}
    with pytest.raises(ValueError):
        rasterize_polygons(spark, [poly], tile_cells=0)
    with pytest.raises(ValueError):
        rasterize_polygons(spark, [poly], cell_micro=0)


def test_composite_merge_equals_direct(spark):
    """State built per batch then merged must render byte-identically to
    the state built from all scenes at once — the incremental-mosaic
    contract."""
    from stac_catalog_builder_spark.operators.composite import (
        composite_merge,
        composite_render,
        composite_state,
        composite_tiles,
    )

    imgs = multimodal.with_encoded_bytes(
        with_footprint(synth.images(spark, SF)).where("img_key < 60")
    )
    a = imgs.where("img_key % 2 = 0")
    b = imgs.where("img_key % 2 = 1")
    merged = composite_render(
        composite_merge(composite_state(a).unionAll(composite_state(b)))
    )
    direct = composite_tiles(imgs)

    def canon(df):
        return sorted(
            (r.tile_x, r.tile_y, r.n_scenes, r.covered_px, bytes(r.bytes), bytes(r.counts))
            for r in df.collect()
        )

    assert canon(merged) == canon(direct)


# --- masked_composite_stats --------------------------------------------------


def test_masked_stats_known_values(spark):
    """A value-100 scene covering exactly one tile, masked by a rectangle
    polygon: mean/min/max must be exactly 100 and n_px must equal the
    coordinate-comparison count of (covered AND inside) cells; a second
    label over empty ground reports nothing."""
    from stac_catalog_builder_spark.operators.composite import (
        composite_tiles,
        masked_composite_stats,
        rasterize_polygons,
    )

    scene = _flat_scene(spark, "s1", 100)  # [0, 0.016)^2, 64x64 px
    comps = composite_tiles(scene, tile_cells=64)
    rect = {
        "ring_x": [0.0, 0.008, 0.008, 0.0],
        "ring_y": [0.0, 0.0, 0.016, 0.016],
        "collection_id": "left_half",
    }
    far = {
        "ring_x": [50.0, 50.01, 50.01, 50.0],
        "ring_y": [50.0, 50.0, 50.01, 50.01],
        "collection_id": "nowhere",
    }
    masks = rasterize_polygons(
        spark,
        [rect, far],
        tile_cells=64,
        cell_micro=10,
        tiles=comps.select("tile_x", "tile_y"),
    )
    out = {r.label: r for r in masked_composite_stats(comps, masks).collect()}
    assert set(out) == {"left_half"}  # 'nowhere' has no data tiles
    r = out["left_half"]
    assert (r.mean_e3, r.min_px, r.max_px) == (100_000, 100, 100)
    # independent count: scene covers centers in [0, 0.016) deg; the mask
    # keeps lon centers in [0, 0.008) — exact half of the 64x64 tile
    n_lon = sum(
        1 for g in range(720000, 720064) if 0.0 <= (10 * g + 5) / 40000.0 - 180.0 < 0.008
    )
    assert r.n_px == n_lon * 64


def test_rasterize_tiles_restriction_is_row_identical(spark):
    """Restricting rasterize to a tile set must return exactly the
    unrestricted rows for those tiles (the paint is unchanged; only the
    cover enumeration differs)."""
    from stac_catalog_builder_spark.operators.composite import rasterize_polygons

    rect = {
        "ring_x": [0.004, 0.037, 0.037, 0.004],
        "ring_y": [0.006, 0.006, 0.029, 0.029],
        "collection_id": "c0",
    }
    full = rasterize_polygons(spark, [rect], tile_cells=16, cell_micro=40)
    some_tiles = full.select("tile_x", "tile_y").limit(3)
    chosen = {(r.tile_x, r.tile_y) for r in some_tiles.collect()}
    restricted = rasterize_polygons(
        spark, [rect], tile_cells=16, cell_micro=40, tiles=some_tiles
    )
    want = {
        (r.tile_x, r.tile_y): (r.label, r.n_inside_px, bytes(r.mask))
        for r in full.collect()
        if (r.tile_x, r.tile_y) in chosen
    }
    got = {
        (r.tile_x, r.tile_y): (r.label, r.n_inside_px, bytes(r.mask))
        for r in restricted.collect()
    }
    assert got == want and len(got) == 3

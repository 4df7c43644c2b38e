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

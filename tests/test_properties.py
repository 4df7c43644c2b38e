"""Property-based tests (hypothesis) for the geometry/cell kernels — the
randomized coverage the reference lacks (SURVEY.md §5: "no property-based
testing in the reference"); these pin the invariants the engine's joins rely
on for correctness at any input."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from stac_catalog_builder_spark.functions.cells import (
    grid_bounds_np,
    grid_cell_np,
    grid_parent_np,
    hex_cell_np,
    hex_center_np,
    hex_kring_np,
    s2_cell_np,
    s2_parent_np,
)
from stac_catalog_builder_spark.functions.geo import (
    haversine_np,
    point_in_polygon_np,
    rect_ring,
)
from stac_catalog_builder_spark.functions.hashes import (
    char_shingle_hashes,
    minhash_signature,
    simhash64,
)

lon_st = st.floats(min_value=-179.999, max_value=179.999, allow_nan=False)
lat_st = st.floats(min_value=-89.999, max_value=89.999, allow_nan=False)
res_st = st.integers(min_value=5, max_value=12)


@settings(max_examples=200, deadline=None)
@given(lon=lon_st, lat=lat_st, res=res_st)
def test_grid_cell_contains_its_point(lon, lat, res):
    cell = grid_cell_np(np.array([lon]), np.array([lat]), res)
    w, s, e, n = grid_bounds_np(cell)
    assert w[0] - 1e-9 <= lon <= e[0] + 1e-9
    assert s[0] - 1e-9 <= lat <= n[0] + 1e-9


@settings(max_examples=200, deadline=None)
@given(lon=lon_st, lat=lat_st, res=st.integers(min_value=6, max_value=12))
def test_grid_parent_consistency(lon, lat, res):
    child = grid_cell_np(np.array([lon]), np.array([lat]), res)
    assert grid_parent_np(child)[0] == grid_cell_np(np.array([lon]), np.array([lat]), res - 1)[0]


@settings(max_examples=200, deadline=None)
@given(lon=lon_st, lat=lat_st, res=res_st)
def test_hex_point_in_kring1_of_own_cell(lon, lat, res):
    """The encode->center roundtrip never drifts more than one ring."""
    cell = int(hex_cell_np(np.array([lon]), np.array([lat]), res)[0])
    cx, cy = hex_center_np(np.array([cell]))
    again = int(hex_cell_np(cx, cy, res)[0])
    assert again == cell


@settings(max_examples=100, deadline=None)
@given(lon=lon_st, lat=lat_st, level=st.integers(min_value=1, max_value=30))
def test_s2_prefix_parent_everywhere(lon, lat, level):
    child = s2_cell_np(np.array([lon]), np.array([lat]), level)
    direct = s2_cell_np(np.array([lon]), np.array([lat]), level - 1)
    assert s2_parent_np(child)[0] == direct[0]


@settings(max_examples=100, deadline=None)
@given(
    lon1=lon_st, lat1=lat_st, lon2=lon_st, lat2=lat_st
)
def test_haversine_metric_properties(lon1, lat1, lon2, lat2):
    d12 = float(haversine_np(lon1, lat1, lon2, lat2))
    d21 = float(haversine_np(lon2, lat2, lon1, lat1))
    assert abs(d12 - d21) < 1e-6
    assert d12 >= 0
    assert d12 <= np.pi * 6371000.0 + 1  # half circumference bound


@settings(max_examples=100, deadline=None)
@given(
    w=st.floats(-170, 160), s=st.floats(-80, 70),
    dw=st.floats(0.1, 20), dh=st.floats(0.1, 20),
    fx=st.floats(0.01, 0.99), fy=st.floats(0.01, 0.99),
)
def test_pip_interior_point_always_inside(w, s, dw, dh, fx, fy):
    rx, ry = rect_ring(w, s, w + dw, s + dh)
    px = np.array([w + fx * dw])
    py = np.array([s + fy * dh])
    assert point_in_polygon_np(px, py, rx, ry)[0]
    # and a point safely outside is outside
    assert not point_in_polygon_np(np.array([w - 1.0]), py, rx, ry)[0]


@settings(max_examples=50, deadline=None)
@given(text=st.text(min_size=0, max_size=300))
def test_hash_kernels_total_and_deterministic(text):
    """Kernels accept arbitrary unicode without crashing, deterministically."""
    assert (char_shingle_hashes(text) == char_shingle_hashes(text)).all()
    assert (minhash_signature(text) == minhash_signature(text)).all()
    toks = text.split(" ")
    assert simhash64(toks) == simhash64(toks)


@settings(max_examples=50, deadline=None)
@given(res=res_st, k=st.integers(min_value=0, max_value=4))
def test_hex_kring_size_formula(res, k):
    c = int(hex_cell_np(np.array([10.0]), np.array([20.0]), res)[0])
    assert len(hex_kring_np(c, k)) == 1 + 3 * k * (k + 1)


@settings(max_examples=60, deadline=None)
@given(texts=st.lists(st.text(min_size=0, max_size=120), min_size=1, max_size=12))
def test_batch_kernels_equal_per_doc_on_arbitrary_unicode(texts):
    """Whole-batch kernels == per-doc reference functions on ANY input
    (padding, utf-8 multibyte, empty docs, duplicate docs)."""
    from stac_catalog_builder_spark.functions.hashes import (
        batch_minhash_sigs,
        batch_rolling_fingerprint,
        batch_simhash64,
        rolling_fingerprint,
    )

    sigs = batch_minhash_sigs(texts)
    fps = batch_rolling_fingerprint(texts)
    shs = batch_simhash64(texts)
    for i, t in enumerate(texts):
        assert (sigs[i] == minhash_signature(t)).all()
        assert fps[i] == rolling_fingerprint(t)
        assert shs[i] == simhash64(t.split(" "))


@given(
    st.integers(0, 2**8 - 1),
    st.integers(2, 40),
    st.integers(2, 40),
    st.sampled_from(["hflip", "vflip", "rot90", "rot180", "rot270"]),
)
@settings(max_examples=60, deadline=None)
def test_augment_kernels_total_and_involutive(seed, w, h, op):
    """Augment kernels are total on any dims; flips are involutions; four
    rot90s are the identity; pixel multiset is preserved (no resampling)."""
    from stac_catalog_builder_spark.functions.codecs import make_raster
    from stac_catalog_builder_spark.operators.multimodal import _apply_augment

    arr = make_raster(seed * 2654435761 + 7, w, h)
    out = _apply_augment(arr, op)
    assert sorted(out.ravel()) == sorted(arr.ravel())  # permutation only
    if op in ("hflip", "vflip", "rot180"):
        assert np.array_equal(_apply_augment(out, op), arr)  # involution
    if op == "rot90":
        four = arr
        for _ in range(4):
            four = _apply_augment(four, "rot90")
        assert np.array_equal(four, arr)


@given(st.integers(0, 255), st.integers(3, 30), st.integers(3, 30))
@settings(max_examples=40, deadline=None)
def test_augment_crop_and_brightness_bounds(seed, w, h):
    from stac_catalog_builder_spark.functions.codecs import make_raster
    from stac_catalog_builder_spark.operators.multimodal import _apply_augment

    arr = make_raster(seed + 1, w, h)
    crop = _apply_augment(arr, "crop0.5")
    assert crop.shape == (max(1, h // 2), max(1, w // 2))
    assert crop.dtype == arr.dtype
    bright = _apply_augment(arr, "bright+200")
    assert bright.dtype == np.uint8 and bright.max() <= 255
    assert (bright >= arr).all()
    dim = _apply_augment(arr, "bright-200")
    assert dim.min() >= 0 and (dim <= arr).all()


@given(st.lists(st.integers(-(2**63), 2**63 - 1), min_size=1, max_size=200))
@settings(max_examples=30, deadline=None)
def test_hamming_block_pigeonhole_cover(sketches):
    """Driver-side check of the pigeonhole block layout used by
    hamming_candidate_pairs: for any two sketches within distance h, at
    least one of the h+1 blocks must be equal (the recall guarantee the
    Spark join relies on), for every h in 1..15."""
    import random

    rng = random.Random(7)
    for h in (1, 3, 6, 15):
        n_blocks = h + 1
        bounds = [
            (i * 64 // n_blocks, (i + 1) * 64 // n_blocks) for i in range(n_blocks)
        ]
        for s in sketches[:20]:
            u = s & ((1 << 64) - 1)
            v = u
            for b in rng.sample(range(64), h):
                v ^= 1 << b
            assert any(
                (u >> lo) & ((1 << (hi - lo)) - 1) == (v >> lo) & ((1 << (hi - lo)) - 1)
                for lo, hi in bounds
            )

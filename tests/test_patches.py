"""Patch-grid tests: numpy lattice/affine oracle, tail-alignment edge
cases, full-cover bounds, undersized-image exclusion, zero-shuffle plan."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as e
from stac_catalog_builder_spark.operators.patches import MICRO_PER_DEG, patch_grid

SF = "/root/testdata/sf0.001"


def _starts_np(extent, patch, stride):
    s = list(range(0, extent - patch + 1, stride))
    if (extent - patch) not in s:
        s.append(extent - patch)
    return sorted(set(s))


def _patches_np(rows, patch, stride):
    """rows: (image_id, w, h, fp_w, fp_s, fp_e, fp_n) -> set of tuples."""
    out = set()
    for iid, w, h, fw, fs, fe, fn in rows:
        if w < patch or h < patch:
            continue
        xw = int(np.floor((fw + 180.0) * MICRO_PER_DEG + 0.5))
        xe = int(np.floor((fe + 180.0) * MICRO_PER_DEG + 0.5))
        ys = int(np.floor((fs + 90.0) * MICRO_PER_DEG + 0.5))
        yn = int(np.floor((fn + 90.0) * MICRO_PER_DEG + 0.5))
        xs = _starts_np(w, patch, stride)
        yss = _starts_np(h, patch, stride)
        for yi, py in enumerate(yss):
            for xi, px in enumerate(xs):
                out.add(
                    (
                        iid,
                        yi * len(xs) + xi,
                        px,
                        py,
                        xw + px * (xe - xw) // w,
                        xw + (px + patch) * (xe - xw) // w,
                        yn - (py + patch) * (yn - ys) // h,
                        yn - py * (yn - ys) // h,
                    )
                )
    return out


def _collect_set(df):
    return {
        (
            r["image_id"], r["patch_id"], r["px"], r["py"],
            r["g_w_u"], r["g_e_u"], r["g_s_u"], r["g_n_u"],
        )
        for r in df.collect()
    }


def test_patch_grid_matches_numpy_on_catalog(spark):
    imgs = e._images_fp(spark, SF).where(F.col("img_key") % 5 == 0)
    rows = [
        (r["image_id"], r["w"], r["h"], r["fp_w"], r["fp_s"], r["fp_e"], r["fp_n"])
        for r in imgs.select(
            "image_id", "w", "h", "fp_w", "fp_s", "fp_e", "fp_n"
        ).collect()
    ]
    want = _patches_np(rows, e.PATCH_SIZE, e.PATCH_STRIDE)
    got = _collect_set(e.q_patch_grid(spark, SF))
    assert got == want and len(got) > 0


@pytest.fixture()
def synth_imgs(spark):
    # (w, h) cases: aligned tail (160: (160-64)%48=0), unaligned tail (150),
    # exact patch (64), undersized (63), one-axis undersized (200 x 40)
    rows = [
        ("a", 160, 160, 10.0, 10.0, 10.04, 10.04),
        ("b", 150, 100, -5.0, 0.0, -4.9625, 0.025),
        ("c", 64, 64, 0.0, 0.0, 0.016, 0.016),
        ("d", 63, 200, 0.0, 0.0, 0.016, 0.05),
        ("e", 200, 40, 0.0, 0.0, 0.05, 0.01),
    ]
    return spark.createDataFrame(
        rows, "image_id string, w int, h int, fp_w double, fp_s double, fp_e double, fp_n double"
    )


def test_patch_grid_edge_cases(spark, synth_imgs):
    got = patch_grid(synth_imgs, patch=64, stride=48).toPandas()
    by_img = got.groupby("image_id").size().to_dict()
    # a: starts [0,48,96] per axis (tail 96 aligned, deduped) -> 9
    # b: xs [0,48,86], ys [0,36] -> 6 ;  c: 1 ;  d/e: dropped
    assert by_img == {"a": 9, "b": 6, "c": 1}
    a = got[got.image_id == "a"]
    assert sorted(a["px"].unique()) == [0, 48, 96]
    assert sorted(a["patch_id"]) == list(range(9))
    # full cover: first/last patches are flush with the image bbox
    b = got[got.image_id == "b"].sort_values("patch_id")
    xw = round((-5.0 + 180.0) * MICRO_PER_DEG)
    xe = round((-4.9625 + 180.0) * MICRO_PER_DEG)
    yn = round((0.025 + 90.0) * MICRO_PER_DEG)
    ys = round((0.0 + 90.0) * MICRO_PER_DEG)
    assert b.iloc[0]["g_w_u"] == xw and b.iloc[0]["g_n_u"] == yn
    assert b["g_e_u"].max() == xe and b["g_s_u"].min() == ys
    with pytest.raises(ValueError):
        patch_grid(synth_imgs, patch=0)


def test_patch_grid_plan_no_exchange(spark, synth_imgs):
    """The lattice explode is pure map-side work: no shuffle Exchange."""
    plan = (
        patch_grid(synth_imgs)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan, plan

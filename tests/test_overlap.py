"""footprint_iou_pairs: exact-vs-brute-force, dedup, and geometry edge cases.

The operator claims EXACT pair recovery (grid bucketing is candidate
generation only; the integer IoU verify is total) and duplicate-free output
without a distinct (canonical-cell reporting).  Both claims are checked
against a vectorized numpy all-pairs oracle on the synthetic corpus, then
stressed where the trick could break: boxes spanning many cells, abutting
(edge-sharing, zero-IoU) boxes, zero-area boxes, and containment.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from stac_catalog_builder_spark import synth
from stac_catalog_builder_spark.operators.footprints import with_footprint
from stac_catalog_builder_spark.operators.overlap import (
    DEFAULT_SCALE,
    footprint_iou_pairs,
)

SF = "/root/testdata/sf0.001"


def _brute_pairs(p: pd.DataFrame, min_iou_pct: int, scale: int = DEFAULT_SCALE):
    """All-pairs integer-IoU oracle over a (fid, fp_w, fp_s, fp_e, fp_n) frame."""
    xw = np.floor((p["fp_w"].to_numpy() + 180.0) * float(scale) + 0.5).astype(np.int64)
    xe = np.floor((p["fp_e"].to_numpy() + 180.0) * float(scale) + 0.5).astype(np.int64)
    ys = np.floor((p["fp_s"].to_numpy() + 90.0) * float(scale) + 0.5).astype(np.int64)
    yn = np.floor((p["fp_n"].to_numpy() + 90.0) * float(scale) + 0.5).astype(np.int64)
    ids = p["fid"].to_numpy()
    order = np.argsort(ids, kind="stable")
    xw, xe, ys, yn, ids = xw[order], xe[order], ys[order], yn[order], ids[order]
    n = len(ids)
    ai, bi = np.triu_indices(n, k=1)
    ixw = np.maximum(xw[ai], xw[bi])
    ixe = np.minimum(xe[ai], xe[bi])
    iys = np.maximum(ys[ai], ys[bi])
    iyn = np.minimum(yn[ai], yn[bi])
    inter = np.maximum(ixe - ixw, 0) * np.maximum(iyn - iys, 0)
    pos = (ixe > ixw) & (iyn > iys)
    area = (xe - xw) * (yn - ys)
    valid = (area[ai] > 0) & (area[bi] > 0)
    uni = area[ai] + area[bi] - inter
    keep = pos & valid & (inter * 100 >= min_iou_pct * uni)
    out = pd.DataFrame(
        {
            "id_a": ids[ai[keep]],
            "id_b": ids[bi[keep]],
            "inter": inter[keep],
            "uni": uni[keep],
            "iou_e5": inter[keep] * 100_000 // uni[keep],
        }
    )
    return out.sort_values(["id_a", "id_b"], ignore_index=True)


def _got(df) -> pd.DataFrame:
    return (
        df.toPandas()[["id_a", "id_b", "inter", "uni", "iou_e5"]]
        .sort_values(["id_a", "id_b"], ignore_index=True)
    )


@pytest.fixture(scope="module")
def corpus(spark):
    df = with_footprint(synth.images(spark, SF)).select(
        F.col("image_id").alias("fid"), "fp_w", "fp_s", "fp_e", "fp_n"
    )
    return df, df.toPandas()


@pytest.mark.parametrize("thr", [30, 50, 75])
def test_exact_vs_bruteforce(corpus, thr):
    df, p = corpus
    got = _got(footprint_iou_pairs(df, id_col="fid", min_iou_pct=thr))
    want = _brute_pairs(p, thr)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    if thr <= 50:
        assert len(want) > 0  # the hot cluster guarantees qualifying pairs


def test_cell_size_invariance(corpus):
    """Shrinking cells far below the bbox diameter (boxes span up to ~6x6
    cells) must not change the output: bucketing is candidate generation
    only, and canonical-cell reporting stays single-shot."""
    df, p = corpus
    want = _brute_pairs(p, 50)
    for cell in (500, 1300, 10_000):
        got = _got(footprint_iou_pairs(df, id_col="fid", min_iou_pct=50, cell_micro=cell))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_no_duplicate_pairs(corpus):
    df, _ = corpus
    out = footprint_iou_pairs(df, id_col="fid", min_iou_pct=30, cell_micro=700)
    assert out.groupBy("id_a", "id_b").count().where("count > 1").count() == 0


def _frame(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["fid", "fp_w", "fp_s", "fp_e", "fp_n"])
    )


def test_geometry_edges(spark):
    df = _frame(
        spark,
        [
            ("a", 0.0, 0.0, 1.0, 1.0),
            ("b", 0.0, 0.0, 1.0, 1.0),      # identical twin of a
            ("c", 1.0, 0.0, 2.0, 1.0),      # abuts a on its east edge
            ("d", 0.25, 0.25, 0.75, 0.75),  # contained in a, IoU = 0.25
            ("e", 5.0, 5.0, 5.0, 6.0),      # zero-width
        ],
    )
    out = _got(footprint_iou_pairs(df, id_col="fid", min_iou_pct=25))
    # identical pair at exactly IoU 1; containment at exactly 25%
    assert list(out["id_a"]) == ["a", "a", "b"]
    assert list(out["id_b"]) == ["b", "d", "d"]
    ab = out[(out.id_a == "a") & (out.id_b == "b")].iloc[0]
    assert ab["iou_e5"] == 100_000 and ab["inter"] == ab["uni"]
    ad = out[(out.id_a == "a") & (out.id_b == "d")].iloc[0]
    assert ad["iou_e5"] == 25_000
    # abutting boxes never pair, zero-area boxes never pair
    assert "c" not in set(out.id_a) | set(out.id_b)
    assert "e" not in set(out.id_a) | set(out.id_b)


def test_bad_params_raise(spark):
    df = _frame(spark, [("a", 0.0, 0.0, 1.0, 1.0)])
    with pytest.raises(ValueError):
        footprint_iou_pairs(df, id_col="fid", min_iou_pct=0)
    with pytest.raises(ValueError):
        footprint_iou_pairs(df, id_col="fid", min_iou_pct=101)
    with pytest.raises(ValueError):
        footprint_iou_pairs(df, id_col="fid", cell_micro=0)


# --- footprint_union_area ----------------------------------------------------

from stac_catalog_builder_spark.operators.overlap import (  # noqa: E402
    footprint_union_area,
)


def _ua_frame(spark, rows):
    return spark.createDataFrame(
        rows, "g string, fp_w double, fp_s double, fp_e double, fp_n double"
    )


def _paint_area(rows, g):
    grid = np.zeros((2400, 2400), dtype=bool)
    n = 0
    for gg, x1, y1, x2, y2 in rows:
        if gg == g and x2 > x1 and y2 > y1:
            grid[int(x1) : int(x2), int(y1) : int(y2)] = True
            n += 1
    return n, int(grid.sum())


def test_union_area_exact_vs_paint_oracle(spark):
    """120 random boxes per group + identical/contained/abutting/degenerate
    pathologies: the dissolved area must equal a brute-force pixel paint
    exactly (integer lattice at scale=1)."""
    rng = np.random.RandomState(7)
    rows = []
    for g in ("a", "b"):
        for _ in range(120):
            x1, y1 = rng.randint(0, 1500, 2)
            w, h = rng.randint(1, 400, 2)
            rows.append((g, float(x1), float(y1), float(x1 + w), float(y1 + h)))
    rows += [("a", 10.0, 10.0, 20.0, 20.0)] * 3  # identical stack
    rows += [
        ("a", 12.0, 12.0, 14.0, 14.0),  # contained
        ("a", 20.0, 10.0, 30.0, 20.0),  # abutting (no double count, no gap)
        ("a", 50.0, 50.0, 50.0, 60.0),  # zero width -> dropped
    ]
    df = _ua_frame(spark, rows)
    out = {
        r.g: r
        for r in footprint_union_area(
            df, ["g"], scale=1, cell_micro=300, lon_offset=0.0, lat_offset=0.0
        ).collect()
    }
    for g in ("a", "b"):
        n, area = _paint_area(rows, g)
        assert out[g].n_boxes == n
        assert out[g].union_area == area, g
        assert out[g].hull_area >= out[g].union_area


def test_union_area_cell_size_invariant(spark):
    """The grid decomposition must not affect the result — cells tile the
    plane and clipped contributions are disjoint, so any cell size gives
    the same exact union (incl. boxes spanning many cells)."""
    rng = np.random.RandomState(11)
    rows = [
        (
            "g",
            float(x1 := rng.randint(0, 900)),
            float(y1 := rng.randint(0, 900)),
            float(x1 + rng.randint(1, 700)),
            float(y1 + rng.randint(1, 700)),
        )
        for _ in range(80)
    ]
    df = _ua_frame(spark, rows)
    vals = [
        footprint_union_area(
            df, ["g"], scale=1, cell_micro=cm, lon_offset=0.0, lat_offset=0.0
        ).collect()[0]
        for cm in (100, 512, 10_000)
    ]
    assert len({(v.union_area, v.hull_area, v.n_boxes) for v in vals}) == 1
    n, area = _paint_area(rows, "g")
    assert vals[0].union_area == area


def test_union_area_negative_overhang_exact(spark):
    """r6 regression: a footprint whose half-extent overhangs the domain
    edge (fp_w < -180 => negative micro coords) must still be EXACT and
    cell-size invariant. Spark's truncating ``div`` mis-celled negative
    coordinates, losing cell-size-DEPENDENT slivers (measured at sf0.1:
    three different union areas at cells 2600/650/325); cell assignment
    now uses true floor division."""
    rng = np.random.RandomState(5)
    rows = []
    for _ in range(60):
        # boxes straddling x=0 and y=0 (the -180 / -90 analogue at offset 0)
        x1 = float(rng.randint(-500, 200))
        y1 = float(rng.randint(-500, 200))
        rows.append(("g", x1, y1, x1 + rng.randint(1, 400), y1 + rng.randint(1, 400)))
    df = _ua_frame(spark, rows)
    vals = [
        footprint_union_area(
            df, ["g"], scale=1, cell_micro=cm, lon_offset=0.0, lat_offset=0.0
        ).collect()[0]
        for cm in (64, 300, 7_000)
    ]
    assert len({(v.union_area, v.hull_area) for v in vals}) == 1
    # paint oracle, shifted to positive indices for the canvas only
    shifted = [(g, x1 + 500, y1 + 500, x2 + 500, y2 + 500) for g, x1, y1, x2, y2 in rows]
    n, area = _paint_area(shifted, "g")
    assert vals[0].union_area == area


def test_iou_pairs_negative_coords_exact(spark):
    """Same r6 floor-division regression for the IoU pair join: boxes with
    negative micro coords must produce exactly the brute-force pair set,
    once each (canonical-cell dedup must hold on negative cells too)."""
    rng = np.random.RandomState(9)
    boxes = []
    for i in range(80):
        x1 = int(rng.randint(-900, 300))
        y1 = int(rng.randint(-900, 300))
        boxes.append((f"b{i:03d}", x1, y1, x1 + int(rng.randint(1, 600)), y1 + int(rng.randint(1, 600))))
    df = spark.createDataFrame(
        [(i, float(x1), float(y1), float(x2), float(y2)) for i, x1, y1, x2, y2 in boxes],
        "image_id string, fp_w double, fp_s double, fp_e double, fp_n double",
    )
    got = {
        (r.id_a, r.id_b)
        for r in footprint_iou_pairs(
            df, min_iou_pct=30, scale=1, cell_micro=256,
            lon_offset=0.0, lat_offset=0.0,
        ).collect()
    }
    want = set()
    for i in range(len(boxes)):
        for j in range(i + 1, len(boxes)):
            a, b = boxes[i], boxes[j]
            iw = min(a[3], b[3]) - max(a[1], b[1])
            ih = min(a[4], b[4]) - max(a[2], b[2])
            if iw <= 0 or ih <= 0:
                continue
            inter = iw * ih
            uni = (a[3] - a[1]) * (a[4] - a[2]) + (b[3] - b[1]) * (b[4] - b[2]) - inter
            if inter * 100 >= 30 * uni:
                want.add(tuple(sorted((a[0], b[0]))))
    assert got == want


def test_union_area_all_degenerate_group(spark):
    """A group whose boxes are all zero-area reports n_boxes=0 via absence;
    a group with no overlap at all sums box areas exactly."""
    rows = [
        ("d", 5.0, 5.0, 5.0, 9.0),  # zero width
        ("s", 0.0, 0.0, 10.0, 10.0),
        ("s", 20.0, 20.0, 30.0, 25.0),
    ]
    out = footprint_union_area(
        _ua_frame(spark, rows), ["g"], scale=1, cell_micro=64,
        lon_offset=0.0, lat_offset=0.0,
    ).collect()
    assert {r.g for r in out} == {"s"}  # degenerate-only group has no rows
    s = next(r for r in out if r.g == "s")
    assert s.union_area == 100 + 50 and s.n_boxes == 2

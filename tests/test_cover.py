"""Compact-cover soundness: the multi-res cover must expand back to EXACTLY
the flat fine-res cell set (disjoint, complete), be minimal (no complete
4-sibling group), and actually compress."""

from __future__ import annotations

from collections import Counter

from stac_catalog_builder_spark import synth
from stac_catalog_builder_spark.functions.cells import grid_cover_bbox, grid_decode_np
from stac_catalog_builder_spark.operators.cover import compact_cover

SF = "/root/testdata/sf0.001"
RES, MIN_RES = 7, 3


def _expand(res: int, gx: int, gy: int, to_res: int):
    """All res-``to_res`` descendants of cell (res, gx, gy)."""
    b = 1 << (to_res - res)
    for dx in range(b):
        for dy in range(b):
            yield (gx * b + dx, gy * b + dy)


def test_compact_cover_expands_to_flat_cover_exactly(spark):
    bnd = synth.boundaries(spark, SF)
    rows = compact_cover(bnd, res=RES, min_res=MIN_RES).collect()
    bboxes = {
        r["tile_id"]: (r["bbox_w"], r["bbox_s"], r["bbox_e"], r["bbox_n"])
        for r in bnd.collect()
    }
    per_tile: dict[str, list] = {}
    for r in rows:
        assert MIN_RES <= r["res"] <= RES
        per_tile.setdefault(r["tile_id"], []).append((r["res"], r["gx"], r["gy"]))

    assert set(per_tile) == set(bboxes)
    for tile_id, cells in per_tile.items():
        expanded = Counter()
        for res, gx, gy in cells:
            expanded.update(_expand(res, gx, gy, RES))
        # disjoint: no fine cell covered twice
        assert max(expanded.values()) == 1, tile_id
        # complete and exact: same fine set as the flat cover
        flat = grid_cover_bbox(*bboxes[tile_id], RES)
        flat_xy = {tuple(map(int, grid_decode_np(c)[1:])) for c in flat}
        assert set(expanded) == flat_xy, tile_id
        # it actually compresses (these tiles are ~900 fine cells)
        assert len(cells) < len(flat), tile_id


def test_compact_cover_minimal_no_complete_sibling_groups(spark):
    rows = compact_cover(
        synth.boundaries(spark, SF), res=RES, min_res=MIN_RES
    ).collect()
    by_tile: dict[str, set] = {}
    for r in rows:
        by_tile.setdefault(r["tile_id"], set()).add((r["res"], r["gx"], r["gy"]))
    for tile_id, cells in by_tile.items():
        for res, gx, gy in cells:
            if res == MIN_RES:
                continue
            siblings = {
                (res, (gx & ~1) + dx, (gy & ~1) + dy)
                for dx in (0, 1)
                for dy in (0, 1)
            }
            # a complete sibling group should have been replaced by its parent
            assert not siblings <= cells, (tile_id, res, gx, gy)


def test_compact_cover_validates_res(spark):
    import pytest

    bnd = synth.boundaries(spark, SF)
    with pytest.raises(ValueError):
        compact_cover(bnd, res=5, min_res=6)

"""Patch-grid extraction: images -> georeferenced training patches.

Vision training (ViT tokenization, SAM tiling, super-resolution crops)
consumes fixed-size patches, not whole scenes; a geospatial catalogue also
needs each patch's FOOTPRINT so patches can be spatially joined, deduped and
split exactly like scenes. The reference's closest surface is the raster
bounds-from-transform mapping (stacbuilder/mapper.py:138-144, one bbox per
asset); this operator produces the per-patch equivalent of that affine
mapping without touching a single pixel.

Scale design: pure map-side work — two tiny ``sequence`` explodes per image
(the patch lattice), integer pixel arithmetic, and the pixel->geo affine as
exact integer divisions on the micro-degree lattice (the same 1/40000-degree
quantization the footprint-IoU join uses). Zero shuffles, zero Python, zero
pixel decodes; output size is the patch count, known in advance from (w, h).
Edge handling follows the SAM/SWIN convention: anchored ``stride`` grid plus
a tail patch flush with each edge when the grid does not cover it (dropped
again by ``array_distinct`` when it coincides with an aligned start).
Images smaller than the patch in either axis emit nothing.

DuckDB replays everything value-exactly (tests/test_parity_rowsonly.py):
``sequence``/``transform``/``array_distinct`` <-> ``generate_series`` /
``list_transform`` / ``list_distinct``, and the affine is integer division.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# micro-degree lattice shared with operators/overlap.py (1/40000 deg)
MICRO_PER_DEG = 40000.0


def _starts(extent: Column, patch: int, stride: int) -> Column:
    """Patch start offsets along one axis: 0, stride, 2*stride, ... plus the
    flush-with-edge tail ``extent - patch``; sorted distinct int array."""
    aligned = F.transform(
        F.sequence(F.lit(0), F.floor((extent - patch) / stride).cast("int")),
        lambda i: i * stride,
    )
    return F.array_sort(
        F.array_distinct(F.concat(aligned, F.array((extent - patch).cast("int"))))
    )


def patch_grid(
    df: DataFrame,
    patch: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Explode each image into its georeferenced patch lattice.

    Input needs ``image_id, w, h`` plus the footprint bbox ``fp_w, fp_s,
    fp_e, fp_n`` (degrees — ``operators.footprints.with_footprint``).
    Output, one row per patch:
    - ``px, py``: pixel origin (top-left, row-major y-down like the raster);
    - ``patch_id``: dense row-major index over the per-image lattice;
    - ``g_w_u, g_s_u, g_e_u, g_n_u``: patch bbox on the micro-degree
      integer lattice. The y axis flips (pixel row 0 is the NORTH edge),
      and bounds are exact integer interpolation of the image bbox:
      ``g_w_u = xw + px * (xe - xw) div w``.
    """
    if patch < 1 or stride < 1:
        raise ValueError(f"patch and stride must be >= 1, got {patch}, {stride}")
    base = df.where((F.col("w") >= patch) & (F.col("h") >= patch)).select(
        "image_id",
        "w",
        "h",
        F.floor((F.col("fp_w") + 180.0) * MICRO_PER_DEG + 0.5).alias("xw"),
        F.floor((F.col("fp_e") + 180.0) * MICRO_PER_DEG + 0.5).alias("xe"),
        F.floor((F.col("fp_s") + 90.0) * MICRO_PER_DEG + 0.5).alias("ys"),
        F.floor((F.col("fp_n") + 90.0) * MICRO_PER_DEG + 0.5).alias("yn"),
    )
    xs = _starts(F.col("w"), patch, stride)
    ys_arr = _starts(F.col("h"), patch, stride)
    lat = base.select(
        "*",
        F.size(xs).alias("nx_p"),
        F.posexplode(ys_arr).alias("yi", "py"),
    ).select(
        "*",
        F.posexplode(xs).alias("xi", "px"),
    )
    return lat.select(
        "image_id",
        (F.col("yi") * F.col("nx_p") + F.col("xi")).alias("patch_id"),
        "px",
        "py",
        F.expr(f"xw + px * (xe - xw) div w").alias("g_w_u"),
        F.expr(f"xw + (px + {patch}) * (xe - xw) div w").alias("g_e_u"),
        # pixel row 0 = north edge: south bound comes from the LOWER pixel row
        F.expr(f"yn - (py + {patch}) * (yn - ys) div h").alias("g_s_u"),
        F.expr(f"yn - py * (yn - ys) div h").alias("g_n_u"),
    )

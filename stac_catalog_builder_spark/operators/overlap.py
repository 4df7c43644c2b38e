"""Footprint-overlap (IoU) self-join: near-duplicate scenes by geometry.

The reference groups assets only by EXACT bbox equality
(stacbuilder/builder.py:780-793) — two acquisitions of the same ground
footprint that differ by a sub-pixel registration shift land in different
groups and are never recognized as covering the same scene.  At catalogue
scale the question a curator actually asks is geometric: *which pairs of
images cover (almost) the same ground?* — i.e. bbox intersection-over-union
above a threshold.  That is also the training-data question: near-identical
revisits of one footprint are the image-side analogue of near-duplicate
documents, and their pairs feed the same connected-components grouping
(operators/graph.py) the text side uses.

Scale design (the all-pairs O(n^2) join is the thing to avoid):

- **Exact integer geometry.**  Coordinates are quantized once to a micro
  lattice (``floor((x + offset) * scale + 0.5)`` — the engine-portable
  rounding from the WKT/money oracles); every intersection test, area and
  IoU comparison after that is pure int64 arithmetic — bit-identical in
  Spark, DuckDB and numpy, no float epsilon anywhere.
- **Grid-bucketed candidates.**  Each bbox is exploded to the cells of a
  coarse grid it touches (two tiny ``sequence`` explodes — with
  ``cell_micro`` at least the bbox diameter that is <= 4 cells per row);
  candidate pairs are the rows sharing a cell: a plain self equi-join on
  the cell key, shuffled once, AQE-skew-splittable.  Nothing quadratic
  crosses the wire except genuinely co-located rows.
- **Canonical-cell pair dedup — no ``distinct``.**  A pair whose bboxes
  share k cells would surface k times; instead of a distinct (a second
  full shuffle of the pair set) each pair is emitted ONLY from the cell
  containing the south-west corner of the *intersection* rectangle.  That
  corner lies in both bboxes by construction, so exactly one of the shared
  cells claims the pair: the join's output is duplicate-free map-side.
  (This is the classic PBSM/grid-join reporting trick, e.g. Patel &
  DeWitt SIGMOD'96 §3.2.)
- **Skew**: a dense revisit stack makes its cells hot; the join is a
  self equi-join so AQE's skew split applies directly, and ``cell_micro``
  is the structural lever (smaller cells spread a stack over more keys at
  the cost of more cover rows per bbox).

IoU threshold as cross-multiplication: ``inter * 100 >= min_iou_pct *
union`` — exact, no division.  The reported ``iou_e5`` is the integer
``(inter * 100000) div union`` (floor), again division-free across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# default micro-degree lattice: 1/40000 deg (~2.8 m at the equator) is the
# LCM of the synthetic corpus lattices (1/1000 cold, 1/10000 hot jitter,
# 1/8000 pixel half-extents) so the quantization is exact on test data; any
# scale works for real data (it only sets the rounding granularity).
DEFAULT_SCALE = 40_000
# default cell: 2600 micro = 0.065 deg, just above the largest synthetic
# footprint diameter (256 px * 0.000125 deg/px * 2 halves = 0.064 deg), so a
# bbox touches at most 2x2 cells.
DEFAULT_CELL_MICRO = 2_600
# union-area default is SMALLER: with the full-cover short circuit the slab
# fold runs only on boundary cells, so smaller cells make more interior
# cells prunable — the r6 re-study (OPTIMIZATION_r06.md) measured 1300 best
# (interleaved at sf0.1: 2600 -> 5.7s, 1300 -> 3.4-4.6s, 650 -> 4.1-5.0s;
# the r5 study's small-cells-lose result only held without the prune).
# Results are cell-size INVARIANT (pytest-pinned), so this is plan-only.
DEFAULT_UNION_CELL_MICRO = 1_300


def _micro(col: Column, offset: float, scale: int) -> Column:
    """Engine-portable quantization to the integer micro lattice.

    ``floor((x + offset) * scale + 0.5)`` — one IEEE add, one multiply, one
    floor, identical in Spark/DuckDB/numpy (rounding-mode independent, unlike
    round()).  ``offset`` shifts coordinates non-negative for points ON the
    [-180, 180) x [-90, 90) domain; footprint HALVES can still overhang it
    (a scene centered at lon -179.99 has fp_w < -180), so cell assignment
    must use true FLOOR division (``_floor_div``) — Spark's ``div``
    truncates toward zero and silently mis-cells the overhang (r6 find:
    cell-size-DEPENDENT union areas at sf0.1; DuckDB's ``//`` floors, so
    the parity replays always had floor semantics).
    """
    return F.floor((col + F.lit(offset)) * F.lit(float(scale)) + F.lit(0.5))


def _floor_div(expr: str, d: int) -> str:
    """SQL text for exact floor division of a possibly-negative int64
    expression by a positive literal (pmod is always non-negative, so the
    adjusted numerator is an exact multiple and ``div`` cannot truncate)."""
    return f"(({expr}) - pmod(({expr}), {d})) div {d}"


def footprint_iou_pairs(
    df: DataFrame,
    id_col: str = "image_id",
    west: str = "fp_w",
    south: str = "fp_s",
    east: str = "fp_e",
    north: str = "fp_n",
    min_iou_pct: int = 50,
    scale: int = DEFAULT_SCALE,
    cell_micro: int = DEFAULT_CELL_MICRO,
    lon_offset: float = 180.0,
    lat_offset: float = 90.0,
) -> DataFrame:
    """All pairs of rows whose bbox IoU is >= ``min_iou_pct`` percent.

    Output: ``(id_a, id_b, inter, uni, iou_e5)`` with ``id_a < id_b``,
    areas in micro-lattice units^2 (int64), ``iou_e5 = (inter * 100000)
    div union``.  Each qualifying pair appears EXACTLY once (canonical-cell
    reporting — see module docstring), with no distinct pass.

    Zero-area bboxes never pair (IoU against anything is 0, and the strict
    ``<`` overlap test drops them before the arithmetic).  Caller bound:
    ``max bbox area * 100000 < 2^63`` (inter <= min area), i.e. areas up to
    ~9e13 micro^2 — at the default scale that is a bbox ~15 degrees on a
    side; pass a smaller ``scale`` for continent-sized footprints.
    """
    if not 0 < min_iou_pct <= 100:
        raise ValueError(f"min_iou_pct must be in (0, 100], got {min_iou_pct}")
    if cell_micro <= 0:
        raise ValueError(f"cell_micro must be positive, got {cell_micro}")
    c = F.lit(cell_micro)
    xw = _micro(F.col(west), lon_offset, scale)
    xe = _micro(F.col(east), lon_offset, scale)
    ys = _micro(F.col(south), lat_offset, scale)
    yn = _micro(F.col(north), lat_offset, scale)
    boxes = df.select(
        F.col(id_col).alias("fid"),
        xw.alias("xw"),
        xe.alias("xe"),
        ys.alias("ys"),
        yn.alias("yn"),
    ).where((F.col("xe") > F.col("xw")) & (F.col("yn") > F.col("ys")))
    # cells touched by the half-open box [xw, xe) x [ys, yn): east/north
    # edges are exclusive so an edge-abutting neighbor shares no cell unless
    # it actually overlaps. xe-1 >= xw is guaranteed by the filter above
    # (ANSI trap: an empty/descending sequence would default to step -1 and
    # fabricate cells).
    cells = boxes.select(
        "fid", "xw", "xe", "ys", "yn",
        F.explode(
            F.sequence(
                F.expr(_floor_div("xw", cell_micro)),
                F.expr(_floor_div("xe - 1", cell_micro)),
            )
        ).alias("cx"),
    ).select(
        "fid", "xw", "xe", "ys", "yn", "cx",
        F.explode(
            F.sequence(
                F.expr(_floor_div("ys", cell_micro)),
                F.expr(_floor_div("yn - 1", cell_micro)),
            )
        ).alias("cy"),
    )
    a, b = cells.alias("a"), cells.alias("b")
    ix_w = F.greatest(F.col("a.xw"), F.col("b.xw"))
    iy_s = F.greatest(F.col("a.ys"), F.col("b.ys"))
    ix_e = F.least(F.col("a.xe"), F.col("b.xe"))
    iy_n = F.least(F.col("a.yn"), F.col("b.yn"))
    inter = (ix_e - ix_w) * (iy_n - iy_s)
    area_a = (F.col("a.xe") - F.col("a.xw")) * (F.col("a.yn") - F.col("a.ys"))
    area_b = (F.col("b.xe") - F.col("b.xw")) * (F.col("b.yn") - F.col("b.ys"))
    uni = area_a + area_b - inter
    pairs = a.join(
        b,
        (F.col("a.cx") == F.col("b.cx"))
        & (F.col("a.cy") == F.col("b.cy"))
        & (F.col("a.fid") < F.col("b.fid"))
        # positive-area intersection
        & (ix_w < ix_e)
        & (iy_s < iy_n)
        # canonical cell: only the cell holding the intersection's SW corner
        # reports the pair (it is covered by both boxes, so exactly one of
        # the shared cells matches) — duplicate-free without a distinct
        & (F.col("a.cx") == F.expr(_floor_div("greatest(a.xw, b.xw)", cell_micro)))
        & (F.col("a.cy") == F.expr(_floor_div("greatest(a.ys, b.ys)", cell_micro)))
        # IoU threshold, cross-multiplied (exact)
        & (inter * F.lit(100) >= F.lit(min_iou_pct) * uni),
        "inner",
    )
    return pairs.select(
        F.col("a.fid").alias("id_a"),
        F.col("b.fid").alias("id_b"),
        inter.alias("inter"),
        uni.alias("uni"),
    ).withColumn(
        # exact integer floor-division (both operands non-negative); a
        # floor(double/double) could round across an integer boundary
        "iou_e5",
        F.expr("(inter * 100000) div uni"),
    )


def footprint_union_area(
    df: DataFrame,
    group_cols: list[str],
    west: str = "fp_w",
    south: str = "fp_s",
    east: str = "fp_e",
    north: str = "fp_n",
    scale: int = DEFAULT_SCALE,
    cell_micro: int = DEFAULT_UNION_CELL_MICRO,
    lon_offset: float = 180.0,
    lat_offset: float = 90.0,
) -> DataFrame:
    """EXACT dissolved footprint area per group: the area of the UNION of
    the group's bboxes, in micro-lattice units^2 (int64) — no raster
    approximation, no float epsilon.

    The reference publishes a collection's spatial extent as the bbox HULL
    (stacbuilder/builder.py:484-510); for overlapping acquisition footprints
    the hull wildly overstates real ground coverage. This computes the
    measure a curator actually wants ("how much ground does this collection
    truly cover?") plus the hull for the compactness ratio.

    Exact distributed decomposition (no UDF, no driver geometry):

    1. quantize to the shared integer micro lattice, drop degenerate boxes,
       and DISTINCT the coordinates per group (identical revisit footprints
       collapse before any quadratic step — the star-collapse idea);
    2. explode each box to the coarse grid cells it touches and CLIP to the
       half-open cell; cells tile the plane, so per-cell union areas are
       disjoint and sum exactly to the global union;
    3. within each (group, cell): x-SLABS from the distinct clipped x
       coordinates (classic slab decomposition — a clipped box either spans
       a slab entirely or misses it), one lead() window over the
       dimension-sized event table;
    4. boxes join slabs they span (equi on (group, cell) + two range
       predicates), and per slab the covered y-length is the SAME running-
       max gaps-and-islands fold as interval_coverage — exact int64;
    5. contribution = covered_y * slab_width, summed per group, plus one
       map-side-combined pass for n_boxes and the hull.

    Scale/skew: everything is keyed by (group, cell); per-cell cost is
    O(boxes_in_cell * slabs_in_cell) worst case, so ``cell_micro`` is the
    density lever (same as footprint_iou) and AQE skew-splits the slab
    join's shuffle. The exact-dup DISTINCT bounds the common revisit-stack
    pathology before the quadratic step.
    """
    c = F.lit(cell_micro)
    xw = _micro(F.col(west), lon_offset, scale)
    xe = _micro(F.col(east), lon_offset, scale)
    ys = _micro(F.col(south), lat_offset, scale)
    yn = _micro(F.col(north), lat_offset, scale)
    raw = df.select(
        *group_cols,
        xw.alias("xw"),
        xe.alias("xe"),
        ys.alias("ys"),
        yn.alias("yn"),
    ).where((F.col("xe") > F.col("xw")) & (F.col("yn") > F.col("ys")))
    stats = raw.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_boxes"),
        (
            (F.max("xe") - F.min("xw")) * (F.max("yn") - F.min("ys"))
        ).alias("hull_area"),
    )
    boxes = raw.distinct()  # identical footprints cannot change the union
    clipped = (
        boxes.withColumn(
            "cx",
            F.explode(
                F.sequence(
                    F.expr(_floor_div("xw", cell_micro)),
                    F.expr(_floor_div("xe - 1", cell_micro)),
                )
            ),
        )
        .withColumn(
            "cy",
            F.explode(
                F.sequence(
                    F.expr(_floor_div("ys", cell_micro)),
                    F.expr(_floor_div("yn - 1", cell_micro)),
                )
            ),
        )
        .select(
            *group_cols,
            "cx",
            "cy",
            F.greatest(F.col("xw"), F.col("cx") * c).alias("bxw"),
            F.least(F.col("xe"), (F.col("cx") + 1) * c).alias("bxe"),
            F.greatest(F.col("ys"), F.col("cy") * c).alias("bys"),
            F.least(F.col("yn"), (F.col("cy") + 1) * c).alias("byn"),
        )
    )
    cell_keys = [*group_cols, "cx", "cy"]
    # FULL-COVER short circuit (r6): a cell fully covered by >= 1 box
    # contributes exactly cell_micro^2 — no slab machinery. In a dense
    # revisit stack almost every interior cell is fully covered by some
    # box, so the quadratic (boxes_in_cell x slabs_in_cell) fold runs only
    # on cells crossing the union's BOUNDARY: O(perimeter) cells instead
    # of O(area). This also flips the cell-size economics the r5 study
    # measured (small cells lost on slab-join volume): with the interior
    # pruned, smaller cells make MORE cells interior — see the r6 study in
    # OPTIMIZATION_r06.md for the re-measured optimum.
    full_cover = (
        (F.col("bxw") == F.col("cx") * c)
        & (F.col("bxe") == (F.col("cx") + 1) * c)
        & (F.col("bys") == F.col("cy") * c)
        & (F.col("byn") == (F.col("cy") + 1) * c)
    )
    fulls = clipped.where(full_cover).select(*cell_keys).distinct()
    area_full = fulls.groupBy(*group_cols).agg(
        (F.count(F.lit(1)) * c * c).alias("_a")
    )
    partial = clipped.join(fulls, cell_keys, "left_anti")
    clipped = partial
    events = (
        clipped.select(*cell_keys, F.col("bxw").alias("x"))
        .unionAll(clipped.select(*cell_keys, F.col("bxe").alias("x")))
        .distinct()
    )
    slab_w = Window.partitionBy(*cell_keys).orderBy("x")
    slabs = events.select(
        *cell_keys,
        F.col("x").alias("sx1"),
        F.lead("x").over(slab_w).alias("sx2"),
    ).where(F.col("sx2").isNotNull())
    covered = slabs.join(
        clipped,
        on=[*cell_keys],
    ).where((F.col("bxw") <= F.col("sx1")) & (F.col("bxe") >= F.col("sx2")))
    fold_keys = [*cell_keys, "sx1", "sx2"]
    fw = (
        Window.partitionBy(*fold_keys)
        .orderBy("bys", "byn")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_max = F.max("byn").over(fw)
    seg = F.greatest(
        F.lit(0), F.col("byn") - F.greatest(F.col("bys"), F.coalesce(prev_max, F.col("bys")))
    )
    area = (
        covered.select(*fold_keys, seg.alias("_seg"))
        .groupBy(*fold_keys)
        .agg(F.sum("_seg").alias("_ylen"))
        .select(
            *group_cols,
            (F.col("_ylen") * (F.col("sx2") - F.col("sx1"))).alias("_a"),
        )
        .unionAll(area_full.select(*group_cols, "_a"))
        .groupBy(*group_cols)
        .agg(F.sum("_a").alias("union_area"))
    )
    return stats.join(area, on=group_cols, how="left").select(
        *group_cols,
        "n_boxes",
        F.coalesce(F.col("union_area"), F.lit(0)).alias("union_area"),
        "hull_area",
    )

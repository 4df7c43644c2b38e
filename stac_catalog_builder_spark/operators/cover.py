"""Compact multi-resolution cell covers (the S2 RegionCoverer shape).

The partitioned PIP join covers every polygon at ONE resolution
(operators/spatial_join.py cover_gen), which is the right trade for
polygons of similar size — but a continental polygon at a fine res explodes
into millions of cover cells (its join-key dimension rows), while a coarse
res bloats every small polygon's candidate set. The compact cover is the
classic fix (S2's RegionCoverer; H3 compact_cells): cover the region with
the COARSEST cells that fit, refining only at the boundary — cell count
drops from O(area / fine_cell) to O(perimeter / fine_cell + levels).

This implementation covers the integer res-R cell rectangle of a bbox with
the minimal set of quadtree ancestors (each res-r grid cell splits into
exactly 2x2 res-(r+1) cells — functions/cells.py grid encoding):

    emit cell c (res r)  iff  c is fully contained  AND
                              (r == min_res  OR  parent(c) is not contained)

Containment of an aligned block inside an integer rectangle is two integer
ceil/floor divisions, so the whole cover generates as pure JVM column
algebra — sequence-explode over (res, X, Y), no UDF, no driver loop — and
DuckDB replays it bit-for-bit (oracles.sql_compact_cover). Soundness (the
emitted cells' res-R descendants partition the rectangle exactly, no
overlaps, nothing missed) is proven in pytest by expanding the cover back
to res R and comparing with the flat grid_cover_bbox cell set per polygon;
minimality by asserting no complete 4-sibling group survives.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.cells import GRID_RES_BITS, GRID_X_BITS


def compact_cover(
    bnd: DataFrame,
    res: int,
    min_res: int = 0,
    keys: list[str] | None = None,
) -> DataFrame:
    """Compact cover rows (keys..., res, gx, gy, cell) for each bbox row of
    ``bnd`` (columns bbox_w/bbox_s/bbox_e/bbox_n). ``res`` is the finest
    resolution (the flat cover this compacts); emitted cells satisfy
    min_res <= cell res <= res. Fully distributed: cost is one map-side
    explode per polygon, output rows ~ perimeter cells + O(levels)."""
    if not 0 <= min_res <= res:
        raise ValueError(f"need 0 <= min_res <= res: {min_res}, {res}")
    keys = keys or ["tile_id"]
    nx, ny = 2 ** (res + 1), 2**res

    def g(col: str, lo: float, span: float, n: int):
        return (
            F.least(
                F.greatest(
                    F.floor((F.col(col) + F.lit(lo)) / F.lit(span) * F.lit(n)),
                    F.lit(0),
                ),
                F.lit(n - 1),
            )
        ).cast("bigint")

    rect = bnd.select(
        *keys,
        g("bbox_w", 180.0, 360.0, nx).alias("gx0"),
        g("bbox_e", 180.0, 360.0, nx).alias("gx1"),
        g("bbox_s", 90.0, 180.0, ny).alias("gy0"),
        g("bbox_n", 90.0, 180.0, ny).alias("gy1"),
    )
    levels = rect.select(
        *keys,
        "gx0",
        "gx1",
        "gy0",
        "gy1",
        F.explode(F.sequence(F.lit(min_res), F.lit(res))).alias("res"),
    )
    # block size of a res-r cell in res-R cells, and the parent's; contained
    # cell range = ceil(g0 / B) .. floor((g1 + 1) / B) - 1, all exact int64
    sized = levels.selectExpr(
        *keys,
        "gx0",
        "gx1",
        "gy0",
        "gy1",
        "res",
        f"shiftleft(cast(1 as bigint), cast({res} - res as int)) AS b",
    ).selectExpr(
        *keys,
        "res",
        "gx0",
        "gx1",
        "gy0",
        "gy1",
        "(gx0 + b - 1) div b AS cx0",
        "(gx1 + 1) div b - 1 AS cx1",
        "(gy0 + b - 1) div b AS cy0",
        "(gy1 + 1) div b - 1 AS cy1",
        "(gx0 + 2 * b - 1) div (2 * b) AS pcx0",
        "(gx1 + 1) div (2 * b) - 1 AS pcx1",
        "(gy0 + 2 * b - 1) div (2 * b) AS pcy0",
        "(gy1 + 1) div (2 * b) - 1 AS pcy1",
    )
    cells = (
        sized.withColumn(
            "gx",
            F.explode(
                F.when(
                    F.col("cx0") <= F.col("cx1"),
                    F.sequence(F.col("cx0"), F.col("cx1")),
                ).otherwise(F.array().cast("array<bigint>"))
            ),
        )
        .withColumn(
            "gy",
            F.explode(
                F.when(
                    F.col("cy0") <= F.col("cy1"),
                    F.sequence(F.col("cy0"), F.col("cy1")),
                ).otherwise(F.array().cast("array<bigint>"))
            ),
        )
    )
    # parent-not-contained filter: parent coords are the halved cell coords
    kept = cells.where(
        (F.col("res") == F.lit(min_res))
        | ~(
            (F.expr("gx div 2") >= F.col("pcx0"))
            & (F.expr("gx div 2") <= F.col("pcx1"))
            & (F.expr("gy div 2") >= F.col("pcy0"))
            & (F.expr("gy div 2") <= F.col("pcy1"))
        )
    )
    return kept.select(
        *keys,
        "res",
        "gx",
        "gy",
        (
            F.col("res") * F.lit(2**GRID_RES_BITS)
            + F.col("gx") * F.lit(2**GRID_X_BITS)
            + F.col("gy")
        ).alias("cell"),
    )

"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship spatial-join + tile-assignment plan on
sf0.001; ``queries()`` exposes each implemented operator from SURVEY.md §2;
``oracle_sql()`` gives the DuckDB-equivalent SQL (same column names/types) for
every SQL-expressible query. Non-SQL-expressible ops (cell-ring kNN variant,
minhash/simhash, streaming) get rows-only checks or pytest-only coverage.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent))

from stac_catalog_builder_spark import oracles, synth
from stac_catalog_builder_spark.functions.cells import grid_cell_col
from stac_catalog_builder_spark.functions.geo import rect_ring
from stac_catalog_builder_spark.operators.footprints import with_footprint
from stac_catalog_builder_spark.operators.grouping import (
    collection_extents,
    collection_rollup,
    items_from_assets,
)
from stac_catalog_builder_spark.operators.knn import knn_join
from stac_catalog_builder_spark.operators.spatial_join import spatial_join_pip
from stac_catalog_builder_spark.operators.tiling import with_tile

SF0001 = "/root/testdata/sf0.001"


def _micro(col: str) -> F.Column:
    """Exact micro-degree BIGINT from a double (mirrors oracles._micro)."""
    return F.floor(F.col(col) * 100000.0 + F.lit(0.5)).cast("bigint")


def _images_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    return with_footprint(synth.images(spark, sf_dir))


def _boundary_polygons(spark: SparkSession, sf_dir: str) -> list[dict]:
    rows = synth.boundaries(spark, sf_dir).collect()
    polys = []
    for r in rows:
        rx, ry = rect_ring(r.bbox_w, r.bbox_s, r.bbox_e, r.bbox_n)
        polys.append(
            {
                "ring_x": rx,
                "ring_y": ry,
                "tile_id": r.tile_id,
                "collection_id": r.collection_id,
            }
        )
    return polys


def _assigned(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spatial_join_pip(_images_fp(spark, sf_dir), _boundary_polygons(spark, sf_dir))


# --------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: footprint derivation -> cell index -> PIP spatial join ->
    per-(collection, tile) extent aggregation. Returns the aggregate table."""
    assigned = _assigned(spark, SF0001)
    return collection_extents(assigned, ["collection_id", "tile_id"]).orderBy(
        "collection_id", "tile_id"
    )


# --------------------------------------------------------------------------
# queries() — one per operator; names stable across rounds


def q_footprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _images_fp(spark, sf_dir).select(
        "image_id", "phash", "w", "h", "fmt", "caption", "is_hot",
        "lon", "lat", "fp_w", "fp_s", "fp_e", "fp_n",
    )


def q_cell_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _images_fp(spark, sf_dir)
    return df.select(
        "image_id",
        grid_cell_col(F.col("lon"), F.col("lat"), 5).alias("cell_r5"),
        grid_cell_col(F.col("lon"), F.col("lat"), 7).alias("cell_r7"),
        grid_cell_col(F.col("lon"), F.col("lat"), 9).alias("cell_r9"),
    )


def q_tile_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    return with_tile(_images_fp(spark, sf_dir), zoom=6).select(
        "image_id", "tile_x", "tile_y", "zoom"
    )


def q_spatial_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _assigned(spark, sf_dir).select("image_id", "tile_id", "collection_id")


def q_extent_by_collection(spark: SparkSession, sf_dir: str) -> DataFrame:
    ext = collection_extents(_assigned(spark, sf_dir), ["collection_id"])
    return ext.select(
        "collection_id",
        F.col("n_assets"),
        F.floor(F.col("ext_w") * 100000.0 + 0.5).cast("bigint").alias("ext_w_u"),
        F.floor(F.col("ext_s") * 100000.0 + 0.5).cast("bigint").alias("ext_s_u"),
        F.floor(F.col("ext_e") * 100000.0 + 0.5).cast("bigint").alias("ext_e_u"),
        F.floor(F.col("ext_n") * 100000.0 + 0.5).cast("bigint").alias("ext_n_u"),
        F.unix_timestamp("dt_min").alias("dt_min_s"),
        F.unix_timestamp("dt_max").alias("dt_max_s"),
    )


def q_extent_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    roll = collection_rollup(_assigned(spark, sf_dir))
    return roll.select(
        "collection_id",
        "year",
        "n_assets",
        F.floor(F.col("ext_w") * 100000.0 + 0.5).cast("bigint").alias("ext_w_u"),
        F.floor(F.col("ext_s") * 100000.0 + 0.5).cast("bigint").alias("ext_s_u"),
        F.floor(F.col("ext_e") * 100000.0 + 0.5).cast("bigint").alias("ext_e_u"),
        F.floor(F.col("ext_n") * 100000.0 + 0.5).cast("bigint").alias("ext_n_u"),
    )


def q_item_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    items = items_from_assets(_images_fp(spark, sf_dir))
    return items.select(
        "item_id",
        "n_assets",
        "n_types",
        F.floor(F.col("ext_w") * 100000.0 + 0.5).cast("bigint").alias("ext_w_u"),
        F.floor(F.col("ext_s") * 100000.0 + 0.5).cast("bigint").alias("ext_s_u"),
        F.floor(F.col("ext_e") * 100000.0 + 0.5).cast("bigint").alias("ext_e_u"),
        F.floor(F.col("ext_n") * 100000.0 + 0.5).cast("bigint").alias("ext_n_u"),
        F.unix_timestamp("dt_min").alias("dt_min_s"),
    )


def q_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = knn_join(_images_fp(spark, sf_dir), synth.knn_queries(spark, sf_dir), k=5)
    return out.select("query_id", "rank", "image_id")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "footprints": q_footprints,
        "cell_assign": q_cell_assign,
        "tile_assign": q_tile_assign,
        "spatial_join": q_spatial_join,
        "extent_by_collection": q_extent_by_collection,
        "extent_rollup": q_extent_rollup,
        "item_grouping": q_item_grouping,
        "knn": q_knn,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "footprints": oracles.sql_footprints(),
        "cell_assign": oracles.sql_cell_assign(),
        "tile_assign": oracles.sql_tile_assign(zoom=6),
        "spatial_join": oracles.sql_spatial_join(),
        "extent_by_collection": oracles.sql_extent_by_collection(),
        "extent_rollup": oracles.sql_extent_rollup(),
        "item_grouping": oracles.sql_item_grouping(),
        "knn": oracles.sql_knn(k=5),
    }

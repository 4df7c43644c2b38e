"""Exploration previews — the reference's ``list_*`` CLI commands
(stacbuilder/commandapi.py:151-242) as bounded DataFrame previews of each
pipeline stage. Each returns a LIMITed DataFrame (never a full collect):

- ``list_input_files``  (commandapi.py:151-174): the raw scan
- ``list_asset_metadata`` (commandapi.py:177-203): derived asset rows
- ``list_items``        (commandapi.py:206-242): grouped item rows
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .. import synth
from ..operators.footprints import with_footprint
from ..operators.grouping import items_from_assets


def list_input_files(spark: SparkSession, sf_dir: str, max_files: int = 20) -> DataFrame:
    """First ``max_files`` input rows (id + format + dims), like the
    reference's collector preview with its ``max_files`` cap."""
    return (
        synth.images(spark, sf_dir)
        .select("image_id", "fmt", "w", "h")
        .orderBy("image_id")
        .limit(max_files)
    )


def list_asset_metadata(spark: SparkSession, sf_dir: str, max_assets: int = 20) -> DataFrame:
    """First ``max_assets`` derived asset-metadata rows (footprint closure
    applied — the _ensure_geoms analogue)."""
    return (
        with_footprint(synth.images(spark, sf_dir))
        .select(
            "image_id", "asset_type", "item_id", "datetime",
            "lon", "lat", "fp_w", "fp_s", "fp_e", "fp_n",
        )
        .orderBy("image_id")
        .limit(max_assets)
    )


def list_items(spark: SparkSession, sf_dir: str, max_items: int = 10) -> DataFrame:
    """First ``max_items`` grouped item rows."""
    items = items_from_assets(with_footprint(synth.images(spark, sf_dir)))
    return items.orderBy("item_id", "ext_w").limit(max_items)

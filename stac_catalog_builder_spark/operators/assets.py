"""Asset metadata surfaces: tags maps, band structs, datetime normalization.

Reference parity:

- **tags** ``dict[str,str]`` per asset (stacbuilder/metadata.py:149-150),
  sanitized to string->string for Arrow (metadata.py:322-323) and merged with
  override dicts where the override wins (``asset_metadata_args.update(...)``,
  mapper.py:182). Spark form: a ``MapType(string,string)`` column with
  ``map_concat`` override-merge (base keys shadowed by the override are
  filtered first — Spark's default duplicate-map-key policy is EXCEPTION, so
  the merge is made collision-free instead of relying on a session conf).
- **bands** ``List[BandMetadata]`` per asset (metadata.py:32-63, :152-153),
  populated from per-asset-type band configs driving the eo/raster STAC
  extensions (config.py:62-195). Spark form: an
  ``ArrayType(StructType(name, data_type, nodata, index))`` column attached
  by the broadcast config join.
- **datetime normalization cascade** ``check_datetime``
  (metadata.py:554-590): ISO string parse, naive -> UTC (the session runs
  with ``spark.sql.session.timeZone=UTC``), date -> midnight UTC. Spark
  form: a ``try_to_timestamp`` coalesce cascade — no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# tags (MapType surface)
# ---------------------------------------------------------------------------


def sanitize_tags(tags: Column) -> Column:
    """Coerce any map column to string->string — the reference's
    ``{str(k): str(v)}`` arrow-sanitation (metadata.py:322-323). (Spark map
    keys are non-null by construction, so only values need a null-safe cast.)"""
    return F.map_from_entries(
        F.transform(
            F.map_entries(tags),
            lambda e: F.struct(
                e["key"].cast("string").alias("key"),
                e["value"].cast("string").alias("value"),
            ),
        )
    )


def merge_tags(base: Column, override: Column) -> Column:
    """Dict-update semantics (override wins, mapper.py:182): base keys present
    in the override are removed before ``map_concat``, so the merge never
    trips Spark's duplicate-key EXCEPTION policy and needs no session conf."""
    kept = F.map_filter(base, lambda k, _: ~F.map_contains_key(override, k))
    return F.map_concat(kept, override)


def with_merged_tags(
    df: DataFrame, override: Column, tags_col: str = "tags", out_col: str = "tags"
) -> DataFrame:
    return df.withColumn(out_col, merge_tags(sanitize_tags(F.col(tags_col)), override))


# ---------------------------------------------------------------------------
# bands (nested-struct surface)
# ---------------------------------------------------------------------------


def attach_bands(assets: DataFrame, asset_config: DataFrame) -> DataFrame:
    """J1 + bands: broadcast the asset-config dimension (which carries the
    ``bands array<struct>`` column) onto every asset row by asset_type —
    the Spark analogue of ``populate_asset_extension`` (config.py:84-97)."""
    return assets.join(F.broadcast(asset_config), "asset_type", "inner")


def explode_bands(assets_with_bands: DataFrame, key_col: str = "image_id") -> DataFrame:
    """One row per (asset, band): the eo/raster extension rows of the STAC
    item output (reference metadata.py:312-325 serializes bands to
    list[dict]; here the list is a first-class nested column)."""
    return assets_with_bands.select(
        key_col, F.explode("bands").alias("band")
    ).select(
        key_col,
        F.col("band.name").alias("band_name"),
        F.col("band.data_type").alias("data_type"),
        F.col("band.nodata").alias("nodata"),
        F.col("band.index").alias("band_index"),
    )


# ---------------------------------------------------------------------------
# datetime normalization cascade
# ---------------------------------------------------------------------------

_DT_FORMATS = (
    "yyyy-MM-dd'T'HH:mm:ss",  # ISO with T separator
    "yyyy-MM-dd HH:mm:ss",    # naive timestamp (session TZ = UTC)
    "yyyy-MM-dd",             # bare date -> midnight UTC (metadata.py:584-590)
)


def normalize_datetime(s: Column) -> Column:
    """``check_datetime`` (metadata.py:554-590) as a coalesce cascade of
    ``try_to_timestamp`` probes: first matching format wins; unparseable
    strings stay NULL (caller decides whether that is an error)."""
    return F.coalesce(*[F.try_to_timestamp(s, F.lit(fmt)) for fmt in _DT_FORMATS])

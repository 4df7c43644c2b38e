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
from stac_catalog_builder_spark.session import read_parquet
from stac_catalog_builder_spark.functions.cells import grid_cell_col
from stac_catalog_builder_spark.functions.geo import rect_ring
from stac_catalog_builder_spark.operators import dedup, sampling, similarity, textops
from stac_catalog_builder_spark.operators.footprints import with_footprint
from stac_catalog_builder_spark.operators.grouping import (
    collection_extents,
    collection_rollup,
    items_from_assets,
)
from stac_catalog_builder_spark.operators import multimodal
from stac_catalog_builder_spark.operators.knn import knn_join, knn_join_cellring
from stac_catalog_builder_spark.operators.spatial_join import spatial_join_pip
from stac_catalog_builder_spark.operators.tiling import with_tile
from stac_catalog_builder_spark.plans import relational

SF0001 = "/root/testdata/sf0.001"


def _micro(col: str) -> F.Column:
    """Exact micro-degree BIGINT from a double (mirrors oracles._micro)."""
    return F.floor(F.col(col) * 100000.0 + F.lit(0.5)).cast("bigint")


def _images_fp(spark: SparkSession, sf_dir: str, fan_out: bool = False) -> DataFrame:
    # fan_out stays OFF for the JVM-only pipelines (measured, r6): the
    # single-row-group scan does serialize the first map stage, but at this
    # table width the repartition round trip costs more than the serial
    # projection it parallelizes (interleaved A/B: cell_assign 0.43->0.56,
    # knn 0.85->0.98, hll 3.0->3.8). Python-kernel consumers are the
    # exception — with_encoded_bytes fans out internally (10.5s -> 1.5s).
    return with_footprint(synth.images(spark, sf_dir, fan_out=fan_out))


def _boundary_polygons(spark: SparkSession, sf_dir: str) -> list[dict]:
    """Driver-side boundary dimension: 25 rectangles, consumed by the
    polygon-dim prep (numpy, driver-side) — so load it with a direct
    pyarrow read of nation.parquet instead of a Spark collect. The collect
    was one whole Spark job of pure overhead (~0.25-0.4s warm) paid by
    EVERY query that goes through ``_assigned``; the pyarrow read is ~5ms.
    Arithmetic replicates synth.boundaries bit-for-bit (same IEEE double
    ops in the same order; tests/test_boundary_polygons.py pins equality
    against the Spark-collect derivation, values and row order)."""
    import pyarrow.parquet as pq

    from stac_catalog_builder_spark.synth import (
        GRID_DLAT,
        GRID_DLON,
        GRID_LAT0,
        GRID_LON0,
        GRID_NX,
    )

    tab = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"]
    )
    polys = []
    for nk, rk in zip(
        tab.column("n_nationkey").to_pylist(), tab.column("n_regionkey").to_pylist()
    ):
        tx, ty = nk % GRID_NX, nk // GRID_NX
        rx, ry = rect_ring(
            GRID_LON0 + tx * GRID_DLON,
            GRID_LAT0 + ty * GRID_DLAT,
            GRID_LON0 + (tx + 1) * GRID_DLON,
            GRID_LAT0 + (ty + 1) * GRID_DLAT,
        )
        polys.append(
            {
                "ring_x": rx,
                "ring_y": ry,
                "tile_id": f"E{tx}N{ty}",
                "collection_id": f"coll_{rk}",
            }
        )
    return polys


def _assigned(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spatial_join_pip(_images_fp(spark, sf_dir), _boundary_polygons(spark, sf_dir))


def _knn_query_points(sf_dir: str):
    """kNN query dimension (25 rows) as a driver-side pandas frame. The knn
    operators collect the query dimension anyway (broadcast-var contract),
    so deriving it with a Spark plan spent one whole job (~0.25-0.4s warm)
    per calling query; this replicates synth.knn_queries bit-for-bit from a
    direct pyarrow read (tests/test_boundary_polygons.py pins values, order
    and dtypes against the Spark derivation)."""
    import pandas as pd
    import pyarrow.parquet as pq

    from stac_catalog_builder_spark.synth import (
        A_LAT,
        A_LON,
        HOT_JITTER_SCALE,
        HOT_JITTER_STEPS,
        HOT_LAT0,
        HOT_LON0,
        LAT_STEPS,
        LON_STEPS,
        M32,
        STEP_SCALE,
    )

    keys = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey"]
    ).column("n_nationkey").to_pylist()
    qid, qlon, qlat = [], [], []
    for n in keys:
        qk = n + 101
        h1, h2 = (qk * A_LON) % M32, (qk * A_LAT) % M32
        if n % 5 == 0:
            qlon.append(HOT_LON0 + (h1 % HOT_JITTER_STEPS) / HOT_JITTER_SCALE)
            qlat.append(HOT_LAT0 + (h2 % HOT_JITTER_STEPS) / HOT_JITTER_SCALE)
        else:
            qlon.append(-180.0 + (h1 % LON_STEPS) / STEP_SCALE)
            qlat.append(-60.0 + (h2 % LAT_STEPS) / STEP_SCALE)
        qid.append(f"q_{n:04d}")
    return pd.DataFrame({"query_id": qid, "qlon": qlon, "qlat": qlat})


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
    out = knn_join(_images_fp(spark, sf_dir), _knn_query_points(sf_dir), k=5)
    return out.select("query_id", "rank", "image_id")


# --- batch 4: path parsing / href / range join / windows / cells -----------


def _with_paths(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "asset_path",
        F.format_string(
            "/data/%s/%04d/%s_%04d-%02d.tif",
            F.col("asset_type"), F.col("year"), F.col("asset_type"),
            F.col("year"), F.col("month"),
        ),
    )


def q_pathparse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stac_catalog_builder_spark.operators import pathparse

    paths = _with_paths(synth.images(spark, sf_dir)).select("image_id", "asset_path")
    parsed = pathparse.parse_path_fields(
        paths,
        "asset_path",
        r"(?P<year>\d{4})-(?P<month>\d{2})\.tif",
        {"year": "int", "month": "int"},
    )
    out = pathparse.with_period_datetimes(parsed, period="monthly")
    return out.select(
        "image_id",
        "year",
        "month",
        F.unix_timestamp("start_datetime").alias("start_s"),
        F.unix_timestamp("end_datetime").alias("end_s"),
    )


def q_href_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stac_catalog_builder_spark.operators import pathparse

    df = _with_paths(synth.images(spark, sf_dir)).withColumn(
        "grid_tile",
        F.concat(
            F.lit("E"), (F.col("img_key") % 30).cast("string"),
            F.lit("N"), (F.col("img_key") % 15).cast("string"),
        ),
    ).withColumn(
        "utm_tile",
        F.concat(F.lpad((F.col("img_key") % 60 + 1).cast("string"), 2, "0"), F.lit("UFS")),
    )
    tile_e, tile_n = pathparse.parse_tile_id(F.col("grid_tile"))
    return df.select(
        "image_id",
        pathparse.asset_url(
            F.col("asset_path"), "/data", "https://cdn.example.org/assets/{}?v=1"
        ).alias("url"),
        pathparse.s3_alternate_href(F.col("asset_path"), "my-bucket", "catalog").alias(
            "s3_href"
        ),
        pathparse.epsg_from_tile_or_default(F.col("utm_tile")).alias("epsg"),
        tile_e.alias("tile_e"),
        tile_n.alias("tile_n"),
    )


def q_time_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6: interval join events x time slots (the reference's catalogue
    time-slot windows, terracatalog.py:432-453) — broadcast range join."""
    events = read_parquet(spark, f"{sf_dir}/events.parquet")
    nation = read_parquet(spark, f"{sf_dir}/nation.parquet")
    slots = nation.select(
        F.col("n_nationkey").alias("slot_id"),
        F.date_add(F.to_date(F.lit("2024-01-01")), F.col("n_nationkey").cast("int"))
        .cast("timestamp")
        .alias("slot_start"),
        F.date_add(F.to_date(F.lit("2024-01-01")), (F.col("n_nationkey") + 1).cast("int"))
        .cast("timestamp")
        .alias("slot_end"),
    )
    joined = events.join(
        F.broadcast(slots),
        (F.col("ts") >= F.col("slot_start")) & (F.col("ts") < F.col("slot_end")),
    )
    return joined.groupBy("slot_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.floor(F.col("value") * 1000.0 + 0.5).cast("bigint")).alias(
            "sum_value_x1000"
        ),
    )


def q_first_asset(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stac_catalog_builder_spark.operators.grouping import first_asset_geometry

    firsts = first_asset_geometry(synth.images(spark, sf_dir))
    return firsts.select("item_id", F.col("image_id").alias("first_asset_id"))


def q_tile_cover(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stac_catalog_builder_spark.operators.tiling import tile_cover

    return tile_cover(_images_fp(spark, sf_dir), zoom=8).select(
        "image_id", "tile_x", "tile_y", "zoom"
    )


def q_salted_extent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase extent aggregation — exact rewrite, so it shares the
    plain per-collection extent oracle."""
    from stac_catalog_builder_spark.operators.grouping import salted_extent_agg

    ext = salted_extent_agg(_assigned(spark, sf_dir), "collection_id")
    return ext.select(
        "collection_id",
        "n_assets",
        F.floor(F.col("ext_w") * 100000.0 + 0.5).cast("bigint").alias("ext_w_u"),
        F.floor(F.col("ext_s") * 100000.0 + 0.5).cast("bigint").alias("ext_s_u"),
        F.floor(F.col("ext_e") * 100000.0 + 0.5).cast("bigint").alias("ext_e_u"),
        F.floor(F.col("ext_n") * 100000.0 + 0.5).cast("bigint").alias("ext_n_u"),
        F.unix_timestamp("dt_min").alias("dt_min_s"),
        F.unix_timestamp("dt_max").alias("dt_max_s"),
    )


def q_hex_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only in the driver window; VALUE-EXACT in pytest: the encoder is
    replayed bit-for-bit in DuckDB (oracles.sql_hex_cells,
    tests/test_parity_rowsonly.py) on top of the hierarchy/ring property
    tests."""
    from stac_catalog_builder_spark.functions.cells import hex_cell_udf

    df = _images_fp(spark, sf_dir)
    return df.select(
        "image_id",
        hex_cell_udf(7)(F.col("lon"), F.col("lat")).alias("hex_r7"),
        hex_cell_udf(9)(F.col("lon"), F.col("lat")).alias("hex_r9"),
    )


def q_s2_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only in the driver window; VALUE-EXACT in pytest: face cube +
    quadratic ST + unrolled Hilbert walk replayed in DuckDB
    (oracles.sql_s2_cells, tests/test_parity_rowsonly.py) on top of the
    prefix-parent property tests."""
    from stac_catalog_builder_spark.functions.cells import s2_cell_udf

    df = _images_fp(spark, sf_dir)
    return df.select(
        "image_id",
        s2_cell_udf(12)(F.col("lon"), F.col("lat")).alias("s2_l12"),
        s2_cell_udf(20)(F.col("lon"), F.col("lat")).alias("s2_l20"),
    )


# --- batch 6: semi/anti joins, set ops, pivot, overlap join -----------------


def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): orders with any heavy lineitem."""
    orders = read_parquet(spark, f"{sf_dir}/orders.parquet")
    li = read_parquet(spark, f"{sf_dir}/lineitem.parquet").where(F.col("l_quantity") > 45)
    out = orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
    return out.select(
        "o_orderkey",
        F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("bigint").alias("total_cents"),
    )


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no URGENT order."""
    cust = read_parquet(spark, f"{sf_dir}/customer.parquet")
    urgent = read_parquet(spark, f"{sf_dir}/orders.parquet").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return cust.join(
        urgent, cust.c_custkey == urgent.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union / intersect / except over two derived key sets (U1/U2 + more).

    ONE distributed plan (full-outer membership join + single aggregate,
    unpivoted with stack) instead of three driver-side .count() jobs — one
    scan pass per side rather than three each (VERDICT r2 cosmetic #6)."""
    orders = read_parquet(spark, f"{sf_dir}/orders.parquet")
    a = orders.where(F.col("o_orderkey") % 3 == 0).select(F.col("o_custkey").alias("k")).distinct()
    b = orders.where(F.col("o_orderkey") % 5 == 0).select(F.col("o_custkey").alias("k")).distinct()
    m = a.withColumn("ia", F.lit(1)).join(
        b.withColumn("ib", F.lit(1)), "k", "full_outer"
    )
    summary = m.agg(
        F.count(F.lit(1)).alias("n_union"),
        F.sum((F.col("ia").isNotNull() & F.col("ib").isNotNull()).cast("bigint")).alias(
            "n_intersect"
        ),
        F.sum((F.col("ia").isNotNull() & F.col("ib").isNull()).cast("bigint")).alias(
            "n_except"
        ),
    )
    return summary.select(
        F.expr(
            "stack(3, 'union', n_union, 'intersect', n_intersect,"
            " 'except', n_except) as (op, n)"
        )
    )


def q_events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: events per hour-of-day x event_type (explicit value list ->
    no extra distinct pass at scale)."""
    ev = read_parquet(spark, f"{sf_dir}/events.parquet")
    piv = (
        ev.withColumn("hour_of_day", F.hour("ts"))
        .groupBy("hour_of_day")
        .pivot("event_type", oracles.EVENT_TYPES)
        .count()
    )
    out = piv.select(
        "hour_of_day",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in oracles.EVENT_TYPES],
    )
    return out


def q_footprint_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 variant: footprint-RECTANGLE x boundary overlap (not centroid) —
    images straddling tile borders match multiple tiles."""
    from stac_catalog_builder_spark.operators.spatial_join import spatial_join_bbox_overlap

    boxes = synth.boundaries(spark, sf_dir)
    return spatial_join_bbox_overlap(_images_fp(spark, sf_dir), boxes).select(
        "image_id", "tile_id"
    )


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar functions (get_json_object) + aggregate over the parsed
    field — the engine's from_json/to_json surface."""
    ev = read_parquet(spark, f"{sf_dir}/events.parquet")
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
        F.count(F.lit(1)).alias("n"),
    )


def q_config_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 + P3: every asset row fetches its AssetConfig by asset_type via a
    broadcast hash join against the config dimension LOADED FROM A JSON FILE
    (the reference's CollectionConfig.from_json_file entry point,
    config.py:304-312); unknown types are dropped (inner) —
    reference builder.py:248-251 / config.py:198-237."""
    from stac_catalog_builder_spark.sources import config as cfgmod

    cfg = cfgmod.asset_config_df(spark, cfgmod.load_collection_config())
    imgs = synth.images(spark, sf_dir)
    return imgs.join(F.broadcast(cfg), "asset_type", "inner").select(
        "image_id", "title", "media_type"
    )


def q_bands_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bands nested-struct model: the config join attaches
    ``bands array<struct(name,data_type,nodata,index)>`` per asset
    (reference BandMetadata metadata.py:32-63 + band configs
    config.py:62-195), exploded to eo/raster extension rows."""
    from stac_catalog_builder_spark.operators import assets as assets_ops
    from stac_catalog_builder_spark.sources import config as cfgmod

    cfg = cfgmod.asset_config_df(spark, cfgmod.load_collection_config())
    joined = assets_ops.attach_bands(synth.images(spark, sf_dir), cfg)
    return assets_ops.explode_bands(joined)


def q_tags_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map/tags surface: sanitize the per-asset tags map, merge an override
    map with dict-update semantics (override wins — reference mapper.py:182,
    sanitation metadata.py:322-323), exploded to sorted key/value rows for
    the hash comparison."""
    from stac_catalog_builder_spark.operators import assets as assets_ops

    override = F.create_map(
        F.lit("rev"), F.lit("v9"), F.lit("proc"), F.lit("l2a")
    )
    # fan_out=True (measured, r6 follow-up): this is the one single-pass
    # map-heavy JVM row where the key-column shuffle pays for itself — the
    # tags map build+sanitize+merge+explode costs ~0.8s serial (interleaved
    # A/B 1.03-1.22 -> 0.91-1.02s). The same A/B on bands_explode/
    # fixity_audit/sequence_pack was a wash and tile_pyramid REGRESSED 2.3x
    # (its rollup stages inherit the fanned partition count) — all left
    # serial.
    merged = assets_ops.with_merged_tags(
        synth.images(spark, sf_dir, fan_out=True), override
    )
    return merged.select("image_id", F.explode("tags")).select(
        "image_id",
        F.col("key").alias("tag_key"),
        F.col("value").alias("tag_value"),
    )


def q_datetime_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime normalization cascade (reference check_datetime,
    metadata.py:554-590): ISO-T strings, naive timestamps, and bare dates all
    normalize to UTC timestamps via a try_to_timestamp coalesce cascade."""
    from stac_catalog_builder_spark.operators import assets as assets_ops

    imgs = synth.images(spark, sf_dir)
    shifted = F.timestamp_add(
        "SECOND", (F.col("img_key") % 86400).cast("int"), F.col("datetime")
    )
    raw = (
        F.when(F.col("img_key") % 3 == 0, F.date_format(shifted, "yyyy-MM-dd'T'HH:mm:ss"))
        .when(F.col("img_key") % 3 == 1, F.date_format(shifted, "yyyy-MM-dd HH:mm:ss"))
        .otherwise(F.date_format(shifted, "yyyy-MM-dd"))
    )
    out = imgs.select("image_id", raw.alias("raw_str"))
    return out.select(
        "image_id",
        "raw_str",
        F.unix_timestamp(assets_ops.normalize_datetime(F.col("raw_str"))).alias(
            "norm_s"
        ),
    )


def q_tile_topk_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: per-tile top-k densest cells (skew diagnosis window,
    SURVEY.md §2.5): rank() over partitionBy(tile) on per-cell image counts."""
    from pyspark.sql import Window

    assigned = _assigned(spark, sf_dir)
    counts = (
        assigned.select(
            "tile_id", grid_cell_col(F.col("lon"), F.col("lat"), 7).alias("cell")
        )
        .groupBy("tile_id", "cell")
        .agg(F.count(F.lit(1)).alias("n_images"))
    )
    w = Window.partitionBy("tile_id").orderBy(F.col("n_images").desc(), F.col("cell"))
    return (
        counts.withColumn("rank", F.rank().over(w))
        .where(F.col("rank") <= 3)
        .select("tile_id", "rank", "cell", "n_images")
    )


def q_footprint_wkt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometry serialization (reference boundingbox.py:95-171 bbox->WKT):
    the footprint bbox as a closed WKT POLYGON with exact 5-decimal
    coordinates built from integer arithmetic (engine-independent strings)."""
    from stac_catalog_builder_spark.functions.geo import bbox_wkt

    df = _images_fp(spark, sf_dir)
    return df.select(
        "image_id",
        bbox_wkt(F.col("fp_w"), F.col("fp_s"), F.col("fp_e"), F.col("fp_n")).alias(
            "wkt"
        ),
    )


def q_offset_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 + O5: deterministic offset/limit slice (Spark >= 3.4 offset)."""
    imgs = synth.images(spark, sf_dir).select("image_id", "item_id")
    return imgs.orderBy("image_id").offset(100).limit(200)


# --- batch 2: dedup / text / similarity / relational -----------------------


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NO fan-out here (measured, r6): the documents consumers are
    # multi-stage join/aggregate pipelines over a small corpus whose caches
    # and shuffles would inherit the fanned-out partition count — per-task
    # overhead across their many sequential jobs cost 2-4x more than the
    # serial first map stage saves (minhash_pairs 2.3s -> 5.9s interleaved
    # A/B). The images fan-out is different: one map-heavy pass, no cache.
    return read_parquet(spark, f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_parquet(spark, f"{sf_dir}/embeddings.parquet")


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    corpus = docs.unionByName(
        docs.withColumn("doc_id", F.col("doc_id") + F.lit(1000000))
    )
    return dedup.dedup_exact(corpus)


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.token_stats(_docs(spark, sf_dir))


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.quality_score(_docs(spark, sf_dir))


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textops.lang_id(_docs(spark, sf_dir))


def q_doc_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentile aggregation (corpus length distribution per shard):
    Spark `percentile` and DuckDB `quantile_cont` share the linear
    interpolation at (n-1)*q positions, so scaled outputs match bitwise."""
    docs = _docs(spark, sf_dir)
    qs = [(0.1, "p10"), (0.5, "p50"), (0.9, "p90"), (0.99, "p99")]
    return (
        docs.groupBy((F.col("doc_id") % 4).alias("shard"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            *[
                F.floor(F.expr(f"percentile(length(text), {q})") * 1000.0 + 0.5)
                .cast("bigint")
                .alias(f"{name}_x1000")
                for q, name in qs
            ],
        )
    )


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition/boilerplate signal: per-doc top-bigram share
    (explode -> two-level aggregation, map-side combined)."""
    return textops.repetition_stats(_docs(spark, sf_dir))


def q_text_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-surface scrubbing: deterministic emails/URLs are injected per doc,
    then masked (<EMAIL>/<URL>), whitespace collapsed, trimmed — pure JVM
    regexp chain (patterns kept to the Java-regex/RE2 common subset)."""
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.format_string(
            "%s  contact user%d@example.com via https://example.org/d/%d  ",
            F.col("text"), F.col("doc_id"), F.col("doc_id"),
        ).alias("text"),
    )
    return textops.clean_text(docs)


def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (64-token chunks, 16 overlap) —
    one row per chunk, short docs emit one chunk."""
    return textops.chunk_documents(_docs(spark, sf_dir), chunk_tokens=64, overlap=16)


def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate pairing by exploded key sequence (equi-join — a band/theta
    condition would plan as a BroadcastNestedLoopJoin, O(N^2) at scale), then
    exact Jaccard verification. The scaled score is computed in ONE IEEE
    expression ((n*1000)/d, matching the oracle's operation order exactly)
    rather than scaling a pre-divided ratio."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    ids = docs.select("doc_id")
    pairs = ids.select(
        F.col("doc_id").alias("id_a"),
        F.explode(F.sequence(F.col("doc_id") + 1, F.col("doc_id") + 3)).alias("id_b"),
    ).join(ids.select(F.col("doc_id").alias("id_b")), "id_b")
    jac = dedup.ngram_jaccard(pairs.select("id_a", "id_b"), docs)
    return jac.select(
        "id_a",
        "id_b",
        F.floor(F.col("n_inter") * 1000.0 / F.col("n_union") + 0.5)
        .cast("bigint")
        .alias("jac_x1000"),
    )


def q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only check (LSH banding is not SQL-expressible); exactness of the
    candidate set vs a numpy oracle is covered in tests/test_dedup.py."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    corpus = docs.unionByName(
        docs.withColumn("doc_id", F.col("doc_id") + F.lit(1000000))
    )
    return dedup.minhash_candidate_pairs(corpus).orderBy("id_a", "id_b")


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only: near-dup pairs at Hamming<=3 over a corpus with exact dups
    injected (every doc duplicated -> hamming 0 pairs guaranteed)."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    corpus = docs.unionByName(
        docs.withColumn("doc_id", F.col("doc_id") + F.lit(1000000))
    )
    return dedup.simhash_candidate_pairs(corpus)


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only: rolling-hash fingerprint; invariance checked in pytest."""
    return dedup.with_fingerprint(_docs(spark, sf_dir)).select("doc_id", "fingerprint")


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    qs = emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    out = similarity.cosine_topk(emb, qs, k=5)
    return out.select(
        "query_id",
        "rank",
        "neighbor_id",
        F.floor(F.col("cosine") * 1000000.0 + 0.5).cast("bigint").alias("cos_x1e6"),
    )


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only: multi-table hyperplane-LSH ANN (recall floor vs the exact
    oracle is pytest-asserted in tests/test_similarity.py)."""
    emb = _emb(spark, sf_dir)
    qs = emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    return similarity.ann_lsh_topk(emb, qs, k=5).select(
        "query_id", "rank", "neighbor_id"
    )


def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only: IVF coarse-quantized ANN (probes nprobe/n_centroids of the
    corpus; recall floor pytest-asserted)."""
    emb = _emb(spark, sf_dir)
    qs = emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    return similarity.ivf_topk(emb, qs, k=5).select("query_id", "rank", "neighbor_id")


def q_ann_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact oracle: cosine top-k over int8-quantized embeddings (4x storage
    cut). The quantize/dequantize chain is pure IEEE arithmetic (max-abs/127
    scale, floor(x/scale+0.5) codes, float32 round-trip) so DuckDB replicates
    it bit-for-bit; recall >= 0.9 vs exact float top-k is pytest-gated."""
    emb = _emb(spark, sf_dir)
    q8 = similarity.quantize_embeddings(emb)
    deq = q8.select(
        "vec_id",
        similarity.dequantize_col(F.col("q_codes"), F.col("q_scale")).alias(
            "embedding"
        ),
    )
    qs = emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    return similarity.cosine_topk(deq, qs, k=5).select(
        "query_id",
        "rank",
        "neighbor_id",
        F.floor(F.col("cosine") * 1000000.0 + 0.5).cast("bigint").alias("cos_x1e6"),
    )


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only: inject scaled copies (cosine==1) and find them via
    hyperplane-LSH buckets + exact verify."""
    emb = _emb(spark, sf_dir).select("vec_id", "embedding")
    copies = emb.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(F.col("embedding"), lambda x: x * F.lit(1.0009)).alias("embedding"),
    )
    return dedup.embedding_neardup_pairs(
        emb.unionByName(copies), threshold=0.9999
    ).select("id_a", "id_b")


def q_precision_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10: resolution-derived precision rounding (reference mapper.py:130-139
    rounds coordinates to 0.1% of pixel resolution; decimals =
    abs(floor(log10(res * 0.001)))). Per-row resolutions cycle over three
    decades; rounded values are emitted as exact 1e-9-scaled BIGINTs. The
    log10 inputs sit mid-decade (log10 = x.60) so an engine ULP difference
    can never flip the floor."""
    from stac_catalog_builder_spark.operators.pathparse import round_to_resolution

    df = _images_fp(spark, sf_dir)
    res = F.lit(0.00025) * F.pow(F.lit(10.0), (F.col("img_key") % 3).cast("double"))
    out = df.select(
        "image_id",
        (F.col("img_key") % 3).cast("int").alias("res_decade"),
        round_to_resolution(F.col("lon"), res).alias("lon_r"),
        round_to_resolution(F.col("lat"), res).alias("lat_r"),
    )
    return out.select(
        "image_id",
        "res_decade",
        F.floor(F.col("lon_r") * 1e9 + F.lit(0.5)).cast("bigint").alias("lon_r_e9"),
        F.floor(F.col("lat_r") * 1e9 + F.lit(0.5)).cast("bigint").alias("lat_r_e9"),
    )


def q_collection_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4: per-collection set-deduplicated summary fields (platforms/
    instruments lists, reference terracatalog.py:139,157) + asset count.
    asset_type plays the instrument role and fmt the platform role in the
    synthetic corpus; collect_set dedups map-side, array_sort makes the
    reference's list(set(...)) deterministic. The sorted sets are emitted as
    comma-joined STRINGS, not array columns: the driver's canonicalizer
    hashes rows via pandas factorize, which cannot hash list values
    (VERDICT r3 #1) — the string form is lossless for this data (asset
    types / formats never contain commas) and hash-stable."""
    return (
        _assigned(spark, sf_dir)
        .groupBy("collection_id")
        .agg(
            F.array_join(F.array_sort(F.collect_set("asset_type")), ",").alias(
                "instruments"
            ),
            F.array_join(F.array_sort(F.collect_set("fmt")), ",").alias("platforms"),
            F.count(F.lit(1)).cast("bigint").alias("n_assets"),
        )
    )


def q_zonal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only (pytest: exact vs a driver-side numpy decode oracle):
    raster->vector zonal statistics — per-(collection, tile) aggregates of
    decoded pixel means (the north rule's raster<->vector direction that
    summarizes pixels INTO vector zones)."""
    assigned = multimodal.with_encoded_bytes(
        _assigned(spark, sf_dir).where(F.col("img_key") < 2000)
    )
    out = multimodal.zonal_stats(assigned)
    # integer-stable projection for the driver's value hash (averages are
    # doubles; floor-scale them)
    return out.select(
        "collection_id",
        "tile_id",
        "n_images",
        "n_decode_failed",
        F.floor(F.col("mean_of_means_x1000") * 1000.0 + F.lit(0.5))
        .cast("bigint")
        .alias("mom_e3"),
        "min_mean_x1000",
        "max_mean_x1000",
    )


def q_spatial_join_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only (transitively exact: pytest asserts row-identical output to
    the oracle-proven broadcast variant): PIP join via the SHUFFLE equi-join
    path — the shape for polygon dimensions too large to broadcast
    (distributed cover computation, cell-partitioned candidates, same JVM
    ray cast)."""
    from stac_catalog_builder_spark.operators.spatial_join import (
        spatial_join_pip_partitioned,
    )

    polys = _boundary_polygons(spark, sf_dir)
    pdf = spark.createDataFrame(
        [
            (p["tile_id"], p["collection_id"],
             [float(x) for x in p["ring_x"]], [float(y) for y in p["ring_y"]])
            for p in polys
        ],
        "poly_id string, collection_id string, ring_x array<double>, "
        "ring_y array<double>",
    )
    imgs = _images_fp(spark, sf_dir).select("image_id", "lon", "lat")
    return spatial_join_pip_partitioned(imgs, pdf).select(
        "image_id", F.col("poly_id").alias("tile_id"), "collection_id"
    )


def q_caption_image_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only: CLIP-style caption -> image retrieval over the image+caption
    pairs (dual-tower embed + exact cosine top-k); encoders are deterministic
    stubs, the retrieval contract is pytest-pinned."""
    imgs = multimodal.with_encoded_bytes(
        _images_fp(spark, sf_dir).where(F.col("img_key") < 1200)
    )
    return multimodal.cross_modal_topk(imgs, k=3)


def q_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only: full near-dup GROUPING pipeline — minhash LSH candidates
    -> exact Jaccard verify -> distributed connected components
    (large-star/small-star) -> (doc_id, group_id, is_kept). Exactness of the
    component labels vs a union-find oracle is pytest-asserted
    (tests/test_graph.py)."""
    from stac_catalog_builder_spark.operators.graph import dedup_groups

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    corpus = docs.unionByName(
        docs.withColumn("doc_id", F.col("doc_id") + F.lit(1000000))
    )
    return dedup_groups(corpus, jaccard_threshold=0.8)


def q_knn_cellring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hex-cell ring-expansion kNN in ADAPTIVE mode (``ring_radius=None``) —
    must produce the SAME rows as q_knn (same oracle): both the certified
    pruned path and the exact fallback are exact, not approximate.

    Adaptive per-query radii (``knn._adaptive_radii``) are the
    density-skew-surviving configuration — the one whose crossover over
    brute force is proven in BENCH/GROWTH.md (3.7x at 76.8M rows) — and per
    VERDICT r3 #4 the driver's hard signal now exercises it directly (it
    was pytest-only in r3). At sparse scales (sf<=0.01) queries whose inner
    ring cannot certify alpha*k rows route to the exact fallback — slower,
    never wrong. max_abs_lat comes from the synthetic lake's schema
    contract (lat in [-60, 60), FIXTURES.md §1) — lake statistics in place
    of a per-call full scan."""
    out = knn_join_cellring(
        _images_fp(spark, sf_dir),
        _knn_query_points(sf_dir),
        k=5,
        res=8,
        ring_radius=None,
        max_abs_lat=60.0,
    )
    return out.select("query_id", "rank", "image_id")


def q_knn_cellring_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only (pytest: row-identical to q_knn): the FIXED-radius cellring
    variant (r2/r3's driver entry — res=8 keeps ring_deg 6.3 so no query is
    antimeridian/pole-unsafe). Kept as the simpler configuration for
    uniform-density corpora; the adaptive mode above is the default."""
    out = knn_join_cellring(
        _images_fp(spark, sf_dir),
        _knn_query_points(sf_dir),
        k=5,
        res=8,
        ring_radius=16,
        max_abs_lat=60.0,
    )
    return out.select("query_id", "rank", "image_id")


def q_image_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact oracle: encode the phash-seeded raster per row (raw/png), decode
    it back, emit the input_hint per-row invariants (pixel allclose + caption
    equality + decoded dims). The raw/png codecs are lossless so the oracle
    predicts every invariant from first principles; a codec bug flips
    pixel_ok/px_w and hash-mismatches. mean/std stats are pytest-verified
    (raster synth is transcendental — not SQL-expressible)."""
    imgs = multimodal.with_encoded_bytes(
        _images_fp(spark, sf_dir).where(F.col("img_key") < 2000)
    )
    stats = multimodal.with_content_media_type(multimodal.decode_stats(imgs))
    return stats.select(
        "image_id", "fmt", "px_w", "px_h", "pixel_ok", "caption_ok", "decode_ok",
        "media_type",
    )


def q_image_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only: decode -> block-mean embedding -> cosine top-3 neighbors
    for 10 probe images (the image-side ANN pipeline end-to-end)."""
    imgs = multimodal.with_encoded_bytes(
        _images_fp(spark, sf_dir, fan_out=False).limit(300)
    )
    emb = multimodal.image_embedding(imgs).withColumnRenamed("image_id", "vec_id")
    qs = emb.where(F.col("vec_id") < F.lit("img_00000020")).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    return similarity.cosine_topk(emb, qs, k=3).select(
        "query_id", "rank", "neighbor_id"
    )


def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only: PCM-WAV decode + features (duration/RMS/zero-crossings/
    dominant frequency) with the lossless-PCM invariant; pytest asserts
    pcm_ok on every row and dominant_hz tracks the synth tone."""
    imgs = multimodal.with_audio_bytes(
        synth.images(spark, sf_dir, fan_out=False).limit(300)
    )
    return multimodal.audio_features(imgs)


def q_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only: RVID random-access frame sampling (every 8th of 24 frames
    -> 3 rows/clip); pytest asserts frame pixels round-trip exactly. The
    binary frame payload is fingerprinted (md5) for the driver harness —
    raw binary columns break pandas-side comparison."""
    imgs = multimodal.with_video_bytes(
        synth.images(spark, sf_dir, fan_out=False).limit(200)
    )
    out = multimodal.video_frame_sample(imgs, every_n=8)
    return out.select(
        "image_id", "frame_idx", "n_frames", "ts_ms", "mean_x1000",
        F.md5(F.col("frame_bytes")).alias("frame_md5"),
    )


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.pricing_summary(spark, sf_dir)


def q_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.top_orders(spark, sf_dir)


def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.revenue_by_nation(spark, sf_dir)


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.events_hourly(spark, sf_dir)


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return relational.sessionize(spark, sf_dir)


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (backward inclusive): each purchase event joins the latest
    signup at-or-before it by the same user — union + window forward-fill,
    one shuffle on the key (operators/temporal.py; DuckDB checks it with a
    native ASOF LEFT JOIN)."""
    from stac_catalog_builder_spark.operators.temporal import asof_join_backward

    ev = read_parquet(spark, f"{sf_dir}/events.parquet")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    signups = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id", "ts")
        .agg(F.expr("max_by(value, event_id)").alias("v"))
        .select(
            "user_id",
            "ts",
            F.floor(F.col("v") * 1000.0 + 0.5).cast("bigint").alias("signup_value_x1000"),
            F.unix_timestamp("ts").alias("signup_s"),
        )
    )
    out = asof_join_backward(
        purchases, signups, key="user_id",
        payloads=["signup_value_x1000", "signup_s"],
    )
    return out.select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts").alias("purchase_s"),
        "asof_signup_value_x1000",
        "asof_signup_s",
    )


def q_token_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters: global top-50 tokens by frequency (vocabulary table —
    the map-side partial agg bounds the shuffle to distinct tokens; the
    top-k itself is a TakeOrdered, never a global sort)."""
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    counts = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    top = counts.orderBy(F.col("n").desc(), F.col("token")).limit(50)
    w = Window.orderBy(F.col("n").desc(), F.col("token"))  # 50 rows only
    return top.withColumn("rank", F.row_number().over(w)).select("rank", "token", "n")


def q_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session rows via Spark's built-in session_window (gap-merging)
    in batch mode — the streaming twin lives in streaming/events.py. The
    oracle replicates the [start, last+gap) semantics with a lag+cumsum
    construction (new session iff the microsecond gap >= 30 min)."""
    from stac_catalog_builder_spark.streaming.events import session_rollup

    ev = read_parquet(spark, f"{sf_dir}/events.parquet")
    return session_rollup(ev)


def q_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only (pytest test_sampling.py replays the integer scramble in
    DuckDB row-exactly): deterministic hash-based train/val/test split over
    the documents table — a pure map-side assignment (no shuffle, no RNG;
    stable under retries/repartitioning, which DataFrame.sample is not) —
    summarized per split."""
    docs = _docs(spark, sf_dir).select("doc_id")
    out = sampling.dataset_split(docs, "doc_id")
    return out.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
        F.sum("doc_id").alias("sum_doc_id"),
    )


def q_data_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only (pytest: deterministic per-source hash sampling): training
    mixture — two document sources sampled at different rates, unioned with
    a source tag (zero exchanges before the summary agg)."""
    docs = _docs(spark, sf_dir).select("doc_id", "lang")
    out = sampling.weighted_mixture(
        {"primary": docs, "upweight": docs.where(F.col("lang") == "en")},
        {"primary": 0.5, "upweight": 0.9},
    )
    return out.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("doc_id").alias("sum_doc_id"),
    )


def q_deterministic_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only (pytest: permutation/determinism properties + exact DuckDB
    replay of the rank): reproducible global shuffle order over the
    documents table — each row's dense rank under (bucket(key), key),
    computed block-wise with no global sort (see
    sampling.deterministic_shuffle)."""
    docs = _docs(spark, sf_dir).select("doc_id")
    return sampling.deterministic_shuffle(docs, "doc_id", salt=3, n_blocks=64)


def q_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only (pytest test_packing.py pins exactly-once coverage, hard
    budget, utilization > 0.85, partition-independence): chunk the documents
    table into 64-token windows, pack chunks into 256-token training
    contexts (deterministic first-fit-decreasing per hash group), summarize
    per context."""
    from stac_catalog_builder_spark.operators.packing import pack_sequences

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    chunks = textops.chunk_documents(docs, chunk_tokens=64, overlap=0).select(
        F.concat_ws("_", "doc_id", "chunk_idx").alias("chunk_id"),
        F.col("n_chunk_tokens").alias("n_tokens"),
    )
    packed = pack_sequences(chunks, budget=256)
    return packed.groupBy("context_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("n_tokens").alias("n_tokens"),
    )


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only (pytest test_textops.py pins exact n-gram boundary
    semantics and the broadcast-only plan): benchmark decontamination — the
    first 10 documents play the eval set; every training doc sharing a
    13-gram with them is dropped and reported (GPT-3-style rule). The
    synthetic corpus's template near-dups make hits non-trivial. Emits the
    contamination report plus a one-row summary of the clean count."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    bench = docs.where(F.col("doc_id") < 10).select("text")
    clean, report = textops.decontaminate(docs, bench, n=13)
    summary = clean.agg(
        F.lit(-1).cast("bigint").alias("doc_id"),
        F.count(F.lit(1)).cast("bigint").alias("n_hits"),
    )
    return report.unionByName(summary)


def q_image_augment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only (pytest test_multimodal.py proves every augmented payload
    decodes to exactly the numpy transform of its source, byte-identical
    across runs): deterministic vision-training augmentation — each image
    expands to 4 op-tagged variants (flip/rotate/center-crop/brightness),
    no RNG, Arrow-batched, shuffle-free. Emits per-variant dims + payload
    crc32 so the driver's row check pins actual bytes."""
    imgs = multimodal.with_encoded_bytes(
        _images_fp(spark, sf_dir).where(F.col("img_key") < 500)
    )
    out = multimodal.augment_images(
        imgs, ops=("hflip", "rot90", "crop0.5", "bright+24")
    )
    return out.select(
        "image_id", "aug_op", "w", "h", F.crc32(F.col("bytes")).alias("payload_crc")
    )


def q_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only (pytest test_dedup.py proves the Hamming-ball join exact vs
    brute force and pins the re-encode/exact-copy behavior): perceptual-hash
    near-duplicate IMAGE pairs over the lake's phash:int64 column — inject a
    2-bit-flipped twin per image (a re-encode simulacrum); every twin must
    pair with its source at hamming 2 with zero pixel decodes."""
    imgs = synth.images(spark, sf_dir).select("image_id", "phash")
    twins = imgs.select(
        F.concat(F.lit("re_"), F.col("image_id")).alias("image_id"),
        F.col("phash").bitwiseXOR(F.lit(0b10001)).alias("phash"),
    )
    # sketch_bits=52: the lake's phash populates bits [0, 52) (lake
    # statistics a production caller would know); blocks over the real
    # span keep every paired-block bucket entropy-rich
    pairs = dedup.phash_neardup_pairs(
        imgs.unionByName(twins), max_hamming=6, sketch_bits=52
    )
    return pairs.select("id_a", "id_b", "hamming")


def q_image_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only in the driver window; VALUE-EXACT in pytest
    (tests/test_parity_rowsonly.py replays the whole pipeline — brute-force
    bit_count pairs + recursive-CTE connected components — in DuckDB):
    image near-duplicate GROUPING over the phash column. Each image gets a
    2-bit re-encode twin; every twin must land in its source's group with
    the source as the kept survivor (plus whatever genuine near-dup
    merges the corpus carries)."""
    from stac_catalog_builder_spark.operators.graph import image_dedup_groups

    imgs = synth.images(spark, sf_dir).select("image_id", "phash")
    twins = imgs.select(
        F.concat(F.lit("re_"), F.col("image_id")).alias("image_id"),
        F.col("phash").bitwiseXOR(F.lit(0b10001)).alias("phash"),
    )
    return image_dedup_groups(
        imgs.unionByName(twins), max_hamming=6, sketch_bits=52
    )


def q_incremental_extents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only (pytest test_incremental.py asserts exact equality with the
    full recompute): incremental catalog maintenance — fold two appended
    asset batches into a bootstrapped per-(collection, tile) extent summary
    without rescanning history (all extent statistics are algebraic, so the
    merge is exact; the reference instead re-reads every item per update,
    builder.py:484-510)."""
    from stac_catalog_builder_spark.operators.grouping import incremental_extents

    keys = ["collection_id", "tile_id"]
    assigned = _assigned(spark, sf_dir)
    s = incremental_extents(None, assigned.where(F.col("img_key") % 3 == 0), keys)
    s = incremental_extents(s, assigned.where(F.col("img_key") % 3 == 1), keys)
    s = incremental_extents(s, assigned.where(F.col("img_key") % 3 == 2), keys)
    return s.select(
        "collection_id",
        "tile_id",
        "n_assets",
        F.floor(F.col("ext_w") * 1e6 + F.lit(0.5)).cast("bigint").alias("ext_w_e6"),
        F.floor(F.col("ext_n") * 1e6 + F.lit(0.5)).cast("bigint").alias("ext_n_e6"),
        F.unix_timestamp("dt_min").alias("dt_min_s"),
        F.unix_timestamp("dt_max").alias("dt_max_s"),
    )


def q_temporal_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only (tests/test_parity_rowsonly.py replays the identical window
    fold in DuckDB value-exactly; tests/test_temporal.py checks a brute-force
    numpy interval-union oracle per key): per-collection temporal-coverage
    quality — union length, island count, and largest gap of the acquisition
    intervals, in ONE window pass + ONE reused-partitioning aggregate (the
    reference publishes only the hull, builder.py:484-510). Intervals are
    derived deterministically from the image table (start = datetime +
    (img_key % 500) h, duration = 30 min + (img_key % 7) * 10 min)."""
    from stac_catalog_builder_spark.operators.temporal import interval_coverage

    start_s = F.unix_timestamp("datetime") + (F.col("img_key") % 500) * 3600
    iv = _assigned(spark, sf_dir).select(
        "collection_id",
        start_s.alias("start_s"),
        (start_s + 1800 + (F.col("img_key") % 7) * 600).alias("end_s"),
    )
    return interval_coverage(iv, ["collection_id"])


def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only (tests/test_parity_rowsonly.py replays the full hash ->
    register -> merge -> estimate chain in DuckDB, value-exact except the two
    ln()-bearing columns at +/-1; tests/test_sketches.py proves merge ==
    direct and the accuracy bound vs exact COUNT DISTINCT): HyperLogLog
    distinct-phash-per-collection. Registers are built directly at
    collection granularity — max is associative, so this is byte-identical
    to building per (collection, tile) and max-merging up (the two-level
    rollup test_sketches.py pins and streaming/extents.py uses for
    incremental maintenance), and map-side partial aggregation bounds the
    shuffle to <= m rows per group per partition either way; the fused form
    drops one exchange + one aggregate stage (r6: 2.85s -> 2.65s at sf0.1,
    A/B interleaved, output assert_frame_equal-exact). The sketch state is
    the mergeable catalog statistic a 10^12-image table needs where an
    exact distinct would shuffle every key (operators/sketches.py)."""
    from stac_catalog_builder_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )

    regs = hll_registers(_assigned(spark, sf_dir), ["collection_id"], "phash")
    return hll_estimate(regs, ["collection_id"])


def q_tile_pyramid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only (tests/test_parity_rowsonly.py replays quadkey assembly +
    prefix rollup in DuckDB value-exactly; tests/test_cells.py pins the
    ancestor-is-prefix property vs a Python reference): multi-resolution
    tile density pyramid — per-tile image counts at zoom 8 with zooms 6 and
    4 folded from the zoom-8 aggregate by quadkey prefix truncation. ONE
    fact-table shuffle regardless of pyramid depth
    (operators/tiling.py::tile_pyramid)."""
    from stac_catalog_builder_spark.operators.tiling import tile_pyramid

    return tile_pyramid(_images_fp(spark, sf_dir), base_zoom=8, levels=[6, 4])


def q_compact_cover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only (tests/test_parity_rowsonly.py replays the quadtree cover
    in DuckDB value-exactly; tests/test_cover.py proves the cover expands
    back to EXACTLY the flat res-7 cell set, disjoint and minimal): compact
    multi-resolution cell cover of every boundary polygon — the S2
    RegionCoverer shape that keeps a continental polygon's join-key
    dimension at O(perimeter) instead of O(area)
    (operators/cover.py::compact_cover)."""
    from stac_catalog_builder_spark.operators.cover import compact_cover

    return compact_cover(
        synth.boundaries(spark, sf_dir), res=7, min_res=3, keys=["tile_id"]
    )


def q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only (tests/test_parity_rowsonly.py replays the WHOLE pipeline —
    LSH candidates, Jaccard verify, connected components, then the split
    scramble keyed on group_id — in DuckDB value-exactly; tests/test_sampling
    proves one split per group): leakage-safe train/val/test assignment —
    every near-duplicate GROUP lands in one split, because the hash key is
    the component id from dedup_groups, not the row id. Row-independent
    splitting would put a doc in train and its near-twin in test — the
    contamination dedup exists to prevent
    (operators/sampling.py::leakage_safe_split)."""
    from stac_catalog_builder_spark.operators.graph import dedup_groups
    from stac_catalog_builder_spark.operators.sampling import leakage_safe_split

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    corpus = docs.unionByName(
        docs.withColumn("doc_id", F.col("doc_id") + F.lit(1000000))
    )
    groups = dedup_groups(corpus, jaccard_threshold=0.8)
    return leakage_safe_split(
        corpus, groups, key_col="doc_id", group_col="group_id", salt=7
    ).select("doc_id", "group_id", "split")


def q_best_scene_mosaic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only (tests/test_parity_rowsonly.py replays the selection as a
    ROW_NUMBER window in DuckDB value-exactly): per-tile best-scene
    mosaicking — prefer scenes under the cloud threshold, then lowest
    cloud, then most recent, unique-id tiebreak. The engine computes it as
    ONE min_by aggregate (map-side combine; only per-tile partials shuffle
    — a window formulation would shuffle every candidate row)
    (operators/mosaic.py::best_scene_mosaic)."""
    from stac_catalog_builder_spark.operators.mosaic import best_scene_mosaic

    scored = _assigned(spark, sf_dir).withColumn(
        "cloud", (F.col("h1") % 101).cast("int")
    )
    return best_scene_mosaic(
        scored,
        keys=["tile_id", "collection_id"],
        quality_col="cloud",
        time_col="datetime",
        id_col="image_id",
        clear_threshold=20,
    )


def q_geohash_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only; VALUE-EXACT in pytest (oracles.sql_geohash_cells replays
    the unrolled shift/mask encode bit-for-bit): geohash cell ids at two
    precisions — completes the cell-encoder family (grid / hex / s2 /
    quadkey / geohash). The precision-3 id is exactly the precision-5
    prefix (pinned in tests), so rollups are prefix truncations
    (functions/cells.py::geohash_col)."""
    from stac_catalog_builder_spark.functions.cells import geohash_col

    df = _images_fp(spark, sf_dir)
    return df.select(
        "image_id",
        geohash_col(F.col("lon"), F.col("lat"), 5).alias("gh5"),
        geohash_col(F.col("lon"), F.col("lat"), 3).alias("gh3"),
    )


def q_catalog_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only (tests/test_parity_rowsonly.py replays the full-outer-join
    diff in DuckDB value-exactly): snapshot delta between two catalog
    versions — added / removed / changed item rows, the distributed form of
    the reference's per-item GET-then-upsert probe (stacapi/endpoints.py).
    Output feeds sources/catalog.py::upsert_items_bulk directly
    (operators/diff.py::snapshot_diff)."""
    from stac_catalog_builder_spark.operators.diff import snapshot_diff

    imgs = synth.images(spark, sf_dir).select(
        "img_key", "image_id", "fmt", "caption", "w", "h"
    )
    old = imgs.where(F.col("img_key") % 19 != 3)
    new = imgs.where(F.col("img_key") % 17 != 5).withColumn(
        "fmt",
        F.when(F.col("img_key") % 13 == 0, F.lit("webp")).otherwise(F.col("fmt")),
    )
    return snapshot_diff(
        old.drop("img_key"),
        new.drop("img_key"),
        keys=["image_id"],
        compare_cols=["fmt", "caption", "w", "h"],
    )


def q_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only (tests/test_parity_rowsonly.py replays counts -> sqrt
    rates -> bucket filter end to end in DuckDB value-exactly, doubles
    included): alpha=0.5 temperature rebalancing over skewed domains —
    rates derived FROM the data (rarest domain keeps all), per-row keep
    decision is the shuffle-free deterministic hash filter
    (operators/sampling.py::temperature_sample)."""
    from stac_catalog_builder_spark.operators.sampling import temperature_sample

    dom = (
        F.when(F.col("img_key") % 2 == 1, F.lit("d0"))
        .when(F.col("img_key") % 4 == 2, F.lit("d1"))
        .when(F.col("img_key") % 8 == 4, F.lit("d2"))
        .otherwise(F.lit("d3"))
    )
    df = synth.images(spark, sf_dir).select("img_key").withColumn("domain", dom)
    kept = temperature_sample(df, "domain", key_col="img_key", alpha=0.5, salt=11)
    totals = df.groupBy("domain").agg(F.count(F.lit(1)).alias("n_total"))
    summary = kept.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("sample_rate").alias("sample_rate"),
    )
    return totals.join(summary, "domain", "left").select(
        "domain",
        "n_total",
        F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
        "sample_rate",
    )


ASPECT_BUCKETS = [
    ("16:9", 320, 180),
    ("1:1", 256, 256),
    ("3:2", 300, 200),
    ("4:3", 288, 216),
    ("9:16", 180, 320),
]


def q_aspect_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only (tests/test_parity_rowsonly.py replays bucket argmin +
    per-bucket ROW_NUMBER in DuckDB value-exactly): aspect-ratio bucketed
    batch layout — each image goes to its closest-ratio bucket (map-side
    least() over a literal dim, integer cross-product distance), batches
    are laid out per bucket via the deterministic_shuffle block
    decomposition (no single-task-per-bucket window)
    (operators/packing.py::aspect_bucket_batches)."""
    from stac_catalog_builder_spark.operators.packing import aspect_bucket_batches

    imgs = synth.images(spark, sf_dir).select("img_key", "image_id", "w", "h")
    return aspect_bucket_batches(
        imgs, ASPECT_BUCKETS, batch_size=32, key_col="img_key", salt=3
    ).select(
        "image_id", "bucket_id", "bucket_w", "bucket_h", "batch_idx", "pos_in_batch"
    )


def q_footprint_iou(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only (tests/test_parity_rowsonly.py replays the grid bucketing,
    canonical-cell dedup and integer IoU end to end in DuckDB value-exactly;
    tests/test_overlap.py proves EXACT equality with a brute-force all-pairs
    numpy oracle): near-duplicate scenes by footprint IoU >= 50% — bboxes
    quantized to an exact integer micro lattice, candidates from a grid-cell
    self equi-join, each pair reported once from the cell holding the
    intersection's SW corner (no distinct pass). Pairs feed the same
    connected-components grouping as the text/phash dedup
    (operators/overlap.py::footprint_iou_pairs)."""
    from stac_catalog_builder_spark.operators.overlap import footprint_iou_pairs

    return footprint_iou_pairs(_images_fp(spark, sf_dir), min_iou_pct=50)


def q_catalog_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only (tests/test_parity_rowsonly.py compares against DuckDB
    computing the TARGET snapshot directly — equality proves the
    diff -> apply roundtrip identity end to end, NULLs included):
    MERGE INTO — apply the snapshot_diff delta to the old catalog version
    and reconstruct the new one exactly; one join against a delta-sized
    table instead of the reference's per-item GET-then-upsert probes
    (operators/diff.py::snapshot_apply)."""
    from stac_catalog_builder_spark.operators.diff import snapshot_apply, snapshot_diff

    imgs = synth.images(spark, sf_dir).select(
        "img_key", "image_id", "fmt", "caption", "w", "h"
    )
    old = imgs.where(F.col("img_key") % 19 != 3)
    new = (
        imgs.where(F.col("img_key") % 17 != 5)
        .withColumn(
            "fmt",
            F.when(F.col("img_key") % 13 == 0, F.lit("webp")).otherwise(F.col("fmt")),
        )
        .withColumn(
            "caption",
            F.when(F.col("img_key") % 23 == 1, F.lit(None).cast("string")).otherwise(
                F.col("caption")
            ),
        )
    )
    cols = ["fmt", "caption", "w", "h"]
    delta = snapshot_diff(old.drop("img_key"), new.drop("img_key"), ["image_id"], cols)
    return snapshot_apply(old.drop("img_key"), delta, ["image_id"], cols)


def q_revisit_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only (tests/test_parity_rowsonly.py replays the lag-window gap
    statistics in DuckDB value-exactly; tests/test_temporal.py pins a numpy
    oracle, tie/singleton semantics and the single-Exchange plan): per-cell
    revisit cadence at grid res 4 — n_obs, span, min/max consecutive gap,
    mean gap (exact integer division; gaps telescope to the span) — the
    staleness/over-revisit map of the catalog
    (operators/temporal.py::revisit_stats)."""
    from stac_catalog_builder_spark.operators.temporal import revisit_stats

    res = 4
    nx, ny = 2 ** (res + 1), 2**res
    df = _images_fp(spark, sf_dir).select(
        F.least(
            F.greatest(F.floor((F.col("lon") + 180.0) / 360.0 * nx), F.lit(0)),
            F.lit(nx - 1),
        ).alias("gx"),
        F.least(
            F.greatest(F.floor((F.col("lat") + 90.0) / 180.0 * ny), F.lit(0)),
            F.lit(ny - 1),
        ).alias("gy"),
        "datetime",
    )
    return revisit_stats(df, ["gx", "gy"], "datetime")


def q_focal_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only (tests/test_parity_rowsonly.py replays density -> scatter
    -> neighborhood aggregate in DuckDB value-exactly; tests/test_focal.py
    proves exact equality with a dense numpy convolution incl. antimeridian
    wrap and pole clamp): 3x3 focal density surface at grid res 6 — the
    fact table reduces to per-cell counts first (one data-sized shuffle),
    the convolution then runs on the dimension-sized density table as a
    scatter explode + sum, own-count and focal sum in ONE aggregate
    (operators/focal.py::focal_smooth)."""
    from stac_catalog_builder_spark.operators.focal import cell_density, focal_smooth

    dens = cell_density(_images_fp(spark, sf_dir), "lon", "lat", 6)
    return focal_smooth(dens, 6, 1)


HIST_LO, HIST_HI, HIST_BINS = 0, 128, 64
HIST_QS = [250_000, 500_000, 900_000, 990_000]


def q_hist_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only (tests/test_parity_rowsonly.py replays registers ->
    cumulative window -> ceil-rank selection in DuckDB value-exactly;
    tests/test_sketches.py proves the bracket contains the true quantile
    and merge == direct): mergeable fixed-bin histogram over caption
    lengths per asset type, quantiles answered from a register table of at
    most n_bins rows per group with error bounded by one bin width —
    deterministic, unlike percentile_approx, and sum-mergeable across
    batches like the CMS (operators/sketches.py::hist_registers)."""
    from stac_catalog_builder_spark.operators.sketches import (
        hist_quantiles,
        hist_registers,
    )

    vals = synth.images(spark, sf_dir).select(
        "asset_type", F.length("caption").alias("v")
    )
    regs = hist_registers(vals, ["asset_type"], "v", HIST_LO, HIST_HI, HIST_BINS)
    return hist_quantiles(
        regs, ["asset_type"], HIST_QS, HIST_LO, HIST_HI, HIST_BINS
    )


def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only (tests/test_parity_rowsonly.py replays the seeded fmix32
    lanes, register build and min-over-lanes estimates in DuckDB
    value-exactly; tests/test_sketches.py proves est >= true for every key
    and merge == direct): Count-Min frequency sketch over a skewed key
    column (half the rows collapse onto 97 heavy perceptual hashes) —
    registers are d x w cells regardless of input size, sum-mergeable
    across batches, point-queried for the heavy candidates and compared
    with their exact counts (operators/sketches.py::cms_registers)."""
    from stac_catalog_builder_spark.operators.sketches import (
        cms_estimate,
        cms_registers,
    )

    df = synth.images(spark, sf_dir).select(
        F.when(F.col("phash") % 4 < 2, F.col("phash") % 97)
        .otherwise(F.col("phash"))
        .alias("k")
    )
    regs = cms_registers(df, [], "k")
    cand = df.where(F.col("k") < 97).distinct()
    est = cms_estimate(regs, cand, [], "k")
    exact = df.where(F.col("k") < 97).groupBy("k").agg(
        F.count(F.lit(1)).alias("exact_cnt")
    )
    return exact.join(est, "k").select("k", "exact_cnt", "est_cnt")


def q_corpus_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only (tests/test_parity_rowsonly.py replays hash -> bottom-k
    registers -> union-sketch pair overlap in DuckDB value-exactly;
    tests/test_sketches.py proves the Jaccard estimate lands within the
    sketch error band of the exact value and union-merge == direct): KMV
    bottom-k overlap estimation between the four (asset_type, year)
    sub-corpora over an engineered shared key space — pairwise Jaccard /
    union / intersection estimates from k=1024 registers per group, never
    joining raw keys (operators/sketches.py::kmv_registers)."""
    from stac_catalog_builder_spark.operators.sketches import (
        kmv_pair_overlap,
        kmv_registers,
    )

    # 60% of rows key on their 12-image block id (shared across all four
    # groups — every block spans both asset types and both years), the rest
    # on a globally unique key: every pair overlaps partially, so both the
    # common and the disjoint sketch paths are exercised. A plain scramble
    # of the dense img_key space is a low-discrepancy lattice whose residues
    # partition BY GROUP (zero overlap — measured), hence the block design.
    df = synth.images(spark, sf_dir).select(
        F.concat_ws("_", "asset_type", "year").alias("g"),
        F.expr(
            "CASE WHEN img_key % 5 < 3 THEN img_key div 12"
            " ELSE 1000000 + img_key END"
        ).alias("k"),
    )
    regs = kmv_registers(df, ["g"], "k")
    return kmv_pair_overlap(regs, "g")


HILBERT_ORDER = 8


def q_hilbert_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only (tests/test_parity_rowsonly.py replays the per-level
    quadrant-digit + rotation recurrence as a DuckDB recursive CTE
    value-exactly; tests/test_cells.py proves exhaustive equality with the
    numpy reference, unit-step adjacency and quadrant recursion, and the
    layout test measures bbox probes touching 3.3x fewer files than a
    lon-clustered layout on 2-D-uniform occupancy at 64 files): Hilbert
    index of each image's 256x256 grid cell — the spatial clustering key
    for data-skipping file layout
    (functions/cells.py::hilbert_d_col, sources/layout.py::cluster_by)."""
    from stac_catalog_builder_spark.functions.cells import hilbert_d_col

    n = 1 << HILBERT_ORDER
    df = _images_fp(spark, sf_dir).select(
        "image_id",
        F.least(
            F.greatest(F.floor((F.col("lon") + 180.0) / 360.0 * n), F.lit(0)),
            F.lit(n - 1),
        ).alias("gx"),
        F.least(
            F.greatest(F.floor((F.col("lat") + 90.0) / 180.0 * n), F.lit(0)),
            F.lit(n - 1),
        ).alias("gy"),
    )
    return df.select(
        "image_id",
        "gx",
        "gy",
        hilbert_d_col(F.col("gx"), F.col("gy"), HILBERT_ORDER).alias("hkey"),
    )


DBSCAN_RES, DBSCAN_MIN_PTS = 6, 3


def q_spatial_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only (tests/test_parity_rowsonly.py replays counts -> core
    cells -> neighbor edges -> recursive-CTE components -> border adoption
    in DuckDB value-exactly; tests/test_clustering.py pins a numpy
    flood-fill oracle incl. antimeridian wrap): grid DBSCAN over scene
    centroids at res 6 (128x64 cells, min_pts 3) — contiguous acquisition
    sites as connected components of dense cells, with border cells
    adopting their minimum core-neighbor cluster; only the per-cell count
    aggregate touches the fact table
    (operators/clustering.py::grid_dbscan)."""
    from stac_catalog_builder_spark.operators.clustering import grid_dbscan

    return grid_dbscan(
        _images_fp(spark, sf_dir), "lon", "lat", DBSCAN_RES, DBSCAN_MIN_PTS
    )


PATCH_SIZE, PATCH_STRIDE = 64, 48


def q_patch_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only (tests/test_parity_rowsonly.py replays the lattice explode
    and the integer pixel->geo affine in DuckDB value-exactly;
    tests/test_patches.py pins a numpy oracle, tail/alignment/too-small
    edge cases and the zero-Exchange plan): every image (1-in-5 slice)
    exploded into its 64px/stride-48 georeferenced patch lattice — patch
    pixel origins plus exact micro-degree patch bboxes, zero pixel decodes
    (operators/patches.py::patch_grid)."""
    from stac_catalog_builder_spark.operators.patches import patch_grid

    imgs = _images_fp(spark, sf_dir).where(F.col("img_key") % 5 == 0)
    return patch_grid(imgs, patch=PATCH_SIZE, stride=PATCH_STRIDE)


GAPFILL_STEP_S = 21600  # 6-hour grid


def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only (tests/test_parity_rowsonly.py replays the tick grid and
    the forward-fill window in DuckDB value-exactly; tests/test_temporal.py
    pins a pandas resample oracle plus alignment/staleness edge cases):
    per-event-type sensor regularization — the last reading as of every
    6-hour grid tick with its staleness, from one min/max aggregate, a
    sequence explode and ONE window pass
    (operators/temporal.py::gap_fill)."""
    from stac_catalog_builder_spark.operators.temporal import gap_fill

    obs = (
        read_parquet(spark, f"{sf_dir}/events.parquet")
        .select(
            "event_type",
            F.unix_timestamp("ts").alias("t_s"),
            "value",
        )
        .groupBy("event_type", "t_s")
        .agg(F.max("value").alias("v"))
    )
    return gap_fill(obs, ["event_type"], "t_s", "v", GAPFILL_STEP_S)


def q_moment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only (tests/test_parity_rowsonly.py replays the power sums and
    fixed-point mean/variance in DuckDB value-exactly;
    tests/test_sketches.py proves merge == direct and the exact numpy
    twin; tests/test_streaming.py maintains the same state per epoch):
    algebraic normalization statistics — exact int64 (n, sum, sum-of-
    squares, min, max) per (asset_type, fmt) over caption lengths, with
    mean/variance as exact integer fixed-point; the mergeable-moments
    member of the sketch family (operators/sketches.py::moment_stats)."""
    from stac_catalog_builder_spark.operators.sketches import (
        moment_registers,
        moment_stats,
    )

    vals = synth.images(spark, sf_dir).select(
        "asset_type", "fmt", F.length("caption").alias("v")
    )
    regs = moment_registers(vals, ["asset_type", "fmt"], "v")
    return moment_stats(regs, ["asset_type", "fmt"])


def q_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only (tests/test_parity_rowsonly.py replays the scramble rank
    in DuckDB value-exactly; tests/test_sampling.py pins exact-k,
    prefix-nesting, repartition-invariance, and the WindowGroupLimit
    plan): exactly-7-per-(lang, source) deterministic sample of the
    documents corpus — the reproducible reservoir-sample replacement for
    eval-set quotas (operators/sampling.py::group_sample)."""
    from stac_catalog_builder_spark.operators.sampling import group_sample

    docs = _docs(spark, sf_dir).select(
        "doc_id", "lang", "source", "n_chars"
    )
    return group_sample(docs, ["lang", "source"], "doc_id", k=7, salt=3)


def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only (tests/test_parity_rowsonly.py replays the change-point
    windows in DuckDB value-exactly; tests/test_diff.py pins the
    reconstruction property, one-is_current-per-key, and the
    single-Exchange plan): SCD-type-2 validity intervals over a 3-version
    synthetic reprocessing history of the image catalog — cloud_pct and
    status evolve deterministically per key, and the history collapses to
    one row per (image, run of identical state)
    (operators/diff.py::scd2_history)."""
    from stac_catalog_builder_spark.operators.diff import scd2_history

    img = synth.images(spark, sf_dir).select("img_key", "image_id", "phash")
    hist = img.withColumn("v", F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))))
    cloud = (
        F.col("phash") % 100
        + F.when((F.col("v") >= 1) & (F.col("img_key") % 3 == 0), 7).otherwise(0)
        + F.when((F.col("v") >= 2) & (F.col("img_key") % 4 == 0), 11).otherwise(0)
    ).cast("int")
    status = F.when(
        (F.col("v") >= 1) & (F.col("img_key") % 5 == 0), F.lit("reprocessed")
    ).otherwise(F.lit("published"))
    hist = hist.select(
        "image_id", "v", cloud.alias("cloud_pct"), status.alias("status")
    )
    return scd2_history(hist, ["image_id"], "v", ["cloud_pct", "status"])


def q_fixity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only (tests/test_parity_rowsonly.py replays sha256 canon +
    both combining lanes in DuckDB value-exactly; tests/test_sketches.py
    pins the hashlib twin, merge == direct, corruption/duplicate
    detection): per-(asset_type, fmt) content-integrity digests of the
    image catalog — n_items plus order-invariant sum-mod-P and xor lanes
    over each row's sha256, the three-numbers-per-collection audit that
    replaces comparing 10^12 hashes after a migration
    (operators/sketches.py::fixity_registers)."""
    from stac_catalog_builder_spark.operators.sketches import fixity_registers

    img = synth.images(spark, sf_dir).select(
        "asset_type", "fmt", "image_id", "caption", "w", "h"
    )
    return fixity_registers(
        img, ["asset_type", "fmt"], ["image_id", "caption", "w", "h"]
    )


def q_overview_pyramid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only (pytest test_multimodal.py proves every level decodes to
    exactly the repeated numpy 2x2 box decimation of its source,
    byte-identical across runs): COG-style overview generation — each
    image expands to its chain of half-resolution levels, exact integer
    kernel, Arrow-batched, shuffle-free. Emits per-level dims + payload
    crc32 so the row check pins actual bytes
    (operators/multimodal.py::overview_pyramid)."""
    imgs = multimodal.with_encoded_bytes(
        _images_fp(spark, sf_dir).where(F.col("img_key") < 500)
    )
    out = multimodal.overview_pyramid(imgs, max_levels=3, min_dim=8)
    return out.select(
        "image_id", "level", "w", "h", F.crc32(F.col("bytes")).alias("payload_crc")
    )


def q_union_area(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only (tests/test_parity_rowsonly.py replays the whole
    decomposition in DuckDB value-exactly; tests/test_overlap.py pins a
    brute-force paint oracle incl. identical/contained/abutting
    pathologies and cell-size invariance): EXACT dissolved footprint area
    per asset_type — grid-decomposed rectangle union (clip to cells,
    x-slab sweep, y-interval fold), int64 micro-lattice end to end, plus
    the hull for the compactness ratio
    (operators/overlap.py::footprint_union_area)."""
    from stac_catalog_builder_spark.operators.overlap import footprint_union_area

    return footprint_union_area(_images_fp(spark, sf_dir), ["asset_type"])


def q_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only (tests/test_parity_rowsonly.py replays the exact haversine
    predicate against a brute cross join in DuckDB value-exactly;
    tests/test_knn.py pins a numpy brute-force oracle incl. antimeridian
    wrap and cell-size invariance): within-distance spatial join — every
    image within 120 km of each ground-station query, grid-bucketed 3x3
    candidates + exact JVM haversine, never a cross join
    (operators/knn.py::radius_join)."""
    from stac_catalog_builder_spark.operators.knn import radius_join

    qs = synth.knn_queries(spark, sf_dir).select(
        "query_id", F.col("qlon").alias("lon"), F.col("qlat").alias("lat")
    )
    out = radius_join(qs, _images_fp(spark, sf_dir), radius_m=120_000.0)
    return out.select(
        "query_id",
        "image_id",
        F.floor(F.col("dist_m") * 1000.0 + F.lit(0.5)).cast("bigint").alias("dist_mm"),
    )


def q_inverted_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only (tests/test_parity_rowsonly.py replays tokenize ->
    tf -> df -> prune in DuckDB value-exactly; tests/test_textops.py pins
    a Counter twin and the broadcast-df plan): the corpus inverted index —
    (term, df, doc_id, tf) postings with min_df=3 hapax pruning, the exact
    integer layer under any tf-idf/BM25 scorer
    (operators/textops.py::inverted_postings)."""
    from stac_catalog_builder_spark.operators.textops import inverted_postings

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    return inverted_postings(docs, min_df=3, max_df=2000)


def q_composite_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only (tests/test_composite.py proves every tile byte-equal to
    a per-pixel python twin of the whole regrid+composite pipeline, plus
    single-scene identity and repartition determinism): pixel-level mosaic
    compositing — overlapping scenes regridded onto the global 10-micro
    lattice (nearest neighbor, exact int64) and composited per map tile as
    the integer per-pixel mean; pixels cross the wire exactly once as
    per-tile blocks (operators/composite.py::composite_tiles)."""
    from stac_catalog_builder_spark.operators.composite import composite_tiles

    imgs = multimodal.with_encoded_bytes(
        _images_fp(spark, sf_dir).where(F.col("img_key") < 300)
    )
    out = composite_tiles(imgs, tile_cells=64)
    return out.select(
        "tile_x",
        "tile_y",
        "n_scenes",
        "covered_px",
        F.crc32(F.col("bytes")).alias("payload_crc"),
    )


def q_tile_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only (tests/test_composite.py pins exact known deltas — a
    +17-grey-level epoch reports mean_abs_diff_e3 == 17000 on every
    shared pixel — threshold classification, one-sided coverage, and
    identical-epoch silence): per-tile change detection between the
    catalog's two acquisition years — composite each epoch on the shared
    global lattice, one tile-keyed full outer join, integer per-pixel
    compare where both covered (operators/composite.py::tile_change)."""
    from stac_catalog_builder_spark.operators.composite import tile_change

    imgs = multimodal.with_encoded_bytes(
        _images_fp(spark, sf_dir).where(F.col("img_key") < 600)
    )
    return tile_change(
        imgs.where(F.col("year") == 2000),
        imgs.where(F.col("year") == 2001),
        threshold=8,
    )


def q_rasterize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only (tests/test_composite.py pins a coordinate-comparison
    oracle for rectangles — independent of the production ray cast — a
    winding-number cross-check for hexagons, and exact cross-tile cell
    accounting): vector -> raster — the catalog's collection boundary
    polygons painted into per-tile masks on the shared lattice, the other
    direction of the raster<->vector bridge
    (operators/composite.py::rasterize_polygons)."""
    from stac_catalog_builder_spark.operators.composite import rasterize_polygons

    out = rasterize_polygons(
        spark, _boundary_polygons(spark, sf_dir), tile_cells=64, cell_micro=640
    )
    return out.select(
        "tile_x",
        "tile_y",
        "label",
        "n_inside_px",
        F.crc32(F.col("mask")).alias("mask_crc"),
    )


def q_contrastive_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only (tests/test_parity_rowsonly.py replays the shuffle rank +
    wrap-offset join in DuckDB value-exactly; tests/test_sampling.py pins
    exactly-k, no-self-pair, salt rotation, and repartition invariance):
    deterministic negative sampling for contrastive training — every
    document anchors exactly 4 negatives from the salted shuffle order
    (operators/sampling.py::contrastive_negatives)."""
    from stac_catalog_builder_spark.operators.sampling import (
        contrastive_negatives,
    )

    docs = _docs(spark, sf_dir).select("doc_id")
    return contrastive_negatives(docs, "doc_id", k=4, salt=2)


def q_masked_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only (tests/test_composite.py pins exact known values — a
    value-100 scene masked by a half-tile rectangle reports mean_e3
    100000 with a coordinate-comparison pixel count — plus
    tiles-restriction row-identity): zonal statistics over the MOSAIC —
    composite the hot scenes, rasterize the collection boundaries onto
    the same lattice restricted to the data's tiles, clip and aggregate
    per boundary label (operators/composite.py::masked_composite_stats)."""
    from stac_catalog_builder_spark.operators.composite import (
        composite_tiles,
        masked_composite_stats,
        rasterize_polygons,
    )

    imgs = multimodal.with_encoded_bytes(
        _images_fp(spark, sf_dir).where(F.col("img_key") < 300)
    )
    # the composite feeds both the mask's tile restriction and the stats
    # join — materialize it once (lazy, same pattern as the CC machinery)
    comps = composite_tiles(imgs, tile_cells=64).localCheckpoint(eager=False)
    masks = rasterize_polygons(
        spark,
        _boundary_polygons(spark, sf_dir),
        tile_cells=64,
        cell_micro=10,
        tiles=comps.select("tile_x", "tile_y"),
    )
    return masked_composite_stats(comps, masks)


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only (tests/test_textops.py pins a from-scratch python BM25 to
    1e-6 incl. the top-k ordering, and the no-query-term exclusion
    boundary): ranked retrieval over the corpus — BM25 top-10 for a fixed
    query over the inverted_postings integer layer; the postings filter
    to the query's terms via a broadcast semi-join, so a q-term query
    touches q posting lists, never the corpus
    (operators/textops.py::bm25_topk)."""
    from stac_catalog_builder_spark.operators.textops import bm25_topk

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    return bm25_topk(docs, ["data", "pipeline", "quality"], k=10)


def q_contrast_stretch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only (tests/test_multimodal.py pins every stretched payload to
    exactly the numpy transform under the GROUP's min/max, byte-identical
    reruns, and the constant-group guard): corpus-statistics image
    normalization — linear contrast stretch per asset_type, exact integer
    math, the per-sensor preprocessing a vision pipeline applies before
    training (operators/multimodal.py::contrast_stretch)."""
    imgs = multimodal.with_encoded_bytes(
        _images_fp(spark, sf_dir).where(F.col("img_key") < 500)
    )
    out = multimodal.contrast_stretch(imgs)
    return out.select(
        "image_id", "lo", "hi", F.crc32(F.col("bytes")).alias("payload_crc")
    )


def q_training_contexts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only (tests/test_training_plan.py runs the WHOLE pipeline with
    shard delivery and asserts the composition invariants: contamination
    never reaches a shard, planted near-dup twins never contribute, every
    context respects the budget, re-runs are byte-identical no-ops): the
    end-to-end training-data plan — clean -> decontaminate -> dedup ->
    leakage-safe split -> chunk -> pack, returning the packed contexts
    with provenance (plans/training.py::build_training_contexts)."""
    from stac_catalog_builder_spark.plans.training import build_training_contexts

    docs = _docs(spark, sf_dir).select(
        "doc_id", "text"
    )
    bench = docs.where("doc_id < 5").select("text")
    contexts, _, _, _ = build_training_contexts(spark, docs, bench, salt=3)
    return contexts.select(
        "context_id", "n_tokens", "n_chunks", "doc_ids"
    )


def q_equi_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only (tests/test_parity_rowsonly.py replays registers ->
    ceil-rank thresholds -> the value>=threshold bucket count in DuckDB
    value-exactly; tests/test_sketches.py pins balance and boundary
    semantics): equi-depth quartile buckets of document length per lang —
    curriculum/stratification binning WITHOUT a global sort (an ntile
    window would serialize each group through one task)
    (operators/sketches.py::equi_depth_buckets)."""
    from stac_catalog_builder_spark.operators.sketches import equi_depth_buckets

    docs = _docs(spark, sf_dir).select(
        "doc_id", "lang", "n_chars"
    )
    return equi_depth_buckets(
        docs, ["lang"], "n_chars", n_buckets=4, lo=0, hi=4096, n_bins=512
    ).select("doc_id", "lang", "n_chars", F.col("bucket").cast("int").alias("bucket"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Driver query registry.

    ORDERING CONTRACT: the driver's correctness gate checks the first 50
    entries.  Every query with an exact DuckDB oracle in ``oracle_sql()``
    MUST come before every rows-only (no-oracle) query so the hard
    rows+schema+hash signal covers the maximum number of components.
    Enforced by ``tests/test_entry_parity.py::test_oracle_backed_first``.
    """
    return {
        # --- exact-oracle-backed (must all fit in the driver's 50-row window) ---
        "footprints": q_footprints,
        "cell_assign": q_cell_assign,
        "tile_assign": q_tile_assign,
        "spatial_join": q_spatial_join,
        "extent_by_collection": q_extent_by_collection,
        "extent_rollup": q_extent_rollup,
        "item_grouping": q_item_grouping,
        "knn": q_knn,
        "knn_cellring": q_knn_cellring,
        "pathparse": q_pathparse,
        "href_rewrite": q_href_rewrite,
        "time_range_join": q_time_range_join,
        "first_asset": q_first_asset,
        "tile_cover": q_tile_cover,
        "salted_extent": q_salted_extent,
        "semi_join": q_semi_join,
        "anti_join": q_anti_join,
        "set_ops": q_set_ops,
        "events_pivot": q_events_pivot,
        "footprint_overlap_join": q_footprint_overlap_join,
        "config_join": q_config_join,
        "bands_explode": q_bands_explode,
        "tags_merge": q_tags_merge,
        "datetime_norm": q_datetime_norm,
        "tile_topk_density": q_tile_topk_density,
        "footprint_wkt": q_footprint_wkt,
        "json_extract": q_json_extract,
        "offset_limit": q_offset_limit,
        "dedup_exact": q_dedup_exact,
        "token_stats": q_token_stats,
        "quality_score": q_quality_score,
        "lang_id": q_lang_id,
        "doc_length_quantiles": q_doc_length_quantiles,
        "repetition_stats": q_repetition_stats,
        "text_clean": q_text_clean,
        "doc_chunks": q_doc_chunks,
        "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
        "ann_cosine_topk": q_ann_cosine_topk,
        "pricing_summary": q_pricing_summary,
        "top_orders": q_top_orders,
        "revenue_by_nation": q_revenue_by_nation,
        "events_hourly": q_events_hourly,
        "sessionize": q_sessionize,
        "session_windows": q_session_windows,
        "asof_join": q_asof_join,
        "token_topk": q_token_topk,
        "image_decode_stats": q_image_decode_stats,
        "ann_quantized_topk": q_ann_quantized_topk,
        "collection_summary": q_collection_summary,
        "precision_round": q_precision_round,
        # --- rows-only (non-SQL-expressible; property-tested in pytest) ---
        "hex_cells": q_hex_cells,
        "s2_cells": q_s2_cells,
        "image_embedding_topk": q_image_embedding_topk,
        "audio_features": q_audio_features,
        "video_frame_sample": q_video_frame_sample,
        "minhash_pairs": q_minhash_pairs,
        "simhash_pairs": q_simhash_pairs,
        "doc_fingerprint": q_doc_fingerprint,
        "ann_lsh_topk": q_ann_lsh_topk,
        "ivf_topk": q_ivf_topk,
        "embedding_neardup": q_embedding_neardup,
        "dedup_groups": q_dedup_groups,
        "caption_image_retrieval": q_caption_image_retrieval,
        "spatial_join_partitioned": q_spatial_join_partitioned,
        "zonal_stats": q_zonal_stats,
        "knn_cellring_fixed": q_knn_cellring_fixed,
        "dataset_split": q_dataset_split,
        "data_mixture": q_data_mixture,
        "deterministic_shuffle": q_deterministic_shuffle,
        "sequence_pack": q_sequence_pack,
        "incremental_extents": q_incremental_extents,
        "image_dedup_groups": q_image_dedup_groups,
        "phash_neardup": q_phash_neardup,
        "image_augment": q_image_augment,
        "decontaminate": q_decontaminate,
        "temporal_coverage": q_temporal_coverage,
        "hll_distinct": q_hll_distinct,
        "tile_pyramid": q_tile_pyramid,
        "compact_cover": q_compact_cover,
        "leakage_safe_split": q_leakage_safe_split,
        "best_scene_mosaic": q_best_scene_mosaic,
        "geohash_cells": q_geohash_cells,
        "catalog_diff": q_catalog_diff,
        "temperature_sample": q_temperature_sample,
        "aspect_buckets": q_aspect_buckets,
        "footprint_iou": q_footprint_iou,
        "cms_heavy_hitters": q_cms_heavy_hitters,
        "catalog_merge": q_catalog_merge,
        "hist_quantiles": q_hist_quantiles,
        "focal_density": q_focal_density,
        "revisit_stats": q_revisit_stats,
        "corpus_overlap": q_corpus_overlap,
        "hilbert_index": q_hilbert_index,
        "spatial_clusters": q_spatial_clusters,
        "patch_grid": q_patch_grid,
        "gap_fill": q_gap_fill,
        "moment_stats": q_moment_stats,
        "group_sample": q_group_sample,
        "scd2_history": q_scd2_history,
        "fixity_audit": q_fixity_audit,
        "overview_pyramid": q_overview_pyramid,
        "union_area": q_union_area,
        "radius_join": q_radius_join,
        "inverted_postings": q_inverted_postings,
        "composite_tiles": q_composite_tiles,
        "tile_change": q_tile_change,
        "rasterize": q_rasterize,
        "contrastive_negatives": q_contrastive_negatives,
        "masked_stats": q_masked_stats,
        "bm25_topk": q_bm25_topk,
        "contrast_stretch": q_contrast_stretch,
        "training_contexts": q_training_contexts,
        "equi_depth": q_equi_depth,
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
        "knn_cellring": oracles.sql_knn(k=5),  # exact pruning: same oracle
        "pathparse": oracles.sql_pathparse(period="monthly"),
        "href_rewrite": oracles.sql_href_rewrite(),
        "time_range_join": oracles.sql_time_range_join(),
        "first_asset": oracles.sql_first_asset(),
        "tile_cover": oracles.sql_tile_cover(zoom=8),
        "salted_extent": oracles.sql_salted_extent(),
        # hex_cells / s2_cells: rows-only (property-tested in pytest)
        "semi_join": oracles.sql_semi_join(),
        "anti_join": oracles.sql_anti_join(),
        "set_ops": oracles.sql_set_ops(),
        "events_pivot": oracles.sql_events_pivot(),
        "footprint_overlap_join": oracles.sql_footprint_overlap_join(),
        "config_join": oracles.sql_config_join(),
        "bands_explode": oracles.sql_bands_explode(),
        "tags_merge": oracles.sql_tags_merge(),
        "datetime_norm": oracles.sql_datetime_norm(),
        "tile_topk_density": oracles.sql_tile_topk_density(),
        "footprint_wkt": oracles.sql_footprint_wkt(),
        "json_extract": oracles.sql_json_extract(),
        "offset_limit": oracles.sql_offset_limit(),
        "dedup_exact": oracles.sql_dedup_exact(),
        "token_stats": oracles.sql_token_stats(),
        "quality_score": oracles.sql_quality_score(),
        "lang_id": oracles.sql_lang_id(),
        "doc_length_quantiles": oracles.sql_doc_length_quantiles(),
        "repetition_stats": oracles.sql_repetition_stats(),
        "text_clean": oracles.sql_text_clean(),
        "doc_chunks": oracles.sql_doc_chunks(chunk_tokens=64, overlap=16),
        "ngram_jaccard_pairs": oracles.sql_ngram_jaccard_pairs(max_gap=3),
        "ann_cosine_topk": oracles.sql_ann_cosine_topk(k=5, n_queries=20),
        "pricing_summary": oracles.sql_pricing_summary(),
        "top_orders": oracles.sql_top_orders(limit=10),
        "revenue_by_nation": oracles.sql_revenue_by_nation(),
        "events_hourly": oracles.sql_events_hourly(),
        "sessionize": oracles.sql_sessionize(gap_minutes=30),
        "session_windows": oracles.sql_session_windows(gap_minutes=30),
        "asof_join": oracles.sql_asof_join(),
        "token_topk": oracles.sql_token_topk(k=50),
        "image_decode_stats": oracles.sql_image_decode_stats(key_lt=2000),
        "ann_quantized_topk": oracles.sql_ann_quantized_topk(k=5, n_queries=20),
        "collection_summary": oracles.sql_collection_summary(),
        "precision_round": oracles.sql_precision_round(),
        # no oracle (non-SQL-expressible -> rows-only checks):
        # hex_cells, s2_cells, image_embedding_topk, audio_features,
        # video_frame_sample, minhash_pairs, simhash_pairs, doc_fingerprint,
        # ann_lsh_topk, ivf_topk, embedding_neardup
    }

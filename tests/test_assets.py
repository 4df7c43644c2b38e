"""Tags map / bands struct / datetime cascade / config loader / WKT /
template layout tests (reference parity: metadata.py:149-153, 322-325,
554-590; config.py:62-237, 304-312; boundingbox.py:95-171;
builder.py:203-216, 521-528)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from stac_catalog_builder_spark.functions.geo import bbox_wkt, micro_decimal_str
from stac_catalog_builder_spark.operators import assets
from stac_catalog_builder_spark.operators.grouping import items_from_assets
from stac_catalog_builder_spark.sources import catalog, config


def test_sanitize_tags_casts_keys_and_values(spark):
    df = spark.createDataFrame(
        [(1,)], "id int"
    ).select(
        F.map_from_arrays(
            F.array(F.lit(10), F.lit(20)),
            F.array(F.lit(1.5), F.lit(None).cast("double")),
        ).alias("tags")
    )
    out = df.select(assets.sanitize_tags(F.col("tags")).alias("t")).collect()[0].t
    assert out == {"10": "1.5", "20": None}


def test_merge_tags_override_wins(spark):
    df = spark.createDataFrame([(1,)], "id int").select(
        F.create_map(
            F.lit("a"), F.lit("base_a"), F.lit("b"), F.lit("base_b")
        ).alias("tags")
    )
    override = F.create_map(F.lit("b"), F.lit("OVR"), F.lit("c"), F.lit("new"))
    out = df.select(assets.merge_tags(F.col("tags"), override).alias("t")).collect()[0].t
    assert out == {"a": "base_a", "b": "OVR", "c": "new"}


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("2001-02-03T04:05:06", "2001-02-03 04:05:06"),
        ("2001-02-03 04:05:06", "2001-02-03 04:05:06"),
        ("2001-02-03", "2001-02-03 00:00:00"),
        ("not a date", None),
    ],
)
def test_normalize_datetime_cascade(spark, raw, expected):
    df = spark.createDataFrame([(raw,)], "s string")
    got = df.select(assets.normalize_datetime(F.col("s")).alias("ts")).collect()[0].ts
    assert (str(got) if got is not None else None) == expected


def test_items_enforce_consistency_raises(spark):
    bad = spark.createDataFrame(
        [
            ("itm", "a1", "t", 2000, 1, 0.0, 0.0, 1.0, 1.0),
            ("itm", "a2", "t", 2001, 2, 0.0, 0.0, 1.0, 1.0),  # datetime mismatch
        ],
        "item_id string, image_id string, asset_type string, year int, "
        "month int, fp_w double, fp_s double, fp_e double, fp_n double",
    ).withColumn("datetime", F.to_timestamp(F.format_string("%04d-%02d-01", "year", "month")))
    with pytest.raises(Exception, match="inconsistent item group"):
        items_from_assets(bad, enforce_consistency=True).collect()
    good = bad.withColumn("year", F.lit(2000)).withColumn("month", F.lit(1))
    assert items_from_assets(good, enforce_consistency=True).count() == 1


def test_items_datetime_distinct_null_semantics(spark):
    """ADVICE r3: n_datetime_distinct must keep countDistinct semantics on
    nullable inputs — a row with NULL year (or month) does not count as a
    distinct (year, month), where a naive collect_set(struct(...)) would
    keep the NULL-field struct."""
    rows = spark.createDataFrame(
        [
            ("itm", "a1", "t", 2000, 1, 0.0, 0.0, 1.0, 1.0),
            ("itm", "a2", "t", None, 1, 0.0, 0.0, 1.0, 1.0),  # NULL year
            ("itm", "a3", "t", 2000, None, 0.0, 0.0, 1.0, 1.0),  # NULL month
        ],
        "item_id string, image_id string, asset_type string, year int, "
        "month int, fp_w double, fp_s double, fp_e double, fp_n double",
    ).withColumn(
        "datetime",
        F.try_to_timestamp(F.format_string("%04d-%02d-01", "year", "month")),
    )
    out = items_from_assets(rows).collect()
    assert len(out) == 1
    assert out[0].n_datetime_distinct == 1


def test_config_loader_and_dimension(spark, tmp_path):
    cfg = config.load_collection_config()
    assert cfg["collection_id"] == "observations"
    dim = config.asset_config_df(spark, cfg)
    rows = {r.asset_type: r for r in dim.collect()}
    assert set(rows) == {"2m-temp-monthly", "tot-precip-monthly", "never-produced"}
    assert [b.name for b in rows["tot-precip-monthly"].bands] == ["precip", "precip_qa"]
    assert rows["2m-temp-monthly"].bands[0].nodata == -9999
    # missing required field -> error
    p = tmp_path / "bad.json"
    p.write_text(json.dumps({"collection_id": "x"}))
    with pytest.raises(ValueError, match="item_assets"):
        config.load_collection_config(p)


@pytest.mark.parametrize(
    "val,expected",
    [(1.234564, "1.23456"), (-0.5, "-0.50000"), (0.0, "0.00000"), (-179.999996, "-180.00000")],
)
def test_micro_decimal_str(spark, val, expected):
    df = spark.createDataFrame([(val,)], "x double")
    assert df.select(micro_decimal_str(F.col("x")).alias("s")).collect()[0].s == expected


def test_micro_decimal_str_randomized(spark):
    """500 random doubles: the Spark string must equal the exact integer
    decomposition computed in Python (sign-magnitude micro-degrees)."""
    import numpy as np

    rng = np.random.default_rng(11)
    vals = (rng.uniform(-180, 180, 500)).tolist()

    def expected(x: float) -> str:
        import math

        u = int(math.floor(x * 100000.0 + 0.5))
        a = abs(u)
        return f"{'-' if u < 0 else ''}{a // 100000}.{a % 100000:05d}"

    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [r.s for r in df.select(micro_decimal_str(F.col("x")).alias("s")).collect()]
    assert got == [expected(v) for v in vals]


def test_bbox_wkt_form(spark):
    df = spark.createDataFrame([(-1.5, -0.25, 2.0, 3.75)], "w double, s double, e double, n double")
    got = df.select(
        bbox_wkt(F.col("w"), F.col("s"), F.col("e"), F.col("n")).alias("wkt")
    ).collect()[0].wkt
    assert got == (
        "POLYGON ((-1.50000 -0.25000, 2.00000 -0.25000, "
        "2.00000 3.75000, -1.50000 3.75000, -1.50000 -0.25000))"
    )


def test_template_layout_sink(spark, tmp_path):
    items = spark.createDataFrame(
        [("c1", 2000, 3, "itm_1"), ("c1", 2001, 11, "itm_2")],
        "collection_id string, year int, month int, item_id string",
    )
    n = catalog.write_items_templated(
        items, str(tmp_path), "{collection_id}/{year}/{month:02d}/{item_id}.json"
    )
    assert n == 2
    assert (tmp_path / "c1" / "2000" / "03" / "itm_1.json").exists()
    assert (tmp_path / "c1" / "2001" / "11" / "itm_2.json").exists()
    body = json.loads((tmp_path / "c1" / "2000" / "03" / "itm_1.json").read_text())
    assert body["item_id"] == "itm_1" and "item_path" not in body

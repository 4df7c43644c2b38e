"""snapshot_diff: added/removed/changed semantics incl. NULL compare cols."""

from __future__ import annotations

from stac_catalog_builder_spark.operators.diff import snapshot_diff


def _snap(spark, rows):
    return spark.createDataFrame(rows, "id string, fmt string, n int")


def test_diff_classifies_all_change_types(spark):
    old = _snap(spark, [("a", "png", 1), ("b", "raw", 2), ("c", "png", 3)])
    new = _snap(spark, [("a", "png", 1), ("b", "webp", 2), ("d", "raw", 9)])
    got = {
        r["id"]: r
        for r in snapshot_diff(old, new, ["id"], ["fmt", "n"]).collect()
    }
    assert set(got) == {"b", "c", "d"}  # 'a' unchanged -> omitted
    assert got["b"]["change_type"] == "changed" and got["b"]["fmt"] == "webp"
    assert got["c"]["change_type"] == "removed" and got["c"]["fmt"] is None
    assert got["d"]["change_type"] == "added" and got["d"]["n"] == 9


def test_null_compare_columns_are_null_safe(spark):
    old = _snap(spark, [("a", None, 1), ("b", None, 2)])
    new = _snap(spark, [("a", None, 1), ("b", "raw", 2)])
    got = {r["id"]: r["change_type"] for r in
           snapshot_diff(old, new, ["id"], ["fmt", "n"]).collect()}
    # NULL == NULL is unchanged; NULL vs value is changed
    assert got == {"b": "changed"}


def test_empty_sides(spark):
    old = _snap(spark, [("a", "png", 1)])
    new = _snap(spark, []).limit(0)
    got = snapshot_diff(old, new, ["id"], ["fmt", "n"]).collect()
    assert [(r["id"], r["change_type"]) for r in got] == [("a", "removed")]
    got2 = snapshot_diff(new, old, ["id"], ["fmt", "n"]).collect()
    assert [(r["id"], r["change_type"]) for r in got2] == [("a", "added")]


# --- snapshot_apply (MERGE INTO) -------------------------------------------

from pyspark.sql import functions as F

from stac_catalog_builder_spark.operators.diff import snapshot_apply


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_apply_roundtrip_identity(spark):
    """apply(old, diff(old, new)) must reconstruct new EXACTLY — including
    NULL-valued compare columns and add/remove/change all at once."""
    old = _snap(spark, [("a", "png", 1), ("b", "raw", 2), ("c", "png", 3),
                        ("e", None, 5)])
    new = _snap(spark, [("a", "png", 1), ("b", "webp", 2), ("d", None, 9),
                        ("e", "raw", None)])
    delta = snapshot_diff(old, new, ["id"], ["fmt", "n"])
    rebuilt = snapshot_apply(old, delta, ["id"], ["fmt", "n"])
    assert _sorted_rows(rebuilt) == _sorted_rows(new)


def test_apply_empty_delta_is_identity(spark):
    old = _snap(spark, [("a", "png", 1), ("b", "raw", 2)])
    delta = snapshot_diff(old, old, ["id"], ["fmt", "n"])
    assert delta.count() == 0
    rebuilt = snapshot_apply(old, delta, ["id"], ["fmt", "n"])
    assert _sorted_rows(rebuilt) == _sorted_rows(old)


def test_apply_roundtrip_on_corpus(spark):
    """Roundtrip at corpus scale over the synthetic snapshots the driver
    entry uses (drops ~5% of keys, rewrites fmt on ~8%, NULLs a caption
    slice) — equality row-for-row with the target snapshot."""
    import __spark_entry__ as e
    from stac_catalog_builder_spark import synth

    imgs = synth.images(spark, "/root/testdata/sf0.001").select(
        "img_key", "image_id", "fmt", "caption", "w", "h"
    )
    old = imgs.where(F.col("img_key") % 19 != 3)
    new = imgs.where(F.col("img_key") % 17 != 5).withColumn(
        "fmt",
        F.when(F.col("img_key") % 13 == 0, F.lit("webp")).otherwise(F.col("fmt")),
    ).withColumn(
        "caption",
        F.when(F.col("img_key") % 23 == 1, F.lit(None)).otherwise(F.col("caption")),
    )
    cols = ["fmt", "caption", "w", "h"]
    delta = snapshot_diff(old.drop("img_key"), new.drop("img_key"), ["image_id"], cols)
    rebuilt = snapshot_apply(old.drop("img_key"), delta, ["image_id"], cols)
    assert _sorted_rows(rebuilt) == _sorted_rows(new.drop("img_key"))

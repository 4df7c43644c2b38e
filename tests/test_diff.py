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

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


# --- scd2_history -----------------------------------------------------------


def _hist(spark):
    from pyspark.sql import functions as F

    rows = [
        # key a: state changes at v1, back at v2 (A->B->A = 3 intervals)
        ("a", 0, "A", 1),
        ("a", 1, "B", 1),
        ("a", 2, "A", 1),
        # key b: never changes (1 interval)
        ("b", 0, "A", 7),
        ("b", 1, "A", 7),
        ("b", 2, "A", 7),
        # key c: NULL -> NULL (no change) then NULL -> value (change)
        ("c", 0, None, 2),
        ("c", 1, None, 2),
        ("c", 2, "C", 2),
        # key d: appears late (first observation opens the interval)
        ("d", 2, "D", 9),
    ]
    return spark.createDataFrame(rows, "id string, v int, s string, n int")


def test_scd2_intervals_and_current(spark):
    from stac_catalog_builder_spark.operators.diff import scd2_history

    out = scd2_history(_hist(spark), ["id"], "v", ["s", "n"]).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r.id, []).append(r)
    for k in by_key:
        by_key[k].sort(key=lambda r: r.valid_from)
    assert [(r.valid_from, r.valid_to, r.s) for r in by_key["a"]] == [
        (0, 1, "A"),
        (1, 2, "B"),
        (2, None, "A"),
    ]
    assert [(r.valid_from, r.valid_to, r.s) for r in by_key["b"]] == [(0, None, "A")]
    # NULL == NULL is not a change; NULL -> value is
    assert [(r.valid_from, r.valid_to, r.s) for r in by_key["c"]] == [
        (0, 2, None),
        (2, None, "C"),
    ]
    assert [(r.valid_from, r.valid_to, r.s) for r in by_key["d"]] == [(2, None, "D")]
    # exactly one current row per key; valid_to chains to the next valid_from
    for k, rows in by_key.items():
        assert sum(r.is_current for r in rows) == 1
        assert rows[-1].is_current and rows[-1].valid_to is None
        for a, b in zip(rows, rows[1:]):
            assert a.valid_to == b.valid_from


def test_scd2_reconstructs_full_history(spark):
    """Joining every (key, version) of the original history into its
    enclosing interval must reproduce the observed state exactly — the
    round-trip that proves no change point was missed or fabricated."""
    from pyspark.sql import functions as F

    from stac_catalog_builder_spark.operators.diff import scd2_history

    hist = _hist(spark)
    scd = scd2_history(hist, ["id"], "v", ["s", "n"])
    recon = hist.alias("h").join(
        scd.alias("s"),
        (F.col("h.id") == F.col("s.id"))
        & (F.col("h.v") >= F.col("s.valid_from"))
        & (F.col("h.v") < F.coalesce(F.col("s.valid_to"), F.lit(10**9))),
        "inner",
    )
    assert recon.count() == hist.count()  # every observation in EXACTLY one interval
    mism = recon.where(
        ~F.col("h.s").eqNullSafe(F.col("s.s")) | ~F.col("h.n").eqNullSafe(F.col("s.n"))
    )
    assert mism.count() == 0


def test_scd2_single_exchange_plan(spark):
    """Both window passes partition by the same keys: ONE exchange total
    (the filtered second window reuses the first's partitioning)."""
    from stac_catalog_builder_spark.operators.diff import scd2_history

    plan = (
        scd2_history(_hist(spark), ["id"], "v", ["s", "n"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan

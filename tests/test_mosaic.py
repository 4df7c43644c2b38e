"""best_scene_mosaic: selection semantics + aggregate (not window) plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from stac_catalog_builder_spark.operators.mosaic import best_scene_mosaic


def _frame(spark, rows):
    return spark.createDataFrame(
        rows, "tile string, image_id string, cloud int, datetime timestamp"
    )


def test_selection_order_clear_beats_cloudy_recent_beats_old(spark):
    import datetime as dt

    t = dt.datetime(2020, 1, 1)
    t2 = dt.datetime(2021, 1, 1)
    rows = [
        # tile A: one clear (cloud 15) beats a less-cloudy-but-over (25)? no —
        # 15 <= 20 is clear, 25 is over: clear wins even though 25 > 15 anyway;
        # make it interesting: clear 18 must beat over-threshold 5? impossible
        # (5 < 20 is clear too) — so: clear 18 beats over 21
        ("A", "a_clear18", 18, t),
        ("A", "a_over21", 21, t2),
        # tile B: two clear with equal cloud -> most recent wins
        ("B", "b_old", 10, t),
        ("B", "b_new", 10, t2),
        # tile C: all cloudy -> least-bad survives (keep-best-even-if-cloudy)
        ("C", "c_90", 90, t),
        ("C", "c_55", 55, t2),
    ]
    out = {
        r["tile"]: r
        for r in best_scene_mosaic(
            _frame(spark, rows), ["tile"], "cloud", "datetime", "image_id", 20
        ).collect()
    }
    assert out["A"]["best_image_id"] == "a_clear18"
    assert out["A"]["n_clear"] == 1 and out["A"]["n_candidates"] == 2
    assert out["B"]["best_image_id"] == "b_new"
    assert out["C"]["best_image_id"] == "c_55"
    assert out["C"]["n_clear"] == 0 and out["C"]["min_cloud"] == 55


def test_unique_id_tiebreak_total_order(spark):
    import datetime as dt

    t = dt.datetime(2020, 6, 1)
    rows = [("T", f"img_{i:02d}", 7, t) for i in range(5)]
    out = best_scene_mosaic(
        _frame(spark, rows), ["tile"], "cloud", "datetime", "image_id", 20
    ).collect()
    assert len(out) == 1 and out[0]["best_image_id"] == "img_00"


def test_no_threshold_drops_clear_columns(spark):
    import datetime as dt

    rows = [("T", "x", 3, dt.datetime(2020, 1, 1))]
    df = best_scene_mosaic(
        _frame(spark, rows), ["tile"], "cloud", "datetime", "image_id", None
    )
    assert "n_clear" not in df.columns
    assert df.collect()[0]["best_image_id"] == "x"


def test_plan_is_one_aggregate_no_window(spark):
    """The 100 TB shape: a partial-aggregated groupBy, NOT a window — only
    per-tile partials may cross the exchange."""
    import __spark_entry__ as e

    df = e.q_best_scene_mosaic(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "partial_min_by" in plan or "partial" in plan.lower(), plan

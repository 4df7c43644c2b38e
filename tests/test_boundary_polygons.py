"""Entry driver-side dimension fast paths == their Spark derivations,
bit-for-bit.

``_boundary_polygons`` and ``_knn_query_points`` load 25-row dimensions
driver-side with a direct pyarrow read of nation.parquet (skipping one
whole Spark job per calling query); these tests pin the replicated
arithmetic — ids, every coordinate as an exact IEEE double, row order and
dtypes — against the original Spark derivations at both driver check
tiers.
"""

from __future__ import annotations

import numpy as np

import __spark_entry__ as e
from stac_catalog_builder_spark import synth
from stac_catalog_builder_spark.functions.geo import rect_ring


def _spark_derived(spark, sf_dir):
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


def test_boundary_polygons_match_spark_derivation(spark):
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        got = e._boundary_polygons(spark, sf_dir)
        want = _spark_derived(spark, sf_dir)
        assert len(got) == len(want) == 25
        for g, w in zip(got, want):
            assert g["tile_id"] == w["tile_id"]
            assert g["collection_id"] == w["collection_id"]
            # exact double equality, not approx: the PIP refine and the
            # DuckDB oracle CTE both depend on these exact bit patterns
            assert np.array_equal(g["ring_x"], w["ring_x"])
            assert np.array_equal(g["ring_y"], w["ring_y"])


def test_knn_query_points_match_spark_derivation(spark):
    import pandas as pd

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        got = e._knn_query_points(sf_dir)
        want = synth.knn_queries(spark, sf_dir).toPandas()
        assert list(got.columns) == ["query_id", "qlon", "qlat"]
        # exact: same values, same row order, same dtypes (float64 coords)
        pd.testing.assert_frame_equal(got, want, check_exact=True)

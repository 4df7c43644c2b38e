"""Range-clustered layout tests: files carry disjoint cell ranges (so
min/max statistics prune range scans), and content round-trips."""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as e
from stac_catalog_builder_spark.functions.cells import grid_cell_col
from stac_catalog_builder_spark.sources.layout import file_ranges, write_clustered

SF = "/root/testdata/sf0.001"


def test_clustered_write_has_disjoint_cell_ranges(spark, tmp_path):
    imgs = e._images_fp(spark, SF).select(
        "image_id", "lon", "lat",
        grid_cell_col(F.col("lon"), F.col("lat"), 7).alias("cell"),
    )
    out = str(tmp_path / "clustered")
    write_clustered(imgs, out, "cell", n_files=16)

    ranges = file_ranges(spark, out, "cell")
    assert len(ranges) >= 8  # actually sharded
    spans = sorted((lo, hi) for _, lo, hi in ranges)
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2  # disjoint (boundary value may repeat across files)
    # content identical
    assert spark.read.parquet(out).count() == imgs.count()
    # pruning in action: a range predicate covering one file's span must be
    # answerable from a fraction of the data (count matches the unclustered
    # computation)
    lo, hi = spans[0]
    got = spark.read.parquet(out).where(F.col("cell").between(lo, hi)).count()
    want = imgs.where(F.col("cell").between(lo, hi)).count()
    assert got == want > 0

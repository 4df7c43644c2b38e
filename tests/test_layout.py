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


def test_hilbert_layout_skips_more_files_than_lon_sort(spark, tmp_path):
    """The data-skipping claim behind hilbert_d_col: cluster the same table
    into the same number of files by (a) Hilbert key and (b) raw gx (a
    lon-sorted layout), then count how many files a bbox probe must read —
    a file is read iff its [min, max] grid bbox intersects the box, which
    is exactly what parquet footer min/max pruning decides. Hilbert files
    are compact ~sqrt(cells/file)-sided blocks; lon-sorted files are
    full-height stripes, so once stripes are thinner than the probe a box
    query crosses many of them. Measured here in that (lake-scale) regime
    on 2-D-uniform occupancy: 64 files over a 64x64 grid, 6x6 probes ->
    9 vs 30 files touched (3.3x), asserted at a 2x margin.

    Honesty note, measured while building this test: on the CATALOG's own
    distribution (latitude-limited, 30% of rows in one hot cell — closer
    to 1.5-D than 2-D) plain lon clustering is within ~1.2x of Hilbert at
    16-128 files, because stripes collapse to near-points on the hot cell
    and the occupied latitude band is narrow. The layout key should follow
    the workload's occupancy, not the textbook: hilbert_d_col is the right
    default only when both dimensions genuinely vary."""
    from stac_catalog_builder_spark.functions.cells import hilbert_d_col

    order, n, n_files = 6, 64, 64
    cells = spark.range(0, n * n * 4).select((F.col("id") % (n * n)).alias("c"))
    imgs = (
        cells.select(
            (F.col("c") % n).alias("gx"), (F.col("c") / n).cast("long").alias("gy")
        )
        .withColumn("hkey", hilbert_d_col(F.col("gx"), F.col("gy"), order))
    )
    hil_dir, lon_dir = str(tmp_path / "hil"), str(tmp_path / "lon")
    write_clustered(imgs, hil_dir, "hkey", n_files=n_files)
    write_clustered(imgs, lon_dir, "gx", n_files=n_files)

    def file_boxes(path):
        return (
            spark.read.parquet(path)
            .groupBy(F.input_file_name().alias("f"))
            .agg(
                F.min("gx").alias("x0"), F.max("gx").alias("x1"),
                F.min("gy").alias("y0"), F.max("gy").alias("y1"),
            )
            .collect()
        )

    hil, lon = file_boxes(hil_dir), file_boxes(lon_dir)
    assert len(hil) == len(lon) == n_files

    def touched(boxes, bx0, bx1, by0, by1):
        return sum(
            1
            for r in boxes
            if r.x1 >= bx0 and r.x0 <= bx1 and r.y1 >= by0 and r.y0 <= by1
        )

    probes = [(10, 15, 10, 15), (30, 35, 40, 45), (50, 55, 20, 25),
              (5, 10, 50, 55), (40, 45, 5, 10)]
    hil_total = sum(touched(hil, *p) for p in probes)
    lon_total = sum(touched(lon, *p) for p in probes)
    assert hil_total * 2 < lon_total, (hil_total, lon_total)

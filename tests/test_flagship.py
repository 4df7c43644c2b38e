"""Flagship plan tests: lifecycle parity with the reference's
build_collection (reference stacbuilder/builder.py:795-809) — grouping
ratios, postprocessor hook, partitioned sink + resumable lineage."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from stac_catalog_builder_spark.plans.flagship import build_catalog

SF = "/root/testdata/sf0.001"


def test_build_catalog_stage_counts(spark):
    r = build_catalog(spark, SF)
    n_images = r["images"].count()
    assert r["assigned"].count() == n_images  # grid partitions the domain
    # 2 assets per item (reference tests/test_builder.py:242-244 semantics)
    assert r["items"].count() == n_images // 2
    assert r["extents"].count() == 25  # 5x5 tile grid, all populated
    # rollup: 5 collections x 2 years + 5 collection roots + 1 global root
    assert r["rollup"].count() == 16


def test_item_postprocessor_hook(spark):
    def postproc(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["n_assets"] = pdf["n_assets"] * 10  # visible marker
            yield pdf

    r = build_catalog(spark, SF, item_postprocessor=postproc)
    vals = {row.n_assets for row in r["items"].select("n_assets").distinct().collect()}
    assert vals == {20}  # 2 assets/item x10


def test_flagship_sink_and_resume(spark, tmp_path):
    out = tmp_path / "cat"
    build_catalog(spark, SF, out_dir=str(out))
    # partitioned items in y/m/d layout
    assert list((out / "items").glob("year=*/month=*/day=*"))
    # lineage + metrics + snapshots landed
    snaps = [json.loads(line) for line in (out / "assignments" / "_snapshots.json").read_text().splitlines()]
    assert len(snaps) == 1
    assert sorted(snaps[0]["partitions"]) == [f"coll_{i}" for i in range(5)]
    metrics = spark.read.parquet(str(out / "assignments" / "_metrics"))
    assert metrics.count() == 5
    # resume: all partitions complete -> pending is empty
    from stac_catalog_builder_spark.sources.checkpoint import SnapshotStore

    store = SnapshotStore(str(out / "assignments"))
    work = spark.createDataFrame([(f"coll_{i}",) for i in range(5)], "part_key string")
    # note: stage dir layout is <root>/<stage>/...; the store was rooted at
    # out_dir in build_catalog, stage name "assignments"
    store2 = SnapshotStore(str(out))
    assert store2.pending(work, spark, "assignments", "part_key").count() == 0

#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Headline metric: the flagship spatial-join + tile-assignment pipeline
(BASELINE.json `metric`), reported as wall seconds with images/sec derived.
Each query is forced end-to-end with a noop write (all columns materialized,
nothing collected to the driver).

Measurement protocol matches BENCH/BASELINE.md: one untimed warm-up pass
(JIT compilation of the fused codegen methods, python-worker spawn, parquet
footer caches), then MEDIAN OF 3 measured passes per query — this VM has
multi-minute noisy-neighbor windows (documented in BENCH/BASELINE.md) that
poisoned two rounds' single-pass committed records (VERDICT r3 #3); the
median absorbs one bad window. The cold first-pass flagship time and the
raw per-pass flagship walls are reported alongside for transparency;
steady-state is the number that models a long-running production job.

Usage:
  python bench.py                      # env-driven (driver protocol)
  python bench.py --master local[8]    # scaling evidence runs
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from stac_catalog_builder_spark.session import get_spark  # noqa: E402


def _force(df) -> int:
    """Materialize every column of every row; return row count."""
    df.write.format("noop").mode("overwrite").save()
    return -1


def run_suite(spark, sf_dir: str) -> tuple[dict[str, float], dict[str, float]]:
    import __spark_entry__ as e

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    def timed(name: str, fn):
        t0 = time.time()
        out = fn()
        timings[name] = round(time.time() - t0, 3)
        return out

    # flagship: footprints -> cells -> PIP spatial join -> tile assign ->
    # extent aggregation, one fused plan (what the metric measures).
    # Dimension prep (driver-side polygon cover classification) is one-time
    # and cluster-size independent — excluded from the measured window, same
    # protocol as bench_scaling.py.
    from stac_catalog_builder_spark.operators.spatial_join import (
        prepare_polygon_dim,
        spatial_join_pip,
    )
    from stac_catalog_builder_spark.operators.tiling import with_tile
    from stac_catalog_builder_spark.operators.grouping import collection_extents

    n_images = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    dim = prepare_polygon_dim(spark, e._boundary_polygons(spark, sf_dir))

    def flagship():
        # NOTE: both sinks recompute the (cheap, fully-codegen'd) scan+join —
        # measured FASTER than persisting `assigned` (wide-row cache
        # materialization costs more than the recompute at this width)
        assigned = spatial_join_pip(e._images_fp(spark, sf_dir), dim=dim)
        tiled = with_tile(assigned, zoom=6)
        _force(tiled.select("image_id", "tile_id", "collection_id", "tile_x", "tile_y"))
        _force(collection_extents(assigned, ["collection_id", "tile_id"]))

    timed("flagship_spatial_join", flagship)
    extras["images_per_sec"] = round(n_images / timings["flagship_spatial_join"], 1)
    extras["n_images"] = n_images

    bench_queries = [
        "cell_assign",
        "tile_assign",
        "item_grouping",
        "extent_rollup",
        "knn",
        "knn_cellring",
        "knn_cellring_fixed",
        "dedup_exact",
        "minhash_pairs",
        "simhash_pairs",
        "ann_cosine_topk",
        "ann_lsh_topk",
        "tags_merge",
        "bands_explode",
        "tile_topk_density",
        "pricing_summary",
        "revenue_by_nation",
        "events_hourly",
        "sessionize",
        "spatial_join_partitioned",
        "dedup_groups",
        "sequence_pack",
        "temporal_coverage",
        "hll_distinct",
        "tile_pyramid",
        "group_sample",
        "scd2_history",
        "fixity_audit",
        "radius_join",
        "inverted_postings",
        # union_area is deliberately NOT here: ~21s/pass at sf0.1 (exact
        # rectangle-union dissolve over the hot cluster) would dominate the
        # suite wall; its cell-size study + sf0.1 walls are committed in
        # ROUND5.md instead.
    ]
    qs = e.queries()
    for name in bench_queries:
        timed(name, lambda n=name: _force(qs[n](spark, sf_dir)))

    # sink path (VERDICT r4 #4): the reference's actual bottleneck is its
    # item-save pool (async_utils.py:35-56). write_items = the partitioned
    # JSON item sink (S7); resume = an exactly-once checkpointed stage write
    # plus the anti-join resume probe proving a re-run has nothing pending.
    # Fresh dirs per pass (in /dev/shm, like the staged inputs) so every
    # pass measures a cold sink, cleanup outside the timed window.
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from stac_catalog_builder_spark import synth
    from stac_catalog_builder_spark.sources.catalog import write_items_partitioned
    from stac_catalog_builder_spark.sources.checkpoint import SnapshotStore

    items = synth.images(spark, sf_dir).select(
        "image_id", "item_id", "asset_type", "datetime", "w", "h", "fmt"
    )
    tmp = tempfile.mkdtemp(prefix="scb_bench_sink_", dir="/dev/shm")
    try:
        timed(
            "write_items",
            lambda: write_items_partitioned(items, f"{tmp}/items", fmt="json"),
        )

        def resume():
            mgr = SnapshotStore(f"{tmp}/ckpt")
            keyed = items.withColumn("ym", F.date_format("datetime", "yyyy-MM"))
            mgr.write_stage(keyed, "items", "ym")
            n_pending = mgr.pending(keyed, spark, "items", "ym").count()
            assert n_pending == 0, n_pending

        timed("resume", resume)

        # training-delivery sink: pack a bounded slice into WebDataset tar
        # shards (payload encode included — the realistic cost); fresh dir
        # per pass so every pass measures a cold sink
        from stac_catalog_builder_spark.operators.multimodal import (
            with_encoded_bytes,
        )
        from stac_catalog_builder_spark.sources.shards import (
            write_webdataset_shards,
        )

        wds_src = with_encoded_bytes(
            synth.images(spark, sf_dir).where(F.col("img_key") < 4000)
        )

        def write_shards():
            man = write_webdataset_shards(
                wds_src,
                f"{tmp}/wds_{time.time_ns()}",
                n_shards=32,
                meta_cols=["caption", "fmt", "w", "h"],
            ).collect()
            assert sum(m["n_members"] for m in man) > 0

        timed("write_shards", write_shards)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return timings, extras


def run_benchmark(
    spark, sf_dir: str, passes: int = 3
) -> tuple[dict[str, float], dict[str, float]]:
    """Warm-up pass (untimed) + ``passes`` measured passes; per-query MEDIAN
    (the JIT/worker-spawn cold costs are a per-JVM constant, not a per-query
    property; the median makes the committed record robust to one
    noisy-neighbor window)."""
    import statistics

    cold, _ = run_suite(spark, sf_dir)
    runs: list[dict[str, float]] = []
    extras: dict[str, float] = {}
    for _ in range(passes):
        spark.catalog.clearCache()  # operators persist intermediates; reset
        t, extras = run_suite(spark, sf_dir)
        runs.append(t)
    timings = {
        k: round(statistics.median([r[k] for r in runs]), 3) for k in runs[0]
    }
    extras["images_per_sec"] = round(
        extras["n_images"] / timings["flagship_spatial_join"], 1
    )
    extras["cold_flagship_sec"] = cold["flagship_spatial_join"]
    extras["passes"] = passes
    extras["flagship_runs"] = [r["flagship_spatial_join"] for r in runs]
    return timings, extras


def box_probe_sec() -> float:
    """Single-thread host-health probe: one numpy transcendental pass over
    20M doubles — ~0.4s when this box is healthy. BENCH/BASELINE.md
    documents hour-long hypervisor windows where this reads 4-33s while the
    guest sees 0% steal / 99.9% idle and every Spark wall inflates 3-7x;
    embedding the reading makes a degraded-window record self-describing."""
    import numpy as np

    x = np.arange(1, 20_000_000, dtype=np.float64)
    t0 = time.time()
    np.sqrt(np.sin(x) ** 2 + np.cos(x) ** 2)
    return round(time.time() - t0, 2)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--master", default=None)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--passes", type=int, default=3)
    args = ap.parse_args()

    sf = args.sf_dir.rstrip("/").split("sf")[-1]
    probe_before = box_probe_sec()
    spark = get_spark(
        app="scb-bench", master=args.master, shuffle_partitions=args.shuffle_partitions
    )
    cores = spark.sparkContext.defaultParallelism
    t0 = time.time()
    timings, extras = run_benchmark(spark, args.sf_dir, passes=args.passes)
    total = round(time.time() - t0, 3)
    spark.stop()
    extras["box_probe_sec_before"] = probe_before
    extras["box_probe_sec_after"] = box_probe_sec()
    extras["box_probe_healthy_ref"] = 0.4

    print(
        json.dumps(
            {
                "metric": "flagship_spatial_join_tile_assign_sec",
                "value": timings["flagship_spatial_join"],
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
                "total_sec": total,
                "cores": cores,
                **extras,
            }
        )
    )


if __name__ == "__main__":
    main()

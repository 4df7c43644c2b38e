"""Structured Streaming tests: the streaming rollup must agree with its batch
twin, and the foreachBatch sink must land lineage in the SnapshotStore."""

from __future__ import annotations

import shutil

import pytest

from stac_catalog_builder_spark.plans.relational import events_hourly
from stac_catalog_builder_spark.sources.checkpoint import SnapshotStore
from stac_catalog_builder_spark.streaming import events as streaming_events

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def events_dir(tmp_path):
    # file-source streams want a directory of files
    d = tmp_path / "events_src"
    d.mkdir()
    shutil.copy(f"{SF}/events.parquet", d / "events.parquet")
    return str(d)


def test_streaming_rollup_matches_batch(spark, events_dir):
    stream_out = streaming_events.run_to_memory(spark, events_dir, "t_rollup")
    got = {
        (r.hour_epoch, r.event_type): (r.n_events, r.sum_value_x1000)
        for r in stream_out.collect()
    }
    want = {
        (r.hour_epoch, r.event_type): (r.n_events, r.sum_value_x1000)
        for r in events_hourly(spark, SF).collect()
    }
    assert got == want


def test_streaming_session_windows_match_batch(spark, tmp_path):
    """Session-window stream (watermark-finalized, append mode) == the same
    session_window aggregation run in batch. A far-future sentinel file
    advances the watermark past every real session so all finalize; the
    sentinel user is excluded from the comparison."""
    import time

    from pyspark.sql import functions as F

    d = tmp_path / "sess_src"
    d.mkdir()
    shutil.copy(f"{SF}/events.parquet", d / "a_events.parquet")
    real = spark.read.parquet(f"{SF}/events.parquet")
    sentinel = real.limit(1).select(
        F.lit(999).alias("event_id"),
        (F.col("ts") + F.expr("INTERVAL 1000 DAYS")).alias("ts"),
        F.lit(-1).cast("long").alias("user_id"),
        F.lit("view").alias("event_type"),
        F.lit(0.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    sentinel.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "sent"))
    time.sleep(1.1)  # file-source orders by mod time: sentinel must be LAST
    sent_file = next((tmp_path / "sent").glob("*.parquet"))
    shutil.copy(sent_file, d / "z_sentinel.parquet")

    out = streaming_events.run_sessions_to_memory(spark, str(d), "t_sessions")
    got = {
        (r.user_id, r.session_start_s): (r.n_events, r.sum_value_x1000)
        for r in out.where("user_id >= 0").collect()
    }
    want = {
        (r.user_id, r.session_start_s): (r.n_events, r.sum_value_x1000)
        for r in streaming_events.session_rollup(real).collect()
    }
    assert got == want
    assert len(got) > 0


def test_streaming_dedup_within_watermark(spark, events_dir):
    """Built-in dropDuplicatesWithinWatermark: exactly one row per key
    survives (count matches the batch countDistinct), and unique keys pass
    through untouched."""
    out = streaming_events.run_dedup_to_memory(
        spark, events_dir, ["user_id", "event_type"], "t_dedup"
    )
    batch = spark.read.parquet(f"{SF}/events.parquet")
    want = batch.select("user_id", "event_type").distinct().count()
    assert out.count() == want
    # unique key -> passthrough
    out2 = streaming_events.run_dedup_to_memory(
        spark, events_dir, ["event_id"], "t_dedup_id"
    )
    assert out2.count() == batch.count()


def test_stream_stream_interval_join_matches_batch(spark, events_dir):
    """Stream-stream interval join (watermark-bounded state) == the same
    join expression over the batch table."""
    from pyspark.sql import functions as F

    out = streaming_events.run_interval_join_to_memory(spark, events_dir)
    got = {(r.user_id, r.purchase_id, r.signup_id) for r in out.collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet")
    want_df = streaming_events.interval_join(
        ev.where(F.col("event_type") == "purchase"),
        ev.where(F.col("event_type") == "signup"),
    )
    want = {(r.user_id, r.purchase_id, r.signup_id) for r in want_df.collect()}
    assert got == want
    assert len(got) > 0


def test_streaming_foreach_batch_to_store(spark, events_dir, tmp_path):
    store = SnapshotStore(tmp_path / "ckpt")
    streaming_events.run_foreach_batch_to_store(spark, events_dir, store)
    out = store.read_stage(spark, "stream_rollup")
    assert out.count() > 0
    assert store.snapshots("stream_rollup")  # lineage/snapshot rows landed


def test_streaming_extent_maintenance_equals_batch(spark, tmp_path):
    """Streaming catalog maintenance: per-epoch algebraic extent increments
    merged at read time must equal the from-scratch batch recompute EXACTLY
    (same rows, same values), across multiple micro-batches."""
    import __spark_entry__ as e
    from pyspark.sql import functions as F
    from stac_catalog_builder_spark.sources.checkpoint import SnapshotStore
    from stac_catalog_builder_spark.operators.grouping import collection_extents
    from stac_catalog_builder_spark.streaming import extents as sx

    keys = ["collection_id", "tile_id"]
    cols = keys + ["image_id", "fp_w", "fp_s", "fp_e", "fp_n", "datetime"]
    assigned = e._assigned(spark, "/root/testdata/sf0.001").select(*cols)
    src = str(tmp_path / "assigned_stream")
    # several files -> several micro-batch epochs at maxFilesPerTrigger=1
    assigned.repartition(4).write.mode("overwrite").parquet(src)

    store = SnapshotStore(str(tmp_path / "ckpt"))
    sx.run_extent_maintenance(spark, src, store, keys)
    assert len(store.snapshots("extent_increments")) >= 2  # multi-epoch run

    def canon(df):
        return sorted(
            (
                r.collection_id,
                r.tile_id,
                r.n_assets,
                round(r.ext_w, 9),
                round(r.ext_s, 9),
                round(r.ext_e, 9),
                round(r.ext_n, 9),
                r.dt_min,
                r.dt_max,
            )
            for r in df.collect()
        )

    live = canon(sx.current_extents(spark, store, keys))
    batch = canon(collection_extents(spark.read.parquet(src), keys))
    assert live == batch and len(live) > 0

    # re-running the whole stream over the same source must be a no-op
    # (every epoch already committed -> zero new snapshots, same extents)
    n_snaps = len(store.snapshots("extent_increments"))
    sx.run_extent_maintenance(spark, src, store, keys)
    assert len(store.snapshots("extent_increments")) == n_snaps
    assert canon(sx.current_extents(spark, store, keys)) == batch


def test_streaming_hll_maintenance_equals_batch(spark, tmp_path):
    """Streaming cardinality maintenance: per-epoch HLL register increments
    max-merged at read time must equal the from-scratch batch sketch EXACTLY
    (registers are integers — no tolerance), and a full stream replay is a
    no-op (idempotent max + epoch lineage)."""
    import __spark_entry__ as e
    from stac_catalog_builder_spark.operators.sketches import hll_distinct
    from stac_catalog_builder_spark.sources.checkpoint import SnapshotStore
    from stac_catalog_builder_spark.streaming import extents as sx

    assigned = e._assigned(spark, "/root/testdata/sf0.001").select(
        "collection_id", "phash"
    )
    src = str(tmp_path / "assigned_hll_stream")
    assigned.repartition(4).write.mode("overwrite").parquet(src)

    store = SnapshotStore(str(tmp_path / "ckpt"))
    sx.run_hll_maintenance(spark, src, store, ["collection_id"], "phash")
    assert len(store.snapshots("hll_increments")) >= 2  # multi-epoch run

    def canon(df):
        return sorted(tuple(r) for r in df.collect())

    live = canon(sx.current_hll(spark, store, ["collection_id"]))
    batch = canon(hll_distinct(spark.read.parquet(src), ["collection_id"], "phash"))
    assert live == batch and len(live) > 0

    n_snaps = len(store.snapshots("hll_increments"))
    sx.run_hll_maintenance(spark, src, store, ["collection_id"], "phash")
    assert len(store.snapshots("hll_increments")) == n_snaps
    assert canon(sx.current_hll(spark, store, ["collection_id"])) == batch


def test_streaming_cms_maintenance_equals_batch(spark, tmp_path):
    """Streaming frequency maintenance: per-epoch CMS register increments
    sum-merged at read time must equal the from-scratch batch sketch EXACTLY,
    and a full stream replay is a no-op — which for a SUM-merging sketch is
    the whole exactly-once claim (a double-landed epoch would double-count,
    unlike the HLL's idempotent max)."""
    import __spark_entry__ as e
    from pyspark.sql import functions as F
    from stac_catalog_builder_spark.operators.sketches import cms_registers
    from stac_catalog_builder_spark.sources.checkpoint import SnapshotStore
    from stac_catalog_builder_spark.streaming import extents as sx

    keyed = e._assigned(spark, "/root/testdata/sf0.001").select(
        "collection_id",
        F.when(F.col("phash") % 4 < 2, F.col("phash") % 97)
        .otherwise(F.col("phash"))
        .alias("k"),
    )
    src = str(tmp_path / "keyed_cms_stream")
    keyed.repartition(4).write.mode("overwrite").parquet(src)

    store = SnapshotStore(str(tmp_path / "ckpt"))
    sx.run_cms_maintenance(spark, src, store, ["collection_id"], "k")
    assert len(store.snapshots("cms_increments")) >= 2  # multi-epoch run

    def canon(df):
        return sorted(tuple(r) for r in df.collect())

    live = canon(sx.current_cms(spark, store, ["collection_id"]))
    batch = canon(cms_registers(spark.read.parquet(src), ["collection_id"], "k"))
    assert live == batch and len(live) > 0

    n_snaps = len(store.snapshots("cms_increments"))
    sx.run_cms_maintenance(spark, src, store, ["collection_id"], "k")
    assert len(store.snapshots("cms_increments")) == n_snaps
    assert canon(sx.current_cms(spark, store, ["collection_id"])) == batch


def test_streaming_hist_maintenance_equals_batch(spark, tmp_path):
    """Streaming histogram maintenance: per-epoch register increments
    sum-merged at read time == the from-scratch batch histogram exactly;
    quantiles over the live state == quantiles over the batch registers;
    replay is a no-op."""
    from pyspark.sql import functions as F
    from stac_catalog_builder_spark import synth
    from stac_catalog_builder_spark.operators.sketches import (
        hist_quantiles,
        hist_registers,
    )
    from stac_catalog_builder_spark.sources.checkpoint import SnapshotStore
    from stac_catalog_builder_spark.streaming import extents as sx

    vals = synth.images(spark, "/root/testdata/sf0.001").select(
        "asset_type", F.length("caption").alias("v")
    )
    src = str(tmp_path / "vals_hist_stream")
    vals.repartition(4).write.mode("overwrite").parquet(src)

    store = SnapshotStore(str(tmp_path / "ckpt"))
    args = (["asset_type"], "v", 0, 128, 64)
    sx.run_hist_maintenance(spark, src, store, *args)
    assert len(store.snapshots("hist_increments")) >= 2

    def canon(df):
        return sorted(tuple(r) for r in df.collect())

    live = sx.current_hist(spark, store, ["asset_type"])
    batch = hist_registers(spark.read.parquet(src), *args)
    assert canon(live) == canon(batch) and live.count() > 0
    assert canon(
        hist_quantiles(live, ["asset_type"], [500_000], 0, 128, 64)
    ) == canon(hist_quantiles(batch, ["asset_type"], [500_000], 0, 128, 64))

    n_snaps = len(store.snapshots("hist_increments"))
    sx.run_hist_maintenance(spark, src, store, *args)
    assert len(store.snapshots("hist_increments")) == n_snaps


def test_streaming_moment_maintenance_equals_batch(spark, tmp_path):
    """Streaming moments maintenance: per-epoch power-sum increments
    sum-merged at read time == the from-scratch batch state exactly
    (mean/variance included — integer fixed-point, no tolerance); replay
    is a no-op (the sum-merge would double-count without the store's
    exactly-once guards)."""
    from pyspark.sql import functions as F
    from stac_catalog_builder_spark import synth
    from stac_catalog_builder_spark.operators.sketches import (
        moment_registers,
        moment_stats,
    )
    from stac_catalog_builder_spark.sources.checkpoint import SnapshotStore
    from stac_catalog_builder_spark.streaming import extents as sx

    vals = synth.images(spark, "/root/testdata/sf0.001").select(
        "asset_type", F.length("caption").alias("v")
    )
    src = str(tmp_path / "vals_moment_stream")
    vals.repartition(4).write.mode("overwrite").parquet(src)

    store = SnapshotStore(str(tmp_path / "ckpt"))
    sx.run_moment_maintenance(spark, src, store, ["asset_type"], "v")
    assert len(store.snapshots("moment_increments")) >= 2

    def canon(df):
        return sorted(tuple(r) for r in df.collect())

    live = canon(sx.current_moments(spark, store, ["asset_type"]))
    batch = canon(
        moment_stats(
            moment_registers(spark.read.parquet(src), ["asset_type"], "v"),
            ["asset_type"],
        )
    )
    assert live == batch and len(live) > 0

    n_snaps = len(store.snapshots("moment_increments"))
    sx.run_moment_maintenance(spark, src, store, ["asset_type"], "v")
    assert len(store.snapshots("moment_increments")) == n_snaps
    assert canon(sx.current_moments(spark, store, ["asset_type"])) == batch


def test_streaming_fixity_maintenance_equals_batch(spark, tmp_path):
    """Streaming integrity maintenance: per-epoch fixity register
    increments lane-merged at read time must equal the from-scratch batch
    digest EXACTLY, and a full stream replay is a no-op — the sum lane
    adds and the xor lane xors, so neither tolerates a double-landed
    epoch (same exactly-once reliance as the CMS)."""
    from stac_catalog_builder_spark.operators.sketches import fixity_registers
    from stac_catalog_builder_spark.sources.checkpoint import SnapshotStore
    from stac_catalog_builder_spark.streaming import extents as sx

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "lang", "source", "text"
    )
    src = str(tmp_path / "docs_fixity_stream")
    docs.repartition(4).write.mode("overwrite").parquet(src)

    store = SnapshotStore(str(tmp_path / "ckpt"))
    sx.run_fixity_maintenance(
        spark, src, store, ["lang", "source"], ["doc_id", "text"]
    )
    assert len(store.snapshots("fixity_increments")) >= 2  # multi-epoch run

    def canon(df):
        return sorted(tuple(r) for r in df.collect())

    live = canon(sx.current_fixity(spark, store, ["lang", "source"]))
    batch = canon(
        fixity_registers(
            spark.read.parquet(src), ["lang", "source"], ["doc_id", "text"]
        )
    )
    assert live == batch and len(live) > 0

    n_snaps = len(store.snapshots("fixity_increments"))
    sx.run_fixity_maintenance(
        spark, src, store, ["lang", "source"], ["doc_id", "text"]
    )
    assert len(store.snapshots("fixity_increments")) == n_snaps
    assert canon(sx.current_fixity(spark, store, ["lang", "source"])) == batch


def test_streaming_composite_maintenance_equals_batch(spark, tmp_path):
    """Streaming mosaic maintenance: per-epoch composite-state increments
    merged+rendered at read time must equal the from-scratch batch mosaic
    BYTE-EXACTLY, and a full stream replay is a no-op (canvas merge is
    addition — a double-landed epoch would skew every shared pixel)."""
    from stac_catalog_builder_spark import synth
    from stac_catalog_builder_spark.operators import multimodal
    from stac_catalog_builder_spark.operators.composite import composite_tiles
    from stac_catalog_builder_spark.operators.footprints import with_footprint
    from stac_catalog_builder_spark.sources.checkpoint import SnapshotStore
    from stac_catalog_builder_spark.streaming import extents as sx

    imgs = multimodal.with_encoded_bytes(
        with_footprint(synth.images(spark, "/root/testdata/sf0.001")).where(
            "img_key < 40"
        )
    ).select("image_id", "bytes", "fmt", "fp_w", "fp_s", "fp_e", "fp_n")
    src = str(tmp_path / "scenes_stream")
    imgs.repartition(4).write.mode("overwrite").parquet(src)

    store = SnapshotStore(str(tmp_path / "ckpt"))
    sx.run_composite_maintenance(spark, src, store)
    assert len(store.snapshots("composite_increments")) >= 2  # multi-epoch

    def canon(df):
        return sorted(
            (r.tile_x, r.tile_y, r.n_scenes, r.covered_px, bytes(r.bytes))
            for r in df.collect()
        )

    live = canon(sx.current_composite(spark, store))
    batch = canon(composite_tiles(spark.read.parquet(src)))
    assert live == batch and len(live) > 0

    n_snaps = len(store.snapshots("composite_increments"))
    sx.run_composite_maintenance(spark, src, store)
    assert len(store.snapshots("composite_increments")) == n_snaps
    assert canon(sx.current_composite(spark, store)) == batch

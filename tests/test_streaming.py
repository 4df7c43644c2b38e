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


def test_streaming_foreach_batch_to_store(spark, events_dir, tmp_path):
    store = SnapshotStore(tmp_path / "ckpt")
    streaming_events.run_foreach_batch_to_store(spark, events_dir, store)
    out = store.read_stage(spark, "stream_rollup")
    assert out.count() > 0
    assert store.snapshots("stream_rollup")  # lineage/snapshot rows landed

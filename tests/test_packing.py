"""Sequence-packing tests: exactly-once chunk coverage, hard budget, high
utilization, determinism independent of input partitioning, oversized-chunk
rejection."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stac_catalog_builder_spark.operators.packing import pack_sequences
from stac_catalog_builder_spark.operators.textops import chunk_documents

SF = "/root/testdata/sf0.001"
BUDGET = 256


@pytest.fixture(scope="module")
def chunks(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    ch = chunk_documents(docs, chunk_tokens=64, overlap=0)
    return ch.select(
        F.concat_ws("_", "doc_id", "chunk_idx").alias("chunk_id"),
        F.col("n_chunk_tokens").alias("n_tokens"),
    )


def test_pack_exactly_once_budget_and_utilization(spark, chunks):
    out = pack_sequences(chunks, BUDGET).cache()
    n_chunks = chunks.count()
    assert out.count() == n_chunks  # every chunk exactly once
    assert out.select("chunk_id").distinct().count() == n_chunks

    per_ctx = out.groupBy("context_id").agg(
        F.sum("n_tokens").alias("total"),
        F.count("*").alias("n"),
        F.max("context_pos").alias("max_pos"),
    )
    rows = per_ctx.collect()
    assert all(r.total <= BUDGET for r in rows)  # hard budget
    assert all(r.max_pos == r.n - 1 for r in rows)  # dense 0-based positions
    # FFD utilization: all but the tail bin per group should be near-full
    total_tokens = sum(r.total for r in rows)
    assert total_tokens / (len(rows) * BUDGET) > 0.85
    out.unpersist()


def test_pack_deterministic_under_repartition(spark, chunks):
    a = {
        (r.chunk_id, r.context_id, r.context_pos)
        for r in pack_sequences(chunks, BUDGET, n_groups=7).collect()
    }
    b = {
        (r.chunk_id, r.context_id, r.context_pos)
        for r in pack_sequences(chunks.repartition(11), BUDGET, n_groups=7).collect()
    }
    assert a == b


def test_pack_rejects_oversized_chunks(spark):
    df = spark.createDataFrame(
        [("a", 10), ("b", 999)], "chunk_id string, n_tokens int"
    )
    with pytest.raises(Exception, match="exceed the packing budget"):
        pack_sequences(df, 100, n_groups=1).collect()
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(df, 0, n_groups=1)


# --- aspect_bucket_batches -------------------------------------------------

BUCKETS = [
    ("16:9", 320, 180),
    ("1:1", 256, 256),
    ("3:2", 300, 200),
    ("4:3", 288, 216),
    ("9:16", 180, 320),
]


def _imgs(spark, n=900):
    from pyspark.sql import functions as F

    sizes = [(240, 180), (180, 120), (64, 64), (256, 256), (200, 340), (512, 200)]
    w = F.element_at(
        F.array(*[F.lit(a) for a, _ in sizes]), (F.col("id") % 6 + 1).cast("int")
    )
    h = F.element_at(
        F.array(*[F.lit(b) for _, b in sizes]), (F.col("id") % 6 + 1).cast("int")
    )
    return spark.range(n).select(
        F.col("id").alias("img_key"),
        F.format_string("i%05d", F.col("id")).alias("image_id"),
        w.cast("int").alias("w"),
        h.cast("int").alias("h"),
    )


def _argmin_bucket(w, h):
    best = None
    for bid, bw, bh in BUCKETS:
        a, b = w * bh, bw * h
        d = max(a, b) / min(a, b)
        k = (d, bid)
        if best is None or k < best[0]:
            best = (k, bid, bw, bh)
    return best[1]


def test_aspect_assignment_is_closest_ratio(spark):
    from stac_catalog_builder_spark.operators.packing import aspect_bucket_batches

    out = aspect_bucket_batches(
        _imgs(spark), BUCKETS, batch_size=16, key_col="img_key", salt=3,
        drop_incomplete=False,
    ).collect()
    for r in out:
        assert r["bucket_id"] == _argmin_bucket(r["w"], r["h"]), r


def test_aspect_batches_complete_dense_and_deterministic(spark):
    from collections import Counter

    from stac_catalog_builder_spark.operators.packing import aspect_bucket_batches

    a = aspect_bucket_batches(
        _imgs(spark), BUCKETS, batch_size=16, key_col="img_key", salt=3
    )
    rows = a.collect()
    # every surviving batch is exactly full, positions dense 0..15
    per_batch = Counter((r["bucket_id"], r["batch_idx"]) for r in rows)
    assert per_batch and all(v == 16 for v in per_batch.values())
    for (b, bi), _ in per_batch.items():
        poss = sorted(
            r["pos_in_batch"] for r in rows
            if r["bucket_id"] == b and r["batch_idx"] == bi
        )
        assert poss == list(range(16))
    # partitioning-independent layout
    b2 = aspect_bucket_batches(
        _imgs(spark).repartition(17), BUCKETS, batch_size=16,
        key_col="img_key", salt=3,
    ).collect()
    key = lambda r: (r["image_id"], r["bucket_id"], r["batch_idx"], r["pos_in_batch"])
    assert sorted(map(key, rows)) == sorted(map(key, b2))


def test_aspect_salt_changes_layout_not_membership(spark):
    from stac_catalog_builder_spark.operators.packing import aspect_bucket_batches

    base = _imgs(spark, 512)
    a = aspect_bucket_batches(base, BUCKETS, 16, key_col="img_key", salt=1,
                              drop_incomplete=False).collect()
    b = aspect_bucket_batches(base, BUCKETS, 16, key_col="img_key", salt=2,
                              drop_incomplete=False).collect()
    assign_a = {r["image_id"]: r["bucket_id"] for r in a}
    assign_b = {r["image_id"]: r["bucket_id"] for r in b}
    assert assign_a == assign_b  # bucket membership is salt-independent
    order_a = {r["image_id"]: (r["batch_idx"], r["pos_in_batch"]) for r in a}
    order_b = {r["image_id"]: (r["batch_idx"], r["pos_in_batch"]) for r in b}
    assert order_a != order_b  # epoch salt permutes the layout


def test_aspect_no_global_sort_in_plan(spark):
    from stac_catalog_builder_spark.operators.packing import aspect_bucket_batches

    df = aspect_bucket_batches(
        _imgs(spark), BUCKETS, batch_size=16, key_col="img_key", salt=3
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan.lower(), plan


def test_aspect_validation(spark):
    import pytest

    from stac_catalog_builder_spark.operators.packing import aspect_bucket_batches

    with pytest.raises(ValueError):
        aspect_bucket_batches(_imgs(spark), [], 16)
    with pytest.raises(ValueError):
        aspect_bucket_batches(_imgs(spark), BUCKETS, 0)
    with pytest.raises(ValueError):
        aspect_bucket_batches(_imgs(spark), BUCKETS, 16, n_blocks=3)

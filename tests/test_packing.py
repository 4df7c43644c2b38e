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

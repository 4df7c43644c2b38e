"""HLL sketch tests: fmix32 kernel vs numpy murmur3 reference, merge
algebra (rollup == direct, batch-union == direct), estimate accuracy vs
exact COUNT(DISTINCT), and the partial-aggregation plan shape."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from stac_catalog_builder_spark.operators.sketches import (
    M_REG,
    fmix32,
    hll_distinct,
    hll_estimate,
    hll_merge,
    hll_registers,
)

SF = "/root/testdata/sf0.001"


def _fmix32_np(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64)
    x ^= x >> np.uint64(16)
    x = (x * np.uint64(0x85EBCA6B)) & np.uint64(0xFFFFFFFF)
    x ^= x >> np.uint64(13)
    x = (x * np.uint64(0xC2B2AE35)) & np.uint64(0xFFFFFFFF)
    x ^= x >> np.uint64(16)
    return x


def test_fmix32_matches_numpy_reference(spark):
    vals = [0, 1, 2, 42, 65535, 65536, 2**31 - 1, 2**31, 2**32 - 1, 123456789]
    got = (
        spark.createDataFrame([(v,) for v in vals], "x long")
        .select(fmix32(F.col("x")).alias("h"))
        .toPandas()["h"]
        .to_numpy()
    )
    want = _fmix32_np(np.array(vals)).astype(np.int64)
    assert (got == want).all()


@pytest.fixture(scope="module")
def assigned(spark):
    import __spark_entry__ as e

    return e._assigned(spark, SF).select("collection_id", "tile_id", "phash").cache()


def test_merge_rollup_equals_direct(spark, assigned):
    """Registers built per (collection, tile) then max-merged to collection
    must equal registers built directly per collection — the algebraic-merge
    property incremental rollups rely on."""
    fine = hll_registers(assigned, ["collection_id", "tile_id"], "phash")
    merged = hll_merge(fine, ["collection_id"]).orderBy("collection_id", "bucket")
    direct = hll_registers(assigned, ["collection_id"], "phash").orderBy(
        "collection_id", "bucket"
    )
    assert merged.collect() == direct.collect()


def test_batch_union_merge_equals_direct(spark, assigned):
    """Sketch state unioned across two disjoint batches and merged == the
    sketch of the full input: the incremental-maintenance path (store
    registers, fold new batches in) loses nothing."""
    b1 = assigned.where(F.col("phash") % 2 == 0)
    b2 = assigned.where(F.col("phash") % 2 != 0)
    r1 = hll_registers(b1, ["collection_id"], "phash")
    r2 = hll_registers(b2, ["collection_id"], "phash")
    folded = hll_merge(r1.unionByName(r2), ["collection_id"]).orderBy(
        "collection_id", "bucket"
    )
    direct = hll_registers(assigned, ["collection_id"], "phash").orderBy(
        "collection_id", "bucket"
    )
    assert folded.collect() == direct.collect()


def test_estimate_accuracy_vs_exact(spark, assigned):
    est = {
        r["collection_id"]: r["est_e3"] / 1000.0
        for r in hll_distinct(assigned, ["collection_id"], "phash").collect()
    }
    exact = {
        r["collection_id"]: r["d"]
        for r in assigned.groupBy("collection_id")
        .agg(F.countDistinct("phash").alias("d"))
        .collect()
    }
    assert set(est) == set(exact)
    for cid, d in exact.items():
        # 3x the theoretical 1.04/sqrt(m) std error; measured max 1.3%
        assert abs(est[cid] - d) / d < 3 * 1.04 / (M_REG**0.5), (cid, est[cid], d)


def test_registers_bounded_and_plan_partial(spark, assigned):
    regs = hll_registers(assigned, ["collection_id"], "phash")
    counts = regs.groupBy("collection_id").count().collect()
    assert all(r["count"] <= M_REG for r in counts)
    # map-side combine: the aggregate appears as partial + final around ONE
    # exchange, and the estimate adds exactly one more — raw keys never
    # shuffle, register rows do
    plan = hll_estimate(regs, ["collection_id"])._jdf.queryExecution().executedPlan().toString()
    # shuffle exchanges only — the upstream PIP join's BroadcastExchanges
    # move the dimension, not the fact table
    assert plan.count("Exchange hashpartitioning") == 2, plan

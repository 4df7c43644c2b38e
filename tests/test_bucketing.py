"""Bucketed co-located join: correctness + the shuffle-free plan property
(the write-once/join-many technique for recurring fact-to-fact joins)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stac_catalog_builder_spark.sources.bucketed import colocated_join, write_bucketed


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # the session warehouse (warehouse.dir is a static conf); managed tables
    # are dropped (data included) on teardown
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    write_bucketed(
        orders.select("o_orderkey", "o_totalprice"), "b_orders", "o_orderkey", 8
    )
    write_bucketed(
        lineitem.select(
            F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
        ),
        "b_lineitem",
        "o_orderkey",
        8,
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_colocated_join_has_no_shuffle(spark, bucketed_tables):
    """With broadcast off (the fact-to-fact regime bucketing exists for —
    at 100 TB neither side broadcasts), the join must read bucket files
    directly: SortMergeJoin with ZERO shuffle exchange on either side."""
    lt, rt = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(colocated_join(spark, lt, rt, "o_orderkey"))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "ShuffleExchange" not in plan and "Exchange hashpartitioning" not in plan
    assert "SortMergeJoin" in plan
    assert "Bucketed: true" in plan


def test_colocated_join_matches_plain_join(spark, bucketed_tables):
    lt, rt = bucketed_tables
    got = colocated_join(spark, lt, rt, "o_orderkey").count()
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    want = orders.join(li, orders.o_orderkey == li.l_orderkey).count()
    assert got == want

"""Relational query plans over the driver's TPC-H-ish tables.

Demonstrates the engine's scan/filter/join/aggregate/window/sort surface with
Catalyst-visible plans (predicate pushdown, broadcast joins for dimension
tables, partial aggregation). Money sums are emitted as exact integer cents
(`floor(x*100+0.5)` per row, summed as BIGINT) so distributed float summation
order can never flip the oracle hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..session import read_parquet


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_parquet(spark, f"{sf_dir}/{name}.parquet")


def _cents(col) -> F.Column:
    return F.floor(col * 100.0 + F.lit(0.5)).cast("bigint")


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy aggregate with pushed-down date filter."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
            F.sum(_cents(F.col("l_extendedprice"))).alias("sum_base_cents"),
            F.sum(
                _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("sum_disc_cents"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def top_orders(spark: SparkSession, sf_dir: str, limit: int = 10) -> DataFrame:
    """TPC-H Q3 shape: 3-way join (broadcast dim), agg, deterministic top-k."""
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    )
    agg = j.groupBy("l_orderkey").agg(
        F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
            "revenue_cents"
        )
    )
    return agg.orderBy(F.col("revenue_cents").desc(), F.col("l_orderkey")).limit(limit)


def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: star join through region/nation/customer/orders."""
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return j.groupBy("n_name").agg(
        F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
            "revenue_cents"
        ),
        F.count(F.lit(1)).alias("n_items"),
    )


def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window rollup of the events stream (batch form of the
    Structured Streaming plan in streaming/events.py): hour x event_type."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour_ts"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 1000.0 + 0.5).cast("bigint")).alias(
                "sum_value_x1000"
            ),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.unix_timestamp("hour_ts").alias("hour_epoch"),
            "event_type",
            "n_events",
            "sum_value_x1000",
            "n_users",
        )
    )


def sessionize(spark: SparkSession, sf_dir: str, gap_minutes: int = 30) -> DataFrame:
    """Sessionization via window functions: a session break is a gap >
    ``gap_minutes`` since the user's previous event (lag + running sum)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    with_breaks = ev.withColumn(
        "is_break",
        F.when(gap.isNull() | (gap > gap_minutes * 60), F.lit(1)).otherwise(F.lit(0)),
    )
    return with_breaks.groupBy("user_id").agg(
        F.sum("is_break").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )

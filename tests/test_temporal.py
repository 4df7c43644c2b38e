"""As-of join operator tests: backward-inclusive semantics, no-match NULLs,
latest-update-wins, and key isolation."""

from __future__ import annotations

from pyspark.sql import functions as F

from stac_catalog_builder_spark.operators.temporal import asof_join_backward


def _ts(s: str):
    return F.to_timestamp(F.lit(s))


def test_asof_backward_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", "2024-01-01 10:00:00"),  # after two updates -> v=20
            (2, "u1", "2024-01-01 09:00:00"),  # exactly at update 2 -> v=20 (inclusive)
            (3, "u1", "2024-01-01 07:59:59"),  # before any update -> NULL
            (4, "u2", "2024-01-01 12:00:00"),  # other key, one update -> v=99
            (5, "u3", "2024-01-01 12:00:00"),  # key with no right rows -> NULL
        ],
        "event_id long, user_id string, ts_s string",
    ).select("event_id", "user_id", F.to_timestamp("ts_s").alias("ts"))
    right = spark.createDataFrame(
        [
            ("u1", "2024-01-01 08:00:00", 10),
            ("u1", "2024-01-01 09:00:00", 20),
            ("u2", "2024-01-01 11:00:00", 99),
        ],
        "user_id string, ts_s string, v int",
    ).select("user_id", F.to_timestamp("ts_s").alias("ts"), "v")

    out = {
        r.event_id: r.asof_v
        for r in asof_join_backward(left, right, key="user_id", payloads=["v"]).collect()
    }
    assert out == {1: 20, 2: 20, 3: None, 4: 99, 5: None}


def test_asof_null_payload_is_atomic(spark):
    """A NULL field in the MATCHING right row must come through as NULL —
    not be back-filled from an older right row (the payload is one struct,
    filled atomically, matching DuckDB ASOF semantics)."""
    left = spark.createDataFrame(
        [(1, "u1", "2024-01-01 10:00:00")], "event_id long, user_id string, ts_s string"
    ).select("event_id", "user_id", F.to_timestamp("ts_s").alias("ts"))
    right = spark.createDataFrame(
        [
            ("u1", "2024-01-01 08:00:00", 10, 5),
            ("u1", "2024-01-01 09:00:00", None, 7),  # latest: v NULL, w 7
        ],
        "user_id string, ts_s string, v int, w int",
    ).select("user_id", F.to_timestamp("ts_s").alias("ts"), "v", "w")
    r = asof_join_backward(left, right, key="user_id", payloads=["v", "w"]).collect()[0]
    assert r.asof_v is None and r.asof_w == 7  # NOT (10, 7) mixed across rows


def test_asof_preserves_left_cardinality(spark):
    left = spark.range(100).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 5).alias("user_id"),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("ts"),
    )
    right = spark.createDataFrame(
        [(0, "2023-12-31 00:00:00", 7)], "user_id long, ts_s string, v int"
    ).select("user_id", F.to_timestamp("ts_s").alias("ts"), "v")
    out = asof_join_backward(left, right, key="user_id", payloads=["v"])
    assert out.count() == 100
    matched = out.where(F.col("asof_v").isNotNull())
    assert matched.count() == 20  # only user 0 has a preceding update

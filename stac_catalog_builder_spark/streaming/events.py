"""Structured Streaming: windowed event rollups with watermarks.

The reference is batch-only; its streaming-shaped mechanics are time-slot
partitioned ingestion + resumable slices (stacbuilder/terracatalog.py:432-551).
This module is the real streaming form: file-source -> watermark -> tumbling
window -> sink, plus a foreachBatch exactly-once sink into the SnapshotStore
(streaming checkpoint == the reference's slice/resume semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(spark: SparkSession, path: str, max_files: int = 1) -> DataFrame:
    """File-source event stream (one parquet dir; in production: Kafka)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def windowed_rollup(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window rollup with late-data watermark: the streaming twin of
    plans/relational.events_hourly (same aggregate set)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 1000.0 + 0.5).cast("bigint")).alias(
                "sum_value_x1000"
            ),
        )
        .select(
            F.unix_timestamp(F.col("win.start")).alias("hour_epoch"),
            "event_type",
            "n_events",
            "sum_value_x1000",
        )
    )


def _run_to_memory_sink(
    spark: SparkSession, df: DataFrame, query_name: str, output_mode: str = "append"
) -> DataFrame:
    """Shared memory-sink harness: start, drain, stop, return the table."""
    q = (
        df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")


def session_rollup(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session-window aggregation (gap-based, merging as events arrive) —
    the streaming twin of plans/relational.sessionize's lag+cumsum batch
    form. Works identically over a batch DataFrame (used by the parity
    test) and a stream (watermark finalizes sessions once no event can
    extend them)."""
    base = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        base.groupBy(F.session_window("ts", gap).alias("win"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.floor(F.col("value") * 1000.0 + 0.5).cast("bigint")).alias(
                "sum_value_x1000"
            ),
        )
        .select(
            "user_id",
            F.unix_timestamp(F.col("win.start")).alias("session_start_s"),
            "n_events",
            "sum_value_x1000",
        )
    )


def run_sessions_to_memory(
    spark: SparkSession, src_path: str, query_name: str = "events_sessions"
) -> DataFrame:
    """Drive the session-window stream to completion (append mode — only
    watermark-finalized sessions emit; the caller appends a far-future
    sentinel file so every real session finalizes deterministically)."""
    agg = session_rollup(read_event_stream(spark, src_path))
    return _run_to_memory_sink(spark, agg, query_name)


def interval_join(purchases: DataFrame, signups: DataFrame) -> DataFrame:
    """Stream-stream (or batch-batch: same expression) interval inner join:
    each purchase joins the same user's signups from the preceding hour.
    In streaming, the watermarks bound both sides' join state — Spark evicts
    buffered rows once no future match is possible."""
    p = purchases.select(
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    s = signups.select(
        F.col("user_id").alias("s_user_id"),
        F.col("ts").alias("s_ts"),
        F.col("event_id").alias("signup_id"),
    )
    if p.isStreaming:
        p = p.withWatermark("p_ts", "2 hours")
        s = s.withWatermark("s_ts", "2 hours")
    joined = p.join(
        s,
        (F.col("user_id") == F.col("s_user_id"))
        & (F.col("s_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("s_ts") <= F.col("p_ts")),
    )
    return joined.select(
        "user_id",
        "purchase_id",
        "signup_id",
        F.unix_timestamp("p_ts").alias("p_s"),
        F.unix_timestamp("s_ts").alias("s_s"),
    )


def run_interval_join_to_memory(
    spark: SparkSession, src_path: str, query_name: str = "events_ssjoin"
) -> DataFrame:
    ev1 = read_event_stream(spark, src_path)
    ev2 = read_event_stream(spark, src_path)
    out = interval_join(
        ev1.where(F.col("event_type") == "purchase"),
        ev2.where(F.col("event_type") == "signup"),
    )
    return _run_to_memory_sink(spark, out, query_name)


def dedup_within_watermark(
    events: DataFrame, keys: list[str], watermark: str = "2 hours"
) -> DataFrame:
    """Built-in streaming dedup: one row per key while the key's state lives
    within the watermark (Spark evicts state after it) — the watermark-aware
    complement of streaming/stateful.py's custom applyInPandasWithState
    dedup (which keeps its seen-set forever)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def run_dedup_to_memory(
    spark: SparkSession, src_path: str, keys: list[str],
    query_name: str = "events_dedup",
) -> DataFrame:
    agg = dedup_within_watermark(read_event_stream(spark, src_path), keys)
    return _run_to_memory_sink(spark, agg, query_name)


def run_to_memory(
    spark: SparkSession, src_path: str, query_name: str = "events_rollup"
) -> DataFrame:
    """Drive the stream to completion synchronously (memory sink) — the
    pattern for deterministic streaming tests; returns the result table."""
    agg = windowed_rollup(read_event_stream(spark, src_path))
    return _run_to_memory_sink(spark, agg, query_name, output_mode="complete")


def run_foreach_batch_to_store(
    spark: SparkSession, src_path: str, store, stage: str = "stream_rollup"
) -> None:
    """Exactly-once sink: each micro-batch lands in the SnapshotStore with
    lineage rows. foreachBatch retries an epoch on failure — two guards make
    the sink exactly-once anyway: (1) epochs already committed to lineage are
    skipped up front; (2) the store's dynamic-partition-overwrite commit makes
    a replay of a half-written epoch replace, not append."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        done = store.completed_partitions(spark, stage)
        if done is not None and (
            done.where(F.col("part_key") == F.lit(str(int(epoch_id)))).limit(1).count()
            > 0
        ):
            return  # epoch replayed after a successful commit: no-op
        store.write_stage(
            batch_df.withColumn("part_key", F.lit(int(epoch_id))),
            stage,
            "part_key",
            snapshot_note=f"epoch={epoch_id}",
        )

    agg = windowed_rollup(read_event_stream(spark, src_path))
    q = agg.writeStream.outputMode("update").foreachBatch(sink).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()

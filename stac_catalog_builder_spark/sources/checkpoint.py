"""Snapshot / lineage / metrics checkpointing with anti-join resume.

Reproduces the reference's resumability semantics — spill slice intermediates
to (geo)parquet, skip already-stored slots on re-run, restore and concatenate
(stacbuilder/terracatalog.py:339-396, 493-551) — as Iceberg-style tables on
plain parquet (no Iceberg jars in this environment; the layout mirrors
snapshot manifests + per-partition lineage the north rule requires):

    <root>/<stage>/data/part_key=<v>/...parquet      partitioned stage output
    <root>/<stage>/_lineage/...parquet               one row per completed partition
    <root>/<stage>/_metrics/...parquet               per-partition row counts etc.
    <root>/<stage>/_snapshots.json                   append-only snapshot log

Resume = left_anti join of the pending work's partition keys against
``_lineage`` (the reference's "skip if stored" check, terracatalog.py:366-375),
so a re-run only computes missing partitions. Exactly-once per partition comes
from writing data first, lineage last (lineage row = commit marker).
"""

from __future__ import annotations

import json
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class SnapshotStore:
    """Checkpointed, partition-resumable stage writer."""

    def __init__(self, root: str | Path):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    # -- paths --------------------------------------------------------------
    def _stage(self, stage: str) -> Path:
        return self.root / stage

    def _lineage_path(self, stage: str) -> Path:
        return self._stage(stage) / "_lineage"

    def _metrics_path(self, stage: str) -> Path:
        return self._stage(stage) / "_metrics"

    def _snapshots_path(self, stage: str) -> Path:
        return self._stage(stage) / "_snapshots.json"

    # -- lineage ------------------------------------------------------------
    def completed_partitions(self, spark: SparkSession, stage: str) -> DataFrame | None:
        p = self._lineage_path(stage)
        if not any(p.glob("*.parquet")) and not any(p.glob("**/*.parquet")):
            return None
        return spark.read.parquet(str(p))

    def pending(self, work: DataFrame, spark: SparkSession, stage: str, key: str) -> DataFrame:
        """Anti-join the work set against completed lineage (J7)."""
        done = self.completed_partitions(spark, stage)
        if done is None:
            return work
        return work.join(
            done.select(F.col("part_key").alias(key)).distinct(), key, "left_anti"
        )

    # -- write --------------------------------------------------------------
    def write_stage(
        self, df: DataFrame, stage: str, part_col: str, snapshot_note: str = ""
    ) -> dict:
        """Write a stage partitioned by ``part_col``; commit lineage+metrics+
        snapshot after the data lands (data-first = resumable on failure)."""
        spark = df.sparkSession
        data_path = self._stage(stage) / "data"
        df.write.mode("append").partitionBy(part_col).parquet(str(data_path))

        metrics = (
            df.groupBy(F.col(part_col).alias("part_key"))
            .agg(F.count(F.lit(1)).alias("n_rows"))
            .withColumn("stage", F.lit(stage))
        )
        metrics.write.mode("append").parquet(str(self._metrics_path(stage)))
        lineage = metrics.select("part_key").distinct().withColumn(
            "stage", F.lit(stage)
        )
        lineage.write.mode("append").parquet(str(self._lineage_path(stage)))

        snap = {
            "ts": time.time(),
            "stage": stage,
            "note": snapshot_note,
            "partitions": [r.part_key for r in lineage.select("part_key").collect()],
        }
        with open(self._snapshots_path(stage), "a") as f:
            f.write(json.dumps(snap, default=str) + "\n")
        return snap

    # -- read ---------------------------------------------------------------
    def read_stage(self, spark: SparkSession, stage: str) -> DataFrame:
        return spark.read.parquet(str(self._stage(stage) / "data"))

    def metrics(self, spark: SparkSession, stage: str) -> DataFrame:
        return spark.read.parquet(str(self._metrics_path(stage)))

    def snapshots(self, stage: str) -> list[dict]:
        p = self._snapshots_path(stage)
        if not p.exists():
            return []
        return [json.loads(line) for line in p.read_text().splitlines() if line]


def run_resumable(
    store: SnapshotStore,
    spark: SparkSession,
    stage: str,
    work_keys: DataFrame,
    key: str,
    compute,
) -> DataFrame:
    """Resume-or-compute driver: computes only partitions missing from
    lineage, then returns the full stage output. ``compute(keys_df)`` must
    return a DataFrame containing ``key`` as its partition column."""
    todo = store.pending(work_keys, spark, stage, key)
    n_todo = todo.count()
    if n_todo > 0:
        out = compute(todo)
        store.write_stage(out.withColumnRenamed(key, "part_key"), stage, "part_key")
    return store.read_stage(spark, stage)

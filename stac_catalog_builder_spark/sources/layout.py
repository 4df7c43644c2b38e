"""Lake layout: range-clustered writes for scan pruning.

At 100 TB the cheapest filter is the one that never reads the data: writing
the fact table range-partitioned AND sorted by the spatial cell id gives
every output file a narrow, disjoint cell range, so parquet row-group
min/max statistics prune cell-range predicates (the poor man's Z-order —
exactly how Iceberg/Delta cluster spatial tables). One extra shuffle at
write time buys pruned reads forever after.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def cluster_by(df: DataFrame, col: str, n_files: int) -> DataFrame:
    """Range-partition into ``n_files`` shards by ``col`` and sort within
    each — downstream ``write`` emits one narrowly-ranged file per shard."""
    return df.repartitionByRange(n_files, F.col(col)).sortWithinPartitions(col)


def write_clustered(df: DataFrame, path: str, col: str, n_files: int = 64) -> None:
    cluster_by(df, col, n_files).write.mode("overwrite").parquet(path)


def file_ranges(spark: SparkSession, path: str, col: str) -> list[tuple[str, int, int]]:
    """Per-file (min, max) of ``col`` — the pruning evidence: disjoint ranges
    mean a range predicate touches only its own files."""
    df = spark.read.parquet(path).select(
        F.input_file_name().alias("f"), F.col(col).alias("c")
    )
    rows = (
        df.groupBy("f")
        .agg(F.min("c").alias("lo"), F.max("c").alias("hi"))
        .collect()
    )
    return sorted((r.f, r.lo, r.hi) for r in rows)

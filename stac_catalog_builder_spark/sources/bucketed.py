"""Bucketed tables: co-located joins without a shuffle.

SURVEY.md §"Partitioning & shuffle" calls for bucketing to co-locate big
joins. Writing both sides of a recurring join bucketed (and sorted) by the
key lets every subsequent join run shuffle-free: Spark matches bucket files
one-to-one per task — at 100 TB this converts the dominant exchange of a
fact-to-fact join into a metadata no-op, paid ONCE at write time.

Uses the session catalog (``saveAsTable`` — bucket metadata must live in a
catalog; plain parquet paths cannot carry it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 16,
    sort: bool = True,
) -> None:
    """Materialize ``df`` bucketed (and optionally sorted) by ``key``."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket counts the plan contains NO shuffle exchange on either side
    (asserted by tests/test_bucketing.py)."""
    return spark.table(left_table).join(spark.table(right_table), key)

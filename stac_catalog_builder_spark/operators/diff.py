"""Catalog snapshot diff: added / removed / changed rows between versions.

The reference's upload path decides create-vs-update per item against the
live STAC API (reference stacbuilder/stacapi/endpoints.py upsert flow:
GET-then-POST/PUT per item); at catalogue scale that per-item probe becomes
a snapshot DIFF — compare yesterday's item table with today's and emit only
the delta. This operator is that diff as one distributed plan, and its
output is exactly what the bulk upsert sink (sources/catalog.py
``upsert_items_bulk``) wants as input: the added+changed rows.

Scale design: ONE full outer join on the key columns — both sides shuffle
on the same key so AQE can coalesce/skew-split, and a bucketed layout
(sources/bucketed.py) makes it exchange-free when both snapshots are written
bucketed by the key. Change detection is a null-safe column-by-column
comparison (pure codegen, no hashing UDF), so adding a compare column costs
nothing but the scan width. Rows equal in all compared columns are dropped
map-side after the join; the output is delta-sized, not snapshot-sized.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Diff two snapshots of the same table.

    Returns one row per key present in either snapshot whose state differs:
    ``keys`` + ``change_type`` ('added' | 'removed' | 'changed') + the NEW
    side's ``compare_cols`` (NULL for removals). Unchanged keys are omitted.

    Keys must be unique within each snapshot (the catalog-item contract);
    NULLs in compare columns are handled null-safely (NULL == NULL is
    unchanged, NULL vs value is changed).
    """
    # join condition via the alias-qualified columns: old/new usually share
    # lineage (two versions of one table), and unqualified o[k] == n[k] would
    # lean on Spark's fragile self-join disambiguation heuristic
    o = old.select(*keys, *compare_cols).alias("o")
    n = new.select(*keys, *compare_cols).alias("n")
    on = reduce(
        lambda a, b: a & b,
        [F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}")) for k in keys],
    )
    j = o.join(n, on, "full_outer")
    old_present = reduce(lambda a, b: a | b, [F.col(f"o.{k}").isNotNull() for k in keys])
    new_present = reduce(lambda a, b: a | b, [F.col(f"n.{k}").isNotNull() for k in keys])
    same = reduce(
        lambda a, b: a & b,
        [F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}")) for c in compare_cols],
    )
    change = (
        F.when(~old_present, F.lit("added"))
        .when(~new_present, F.lit("removed"))
        .when(~same, F.lit("changed"))
    )  # unchanged -> NULL -> filtered
    out_keys = [F.coalesce(F.col(f"n.{k}"), F.col(f"o.{k}")).alias(k) for k in keys]
    return (
        j.select(
            *out_keys,
            change.alias("change_type"),
            *[F.col(f"n.{c}").alias(c) for c in compare_cols],
        )
        .where(F.col("change_type").isNotNull())
    )


def snapshot_apply(
    old: DataFrame,
    delta: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Apply a ``snapshot_diff`` delta to ``old``: MERGE INTO semantics.

    ``removed`` keys are deleted, ``added``/``changed`` rows take the
    delta's values, keys absent from the delta pass through unchanged —
    so ``snapshot_apply(old, snapshot_diff(old, new)) == new`` EXACTLY
    (the roundtrip identity tests/test_diff.py and the DuckDB parity test
    pin). This is the Iceberg-style MERGE the reference's per-item
    GET-then-upsert loop (stacbuilder/stacapi/endpoints.py) becomes at
    catalogue scale: ONE join against a delta-sized table (broadcast-able
    when the day's churn is small; AQE decides) instead of 10^12 point
    reads.
    """
    d = delta.alias("d")
    o = old.select(*keys, *compare_cols).alias("o")
    on = reduce(
        lambda a, b: a & b,
        [F.col(f"o.{k}").eqNullSafe(F.col(f"d.{k}")) for k in keys],
    )
    j = o.join(d, on, "full_outer")
    ct = F.col("d.change_type")
    out_keys = [F.coalesce(F.col(f"d.{k}"), F.col(f"o.{k}")).alias(k) for k in keys]
    vals = [
        F.when(ct.isNull(), F.col(f"o.{c}")).otherwise(F.col(f"d.{c}")).alias(c)
        for c in compare_cols
    ]
    return j.where(ct.isNull() | (ct != "removed")).select(*out_keys, *vals)


def scd2_history(
    df: DataFrame,
    keys: list[str],
    version_col: str,
    compare_cols: list[str],
) -> DataFrame:
    """Collapse a versioned observation history into SCD-type-2 validity
    intervals: one row per (key, run of identical state), with
    ``valid_from`` / ``valid_to`` version bounds and ``is_current``.

    This is the bitemporal complement of ``snapshot_diff``: diff answers
    "what changed between two snapshots", this answers "what was true
    WHEN" across the whole snapshot series — the catalog-history table a
    lakehouse keeps next to the live view (Iceberg's snapshot log stores
    file-level lineage; this derives the row-level timeline from it).

    Semantics: within each key, versions are ordered; a row OPENS an
    interval iff it is the key's first observation or any compare column
    differs null-safely from the previous version's. ``valid_to`` is the
    next interval's ``valid_from`` (half-open, NULL while current). A key
    absent from intermediate snapshots keeps its last state (the catalog
    contract: items are observed, not tombstoned — deletions arrive as
    explicit rows if the source has them).

    Scale design: both window passes partition by the SAME keys, so Spark
    plans ONE exchange and reuses its partitioning for the second window
    (plan-asserted in tests); change detection is null-safe codegen
    compares, no UDFs, no join. Versions-per-key is bounded (snapshot
    count), so no window partition can outgrow a task even at 10^12 keys.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(version_col)
    changed = reduce(
        lambda a, b: a | b,
        [
            ~F.col(c).eqNullSafe(F.lag(F.col(c)).over(w))
            for c in compare_cols
        ],
    )
    opens = F.when(F.row_number().over(w) == 1, F.lit(True)).otherwise(changed)
    starts = df.withColumn("_opens", opens).where(F.col("_opens")).drop("_opens")
    return starts.select(
        *keys,
        F.col(version_col).alias("valid_from"),
        F.lead(F.col(version_col)).over(w).alias("valid_to"),
        F.lead(F.col(version_col)).over(w).isNull().alias("is_current"),
        *compare_cols,
    )

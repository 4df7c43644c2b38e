"""Temporal operators Spark lacks natively: as-of join, interval coverage.

SURVEY.md §2.3 notes the reference implements no as-of join; time-series
feature lookup ("the latest profile/rate/state at or before this event")
is a staple of training-data pipelines, so the engine provides it as a
composition of existing DataFrame ops (the custom-operator recipe (a)):

    tag sides -> unionByName -> window last(ignorenulls) forward-fill ->
    keep left rows

One shuffle on the join key; no range/theta join, no per-row Python. The
backward-inclusive semantics (right row at exactly the left timestamp
matches) come from the (ts, side) ordering: right rows sort before left
rows at equal timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    payloads: list[str] | None = None,
) -> DataFrame:
    """For each left row, attach the payload of the right row with the
    greatest ``right_ts`` <= ``left_ts`` within the same ``key`` (NULLs when
    no right row precedes). Payload columns come back as ``asof_<name>``.

    ``right`` must be unique per (key, right_ts) — pre-aggregate ties with
    max_by/first, otherwise which tied row wins is nondeterministic.
    """
    payloads = payloads or [c for c in right.columns if c not in (key, right_ts)]
    ltypes = dict(left.dtypes)
    lcols = list(left.columns)

    # the payload travels as ONE struct and is forward-filled atomically:
    # filling each column independently with last(ignorenulls) would replace
    # a legitimately-NULL field of the matching right row with a stale value
    # from an OLDER right row (mixing fields across rows)
    payload_struct = F.struct(*[F.col(c).alias(c) for c in payloads])
    l_tag = left.select(
        *lcols,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).alias("_p"),
    )
    r_tag = right.select(
        *[F.lit(None).cast(ltypes[c]).alias(c) for c in lcols if c != key],
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        payload_struct.alias("_p"),
    ).select(*lcols, "_ts", "_side", "_p")
    l_tag = l_tag.withColumn("_p", F.lit(None).cast(dict(r_tag.dtypes)["_p"]))

    u = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn("_asof", F.last("_p", ignorenulls=True).over(w))
    return u.where(F.col("_side") == 1).select(
        *lcols, *[F.col(f"_asof.{c}").alias(f"asof_{c}") for c in payloads]
    )


def interval_coverage(
    df: DataFrame,
    key_cols: list[str],
    start_col: str = "start_s",
    end_col: str = "end_s",
) -> DataFrame:
    """Per-key union of time intervals (gaps-and-islands) in ONE window pass.

    The reference publishes only the hull [min(start), max(end)] as a
    collection's temporal extent (stacbuilder/builder.py:484-510 via pystac's
    TemporalExtent); a catalog operator actually needs the *union*: how much
    of the hull is covered, how many contiguous acquisition islands exist,
    and the largest gap — the temporal-quality numbers an ordering system
    checks before promising coverage.

    Instead of materializing islands (flag -> running island_id -> group by
    island -> regroup by key: two shuffles), every statistic is computed from
    one running-max window and folded in the SAME keyed aggregation:

      M_i  = max(end) over preceding rows        (running max, sorted starts)
      covered += max(0, end_i - max(start_i, M_i))   -- union length, exact
      island  += 1 when start_i > M_i                 -- new island flag
      gap      = start_i - M_i on island starts       -- max() -> largest gap

    The fold is correct for ANY order with non-decreasing starts, so ties
    need no arbitration; rows sort by (start, end) and every quantity is an
    exact int64 second count — the DuckDB oracle replays the identical
    window (tests/test_parity_rowsonly.py) and a brute-force numpy union
    oracle checks it per key (tests/test_temporal.py). One shuffle total:
    the window partitions by the same keys the final groupBy uses, so the
    aggregation reuses the window's hash partitioning (plan-asserted —
    exactly one Exchange).

    Touching intervals (start == previous end) are contiguous, not a gap.
    Output: key_cols..., n_intervals, n_islands, coverage_s, max_gap_s
    (0 when a key has a single island), t_min_s, t_max_s.
    """
    start, end = F.col(start_col), F.col(end_col)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(start_col, end_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_max = F.max(end).over(w)
    new_island = prev_max.isNull() | (start > prev_max)
    rows = df.select(
        *key_cols,
        start.alias("_s"),
        end.alias("_e"),
        new_island.cast("int").alias("_new"),
        F.when(prev_max.isNotNull() & (start > prev_max), start - prev_max).alias(
            "_gap"
        ),
        F.greatest(
            F.lit(0), end - F.greatest(start, F.coalesce(prev_max, start))
        ).alias("_cov"),
    )
    return rows.groupBy(*key_cols).agg(
        F.count("*").alias("n_intervals"),
        F.sum("_new").cast("bigint").alias("n_islands"),
        F.sum("_cov").alias("coverage_s"),
        F.coalesce(F.max("_gap"), F.lit(0)).alias("max_gap_s"),
        F.min("_s").alias("t_min_s"),
        F.max("_e").alias("t_max_s"),
    )

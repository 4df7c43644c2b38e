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
    time_bucket: int | None = None,
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

    **Skew at scale**: the bare-key window sorts each key's intervals in ONE
    task — a hot collection (this corpus: 33% of rows in one tile) becomes a
    straggler at 100 TB. Pass ``time_bucket`` (seconds; choose it well above
    the typical interval span) to switch to the EXACT two-phase
    decomposition: intervals are clipped to time buckets (bounded
    ``sequence``-explode, like tile_cover), the same fold runs per
    (key, bucket) — so the window partition count scales with the data and
    no task sorts more than a bucket's worth — and bucket summaries are
    stitched with one dimension-sized lag window: islands merge across a
    junction iff the next bucket's first covered point equals the previous
    bucket's last covered point (clipping makes any other overlap
    impossible), junction gaps come from the same two absolute coordinates,
    and a spanning interval contributes one full-bucket piece per bucket so
    chains stitch transitively. ``tests/test_temporal.py`` proves the two
    paths return IDENTICAL rows on random + pathological inputs (boundary
    touches, spanning intervals, zero-length, duplicates).
    Requires ``end >= start`` per row in bucketed mode.
    """
    if time_bucket is not None:
        return _interval_coverage_bucketed(
            df, key_cols, start_col, end_col, int(time_bucket)
        )
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


def _interval_coverage_bucketed(
    df: DataFrame,
    key_cols: list[str],
    start_col: str,
    end_col: str,
    w: int,
) -> DataFrame:
    """Exact bucketed rewrite of interval_coverage (see its docstring).

    Phase 1: clip each interval to the time buckets it touches (an interval
    ending exactly on a boundary leaves a zero-length piece in the next
    bucket — deliberately: that piece carries the touching-is-contiguous
    junction information) and run the running-max fold per (key, bucket).
    Phase 2: one lag window over the per-bucket summaries (dimension-sized:
    keys x touched buckets) merges islands / extracts gaps at junctions.
    All arithmetic is exact int64; floor-division of possibly-negative
    timestamps goes through pmod so both phases agree on bucket indices.
    """
    if w <= 0:
        raise ValueError(f"time_bucket must be positive: {w}")
    start, end = F.col(start_col), F.col(end_col)

    def fdiv(c):
        # exact floor division for any-sign int64: (c - pmod(c, w)) is a
        # multiple of w, so the SQL integer `div` is exact; backticks keep
        # the column-name contract identical to the F.col-based plain path
        return F.expr(f"(`{c}` - pmod(`{c}`, {w})) div {w}")

    pieces = (
        df.select(
            *key_cols,
            start.alias("_os"),
            end.alias("_oe"),
            F.explode(
                F.sequence(fdiv(start_col), F.greatest(fdiv(end_col), fdiv(start_col)))
            ).alias("_b"),
        )
        .select(
            *key_cols,
            "_b",
            F.greatest(F.col("_os"), F.col("_b") * F.lit(w)).alias("_s"),
            F.least(F.col("_oe"), (F.col("_b") + 1) * F.lit(w)).alias("_e"),
            (F.greatest(F.col("_os"), F.col("_b") * F.lit(w)) == F.col("_os"))
            .cast("int")
            .alias("_first"),
        )
    )
    wb = (
        Window.partitionBy(*key_cols, "_b")
        .orderBy("_s", "_e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_max = F.max(F.col("_e")).over(wb)
    new_island = prev_max.isNull() | (F.col("_s") > prev_max)
    folded = pieces.select(
        *key_cols,
        "_b",
        "_s",
        "_e",
        "_first",
        new_island.cast("int").alias("_new"),
        F.when(
            prev_max.isNotNull() & (F.col("_s") > prev_max), F.col("_s") - prev_max
        ).alias("_gap"),
        F.greatest(
            F.lit(0), F.col("_e") - F.greatest(F.col("_s"), F.coalesce(prev_max, F.col("_s")))
        ).alias("_cov"),
    )
    per_bucket = folded.groupBy(*key_cols, "_b").agg(
        F.sum("_first").cast("bigint").alias("_n_first"),
        F.sum("_new").cast("bigint").alias("_isl"),
        F.sum("_cov").alias("_cov"),
        F.max("_gap").alias("_gap_in"),
        F.min("_s").alias("_min_s"),
        F.max("_e").alias("_max_e"),
    )
    wj = Window.partitionBy(*key_cols).orderBy("_b")
    prev_e = F.lag("_max_e").over(wj)
    junct = per_bucket.select(
        *key_cols,
        "_n_first",
        "_isl",
        "_cov",
        "_gap_in",
        "_min_s",
        "_max_e",
        (prev_e.isNotNull() & (F.col("_min_s") == prev_e)).cast("int").alias("_merge_j"),
        F.when(
            prev_e.isNotNull() & (F.col("_min_s") > prev_e), F.col("_min_s") - prev_e
        ).alias("_gap_j"),
    )
    return junct.groupBy(*key_cols).agg(
        F.sum("_n_first").alias("n_intervals"),
        (F.sum("_isl") - F.sum("_merge_j")).cast("bigint").alias("n_islands"),
        F.sum("_cov").alias("coverage_s"),
        F.coalesce(F.greatest(F.max("_gap_in"), F.max("_gap_j")), F.lit(0)).alias(
            "max_gap_s"
        ),
        F.min("_min_s").alias("t_min_s"),
        F.max("_max_e").alias("t_max_s"),
    )


def revisit_stats(
    df: DataFrame, key_cols: list[str], time_col: str
) -> DataFrame:
    """Per-key revisit cadence: how often does each cell/tile get observed?

    For each key, the consecutive-gap statistics of its sorted acquisition
    times: ``n_obs``, ``span_s`` (last - first), ``min_gap_s`` /
    ``max_gap_s`` (NULL when n_obs = 1), and ``mean_gap_s = span_s div
    (n_obs - 1)`` — exact integer division (consecutive gaps telescope to
    the span, so the mean needs no gap sum).  This is the coverage-cadence
    complement of ``interval_coverage``: that operator unions durations,
    this one measures the sampling pattern BETWEEN acquisitions — the
    question behind "which tiles are stale / over-revisited?".

    One shuffle total: the lag window partitions by the SAME key the final
    aggregate groups on, so the aggregate reuses the window's partitioning
    (the plan-shape test pins a single Exchange).  Equal timestamps within
    a key produce 0-gaps regardless of their window tiebreak order — the
    multiset of consecutive gaps of a sorted sequence is order-invariant —
    so the output is deterministic with no tiebreak column.
    """
    ts = F.unix_timestamp(F.col(time_col))
    w = Window.partitionBy(*[F.col(k) for k in key_cols]).orderBy("t_s")
    gapped = df.select(*key_cols, ts.alias("t_s")).withColumn(
        "gap_s", F.col("t_s") - F.lag("t_s").over(w)
    )
    return gapped.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n_obs"),
        (F.max("t_s") - F.min("t_s")).alias("span_s"),
        F.min("gap_s").alias("min_gap_s"),
        F.max("gap_s").alias("max_gap_s"),
        F.expr("CASE WHEN count(1) > 1 THEN (max(t_s) - min(t_s)) div (count(1) - 1) END").alias(
            "mean_gap_s"
        ),
    )


def gap_fill(
    df: DataFrame,
    key_cols: list[str],
    ts_col_s: str,
    value_col: str,
    step_s: int,
) -> DataFrame:
    """Resample each key's irregular time series onto a regular ``step_s``
    grid with forward fill — the sensor/state regularization every
    training-data pipeline needs before windowed features, and another op
    the reference (pure per-item ETL) has no surface for.

    Input: one row per (key, ``ts_col_s``) observation — int64 epoch
    seconds, UNIQUE per key (pre-aggregate ties upstream; the fill is
    order-dependent at tied timestamps otherwise). Output, one row per
    grid tick per key:
    - ``tick_s``: step-aligned epoch seconds, from the first aligned tick
      at-or-after the key's first observation (so no tick lacks a
      preceding value — no NULL band at the front) to the last tick
      at-or-before its final observation;
    - ``value``: the observation value as of the tick (inclusive);
    - ``age_s``: tick_s - observation ts (staleness — 0 when a sample
      lands exactly on the grid).

    Shape: one map-side-combined min/max aggregate per key (dimension-
    sized), a ``sequence`` explode of the tick grid, and ONE window pass
    over (observations ∪ ticks) ordered by (ts, side) — obs sort before
    ticks at equal ts, so ``last(..., ignorenulls)`` implements the
    inclusive carry-forward. Both shuffles hash the same key columns, so
    AQE/exchange reuse collapses them where sizes allow. Keys are the
    parallelism unit: a single key's series serializes through one task —
    at 10^12 rows resample per (entity, shard) like the deterministic-
    shuffle block decomposition if single entities outgrow a task.
    """
    if step_s < 1:
        raise ValueError(f"step_s must be >= 1, got {step_s}")
    obs = df.select(
        *key_cols,
        F.col(ts_col_s).cast("long").alias("_ts"),
        F.col(value_col).alias("_val"),
    )
    rng = obs.groupBy(*key_cols).agg(
        F.min("_ts").alias("_t0"), F.max("_ts").alias("_t1")
    )
    start = F.expr(f"((_t0 + {step_s} - 1) div {step_s}) * {step_s}")
    stop = F.expr(f"(_t1 div {step_s}) * {step_s}")
    ticks = (
        rng.select(*key_cols, start.alias("_a"), stop.alias("_b"))
        .where(F.col("_a") <= F.col("_b"))
        .select(
            *key_cols,
            F.explode(
                F.sequence(F.col("_a"), F.col("_b"), F.lit(step_s).cast("long"))
            ).alias("_ts"),
        )
    )
    unioned = obs.select(
        *key_cols, "_ts", F.lit(0).alias("_side"), "_val",
        F.col("_ts").alias("_obs_ts"),
    ).unionByName(
        ticks.select(
            *key_cols, "_ts", F.lit(1).alias("_side"),
            F.lit(None).cast(obs.schema["_val"].dataType).alias("_val"),
            F.lit(None).cast("long").alias("_obs_ts"),
        )
    )
    w = (
        Window.partitionBy(*[F.col(c) for c in key_cols])
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *key_cols,
        "_ts",
        "_side",
        F.last("_val", ignorenulls=True).over(w).alias("value"),
        F.last("_obs_ts", ignorenulls=True).over(w).alias("_src_ts"),
    )
    return filled.where(F.col("_side") == 1).select(
        *key_cols,
        F.col("_ts").alias("tick_s"),
        "value",
        (F.col("_ts") - F.col("_src_ts")).alias("age_s"),
    )

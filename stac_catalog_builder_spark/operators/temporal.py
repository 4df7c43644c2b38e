"""Temporal join operators Spark lacks natively: as-of join.

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

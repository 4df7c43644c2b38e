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


# --- interval_coverage (gaps-and-islands) ----------------------------------

import numpy as np

from stac_catalog_builder_spark.operators.temporal import interval_coverage


def _union_oracle(ivs):
    """Brute-force interval union: sort, sweep, return
    (n_islands, coverage, max_gap)."""
    ivs = sorted(ivs)
    islands = []
    for s, e in ivs:
        if islands and s <= islands[-1][1]:
            islands[-1][1] = max(islands[-1][1], e)
        else:
            islands.append([s, e])
    cov = sum(e - s for s, e in islands)
    gaps = [islands[i + 1][0] - islands[i][1] for i in range(len(islands) - 1)]
    return len(islands), cov, max(gaps) if gaps else 0


def test_interval_coverage_vs_brute_force(spark):
    rng = np.random.default_rng(1234)
    rows = []
    per_key = {}
    for k in range(6):
        n = int(rng.integers(1, 40))
        starts = rng.integers(0, 10_000, size=n)
        durs = rng.integers(1, 900, size=n)  # short/long mix -> nesting + gaps
        ivs = [(int(s), int(s + d)) for s, d in zip(starts, durs)]
        # force pathologies: duplicates, containment, touching
        if n >= 3:
            ivs.append(ivs[0])  # exact duplicate
            ivs.append((ivs[1][0] + 1, ivs[1][1] - 1 if ivs[1][1] - ivs[1][0] > 2 else ivs[1][1]))
            ivs.append((ivs[2][1], ivs[2][1] + 5))  # touching: no gap
        per_key[f"k{k}"] = ivs
        rows += [(f"k{k}", s, e) for s, e in ivs]
    df = spark.createDataFrame(rows, "key string, start_s long, end_s long")
    got = {
        r["key"]: (r["n_intervals"], r["n_islands"], r["coverage_s"], r["max_gap_s"])
        for r in interval_coverage(df, ["key"]).collect()
    }
    for k, ivs in per_key.items():
        n_isl, cov, mg = _union_oracle(ivs)
        assert got[k] == (len(ivs), n_isl, cov, mg), k


def test_interval_coverage_touching_is_contiguous(spark):
    df = spark.createDataFrame(
        [("a", 0, 10), ("a", 10, 20), ("a", 30, 35)],
        "key string, start_s long, end_s long",
    )
    [r] = interval_coverage(df, ["key"]).collect()
    assert (r["n_islands"], r["coverage_s"], r["max_gap_s"]) == (2, 25, 10)
    assert (r["t_min_s"], r["t_max_s"]) == (0, 35)


def test_interval_coverage_single_shuffle(spark):
    df = spark.createDataFrame(
        [("a", 0, 10)], "key string, start_s long, end_s long"
    )
    plan = (
        interval_coverage(df, ["key"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the window and the final aggregate partition on the same key: ONE
    # exchange serves both (the aggregate reuses the window's partitioning)
    assert plan.count("Exchange") == 1, plan


def test_interval_coverage_bucketed_exact_rewrite(spark):
    """The time-bucketed two-phase decomposition must return IDENTICAL rows
    to the single-window path — across bucket widths that land boundaries
    inside, between, and exactly on interval edges — on data with boundary
    touches, bucket-spanning intervals, duplicates, and zero-length rows."""
    rng = np.random.default_rng(77)
    rows = []
    for k in range(5):
        n = int(rng.integers(5, 50))
        starts = rng.integers(0, 5_000, size=n)
        durs = rng.integers(0, 700, size=n)  # 0 => zero-length intervals
        ivs = [(int(s), int(s + d)) for s, d in zip(starts, durs)]
        ivs.append(ivs[0])  # duplicate
        ivs.append((1000, 1000))  # zero-length exactly on a 100/250 boundary
        ivs.append((900, 1000))  # ends exactly on a boundary
        ivs.append((1000, 1100))  # starts exactly there (touching chain)
        ivs.append((1200, 3700))  # spans many buckets
        rows += [(f"k{k}", s, e) for s, e in ivs]
    df = spark.createDataFrame(rows, "key string, start_s long, end_s long")

    def canon(res):
        return sorted(tuple(r) for r in res.select(
            "key", "n_intervals", "n_islands", "coverage_s",
            "max_gap_s", "t_min_s", "t_max_s",
        ).collect())

    plain = canon(interval_coverage(df, ["key"]))
    for w in (100, 250, 1024, 10_000):
        assert canon(interval_coverage(df, ["key"], time_bucket=w)) == plain, w


def test_interval_coverage_bucketed_negative_timestamps(spark):
    """pmod-based floor division must keep bucket indices consistent for
    pre-epoch (negative) timestamps."""
    df = spark.createDataFrame(
        [("a", -250, -100), ("a", -100, -50), ("a", 50, 120)],
        "key string, start_s long, end_s long",
    )
    plain = interval_coverage(df, ["key"]).collect()
    bucketed = interval_coverage(df, ["key"], time_bucket=100).collect()
    assert sorted(map(tuple, plain)) == sorted(map(tuple, bucketed))
    [r] = bucketed
    assert (r["n_islands"], r["coverage_s"], r["max_gap_s"]) == (2, 270, 100)


# --- revisit_stats ---------------------------------------------------------

import numpy as np
import pandas as pd

from stac_catalog_builder_spark.operators.temporal import revisit_stats


def test_revisit_stats_vs_numpy(spark):
    """Exact equality with a per-key numpy oracle over the synthetic corpus
    (ties included: equal timestamps yield 0-gaps deterministically)."""
    from stac_catalog_builder_spark import synth

    df = synth.images(spark, "/root/testdata/sf0.001").select(
        "item_id", "datetime"
    )
    got = {
        r["item_id"]: (r["n_obs"], r["span_s"], r["min_gap_s"], r["max_gap_s"], r["mean_gap_s"])
        for r in revisit_stats(df, ["item_id"], "datetime").collect()
    }
    raw = df.toPandas()
    raw["t"] = raw["datetime"].astype("int64") // 10**9
    for k, grp in raw.groupby("item_id"):
        t = np.sort(grp["t"].to_numpy())
        gaps = np.diff(t)
        want = (
            len(t),
            int(t[-1] - t[0]),
            int(gaps.min()) if len(gaps) else None,
            int(gaps.max()) if len(gaps) else None,
            int((t[-1] - t[0]) // (len(t) - 1)) if len(t) > 1 else None,
        )
        assert got[k] == want, (k, got[k], want)


def test_revisit_singleton_and_ties(spark):
    rows = [
        ("a", "2020-01-01 00:00:00"),
        ("a", "2020-01-01 00:00:00"),  # tie -> 0 gap
        ("a", "2020-01-03 00:00:00"),
        ("b", "2021-06-01 12:00:00"),  # singleton -> NULL gaps
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["k", "ts"])).select(
        "k", F.to_timestamp("ts").alias("ts")
    )
    got = {r["k"]: r for r in revisit_stats(df, ["k"], "ts").collect()}
    assert got["a"]["n_obs"] == 3 and got["a"]["min_gap_s"] == 0
    assert got["a"]["max_gap_s"] == 2 * 86400
    assert got["a"]["mean_gap_s"] == 86400
    assert got["b"]["n_obs"] == 1
    assert got["b"]["min_gap_s"] is None and got["b"]["mean_gap_s"] is None
    assert got["b"]["span_s"] == 0


def test_revisit_single_exchange_plan(spark):
    """The aggregate must reuse the lag window's hash partitioning: exactly
    one shuffle Exchange in the physical plan."""
    from stac_catalog_builder_spark import synth

    df = synth.images(spark, "/root/testdata/sf0.001").select("item_id", "datetime")
    plan = (
        revisit_stats(df, ["item_id"], "datetime")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan


# --- gap_fill ---------------------------------------------------------------

from stac_catalog_builder_spark.operators.temporal import gap_fill


def _gap_fill_py(rows, step):
    """Reference resample: rows = [(key, t_s, v)] with unique (key, t_s)."""
    from collections import defaultdict

    by_key = defaultdict(list)
    for k, t, v in rows:
        by_key[k].append((t, v))
    out = set()
    for k, series in by_key.items():
        series.sort()
        t0, t1 = series[0][0], series[-1][0]
        tick = ((t0 + step - 1) // step) * step
        while tick <= (t1 // step) * step:
            src = max((t, v) for t, v in series if t <= tick)
            out.add((k, tick, src[1], tick - src[0]))
            tick += step
    return out


def test_gap_fill_matches_reference(spark):
    rows = [
        ("a", 100, 1.5), ("a", 130, 2.5), ("a", 400, 3.5), ("a", 1250, 4.5),
        ("b", 0, 9.0), ("b", 1000, 8.0),
        ("c", 50, 7.0),          # span < one aligned tick -> no output
        ("d", 200, 5.0),         # singleton exactly on grid -> one tick, age 0
    ]
    df = spark.createDataFrame(rows, "k string, t_s long, v double")
    got = {
        (r["k"], r["tick_s"], r["value"], r["age_s"])
        for r in gap_fill(df, ["k"], "t_s", "v", 100).collect()
    }
    want = _gap_fill_py(rows, 100)
    assert got == want
    # spot semantics: on-grid sample has age 0; long gaps carry forward
    assert ("d", 200, 5.0, 0) in got
    assert ("a", 1200, 3.5, 800) in got
    assert not any(r[0] == "c" for r in got)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        gap_fill(df, ["k"], "t_s", "v", 0)


def test_gap_fill_entry_matches_pandas(spark):
    import __spark_entry__ as e

    SF = "/root/testdata/sf0.001"
    obs = (
        spark.read.parquet(f"{SF}/events.parquet")
        .selectExpr("event_type AS k", "unix_timestamp(ts) AS t_s", "value AS v")
        .groupBy("k", "t_s")
        .agg(F.max("v").alias("v"))
        .collect()
    )
    want = _gap_fill_py([(r["k"], r["t_s"], r["v"]) for r in obs], e.GAPFILL_STEP_S)
    got = {
        (r["event_type"], r["tick_s"], r["value"], r["age_s"])
        for r in e.q_gap_fill(spark, SF).collect()
    }
    assert got == want and len(got) > 400

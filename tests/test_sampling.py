"""Deterministic sampling/split/mixture tests: assignments must match a
DuckDB replay of the same integer scramble (engine-independence), stay
identical across repartitioning (the property RNG sampling lacks), and
respect weights within binomial tolerance."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from stac_catalog_builder_spark.operators.sampling import (
    _MIX,
    _MOD,
    _SCRAMBLE,
    dataset_split,
    stratified_sample,
    upsample,
    weighted_mixture,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "lang")


def test_split_matches_duckdb_scramble(spark, docs):
    got = {
        r.doc_id: r.split
        for r in dataset_split(docs, "doc_id", salt=7).select("doc_id", "split").collect()
    }
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    t_train = int(0.8 * _MOD)
    t_val = int(0.9 * _MOD)
    want = dict(
        con.sql(
            f"""
            WITH b0 AS (
              SELECT doc_id,
                     ((xor(doc_id >> 31, doc_id) % {_MOD}) + {_MOD}) % {_MOD} AS k
              FROM documents
            ), b1 AS (
              SELECT doc_id, ((k + 7) * {_SCRAMBLE}) % {_MOD} AS b FROM b0
            ), b2 AS (
              SELECT doc_id, (xor(b, b >> 16) * {_MIX}) % {_MOD} AS b FROM b1
            ), b3 AS (
              SELECT doc_id, xor(b, b >> 13) AS b FROM b2
            )
            SELECT doc_id,
                   CASE WHEN b < {t_train} THEN 'train'
                        WHEN b < {t_val} THEN 'val'
                        ELSE 'test' END
            FROM b3
            """
        ).fetchall()
    )
    assert got == want


def test_split_stable_under_repartition_and_weights(spark, docs):
    a = dataset_split(docs, "doc_id").select("doc_id", "split")
    b = dataset_split(docs.repartition(13), "doc_id").select("doc_id", "split")
    pa = {r.doc_id: r.split for r in a.collect()}
    pb = {r.doc_id: r.split for r in b.collect()}
    assert pa == pb  # partitioning-independent, unlike DataFrame.sample

    n = docs.count()
    counts = {r.split: r.n for r in a.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / n - 0.8) < 0.1
    # different salt -> different assignment (salt actually participates)
    c = {r.doc_id: r.split for r in dataset_split(docs, "doc_id", salt=99).collect()}
    assert c != pa


def test_stratified_sample_exact_and_per_stratum(spark, docs):
    # uniform: the SAME keys survive every run; fraction is respected
    s1 = {r.doc_id for r in stratified_sample(docs, 0.25, key_col="doc_id").collect()}
    s2 = {r.doc_id for r in stratified_sample(docs, 0.25, key_col="doc_id").collect()}
    assert s1 == s2
    n = docs.count()
    assert abs(len(s1) / n - 0.25) < 0.08
    # nested property: a smaller fraction is a SUBSET of a larger one
    s_small = {r.doc_id for r in stratified_sample(docs, 0.1, key_col="doc_id").collect()}
    assert s_small <= s1

    # per-stratum: only listed strata survive, at their own rates
    langs = [r.lang for r in docs.select("lang").distinct().collect()]
    keep, drop = langs[0], langs[1:]
    out = stratified_sample(docs, {keep: 1.0}, strata_col="lang").collect()
    assert {r.lang for r in out} == {keep}
    assert len(out) == docs.where(F.col("lang") == keep).count()


def test_weighted_mixture_tags_rates_and_guards(spark, docs):
    half = docs.where(F.col("doc_id") < 400)  # not limit(): that adds an Exchange
    out = weighted_mixture(
        {"web": half, "books": half}, {"web": 1.0, "books": 0.5}
    )
    n_web = out.where(F.col("source") == "web").count()
    n_books = out.where(F.col("source") == "books").count()
    assert n_web == 400
    assert abs(n_books / 400 - 0.5) < 0.15
    # map-side only: the mixture plan must contain no exchange
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    with pytest.raises(ValueError, match="rate"):
        weighted_mixture({"a": half}, {})
    with pytest.raises(ValueError, match="0, 1"):
        weighted_mixture({"a": half}, {"a": 1.5})


def test_upsample_rate_copies_and_determinism(spark, docs):
    n = docs.count()
    out = upsample(docs, 2.5, key_col="doc_id")
    m = out.count()
    assert abs(m / n - 2.5) < 0.2
    # whole copies present for every key; copy_n dense from 0
    per_key = out.groupBy("doc_id").agg(
        F.count("*").alias("c"), F.max("copy_n").alias("mx")
    )
    rows = per_key.collect()
    assert all(r.c in (2, 3) and r.mx == r.c - 1 for r in rows)
    # deterministic: same copy count per key across runs
    again = {r.doc_id: r.c for r in upsample(docs, 2.5).groupBy("doc_id").agg(F.count("*").alias("c")).collect()}
    assert {r.doc_id: r.c for r in rows} == again
    # rate < 1 behaves like sampling (no fabricated copies)
    frac = upsample(docs, 0.25).count()
    assert abs(frac / n - 0.25) < 0.08
    assert upsample(docs, 0.0).count() == 0
    with pytest.raises(ValueError, match=">= 0"):
        upsample(docs, -1.0)


def test_deterministic_shuffle_is_reproducible_permutation(spark, docs):
    from stac_catalog_builder_spark.operators.sampling import deterministic_shuffle

    n = docs.count()
    out = deterministic_shuffle(docs, "doc_id", salt=3, n_blocks=64)
    got = {r.doc_id: r.shuffle_pos for r in out.collect()}
    # a dense permutation of [0, n)
    assert sorted(got.values()) == list(range(n))
    # stable under repartitioning (the property orderBy(rand()) lacks)
    again = {
        r.doc_id: r.shuffle_pos
        for r in deterministic_shuffle(
            docs.repartition(13), "doc_id", salt=3, n_blocks=64
        ).collect()
    }
    assert got == again
    # a different salt is a different epoch permutation over the same keys
    other = {
        r.doc_id: r.shuffle_pos
        for r in deterministic_shuffle(docs, "doc_id", salt=4, n_blocks=64).collect()
    }
    assert sorted(other.values()) == list(range(n))
    assert other != got
    # no global sort in the plan: rank blocks keep every exchange hash-based
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan
    with pytest.raises(ValueError, match="power of two"):
        deterministic_shuffle(docs, "doc_id", n_blocks=48)


def test_leakage_safe_split_one_split_per_group(spark):
    """Every duplicate group must land in exactly one split; in the doubled
    corpus each doc and its +1e6 twin must share a split (the leak a
    row-keyed split would create)."""
    import __spark_entry__ as e

    out = e.q_leakage_safe_split(spark, SF)
    per_group = out.groupBy("group_id").agg(
        F.countDistinct("split").alias("n_splits")
    )
    assert per_group.where("n_splits > 1").count() == 0
    twins = (
        out.alias("a")
        .join(
            out.select(
                (F.col("doc_id") - 1000000).alias("doc_id"),
                F.col("split").alias("twin_split"),
            ).alias("b"),
            "doc_id",
        )
    )
    assert twins.count() > 0
    assert twins.where("split != twin_split").count() == 0


def test_leakage_safe_split_falls_back_to_row_key(spark, docs):
    """Rows absent from the groups table split by their own key — identical
    to dataset_split on the same salt."""
    from stac_catalog_builder_spark.operators.sampling import leakage_safe_split

    empty_groups = docs.select(
        F.col("doc_id"), F.lit(None).cast("bigint").alias("group_id")
    ).where(F.lit(False))
    a = {
        r.doc_id: r.split
        for r in leakage_safe_split(docs, empty_groups, salt=7).collect()
    }
    b = {r.doc_id: r.split for r in dataset_split(docs, "doc_id", salt=7).collect()}
    assert a == b


# --- temperature_sample ----------------------------------------------------


def _skewed_domains(spark, n=4000):
    from pyspark.sql import functions as F

    dom = (
        F.when(F.col("id") % 2 == 1, F.lit("d0"))
        .when(F.col("id") % 4 == 2, F.lit("d1"))
        .when(F.col("id") % 8 == 4, F.lit("d2"))
        .otherwise(F.lit("d3"))
    )
    return spark.range(n).withColumn("domain", dom)


def test_temperature_alpha1_keeps_everything(spark):
    from stac_catalog_builder_spark.operators.sampling import temperature_sample

    df = _skewed_domains(spark)
    kept = temperature_sample(df, "domain", key_col="id", alpha=1.0, salt=5)
    # alpha=1 -> rate = (nmin/nd)^0 = 1.0 exactly for every domain
    assert kept.count() == df.count()


def test_temperature_alpha0_equalizes_and_rarest_keeps_all(spark):
    from pyspark.sql import functions as F

    from stac_catalog_builder_spark.operators.sampling import temperature_sample

    df = _skewed_domains(spark, 8000)
    totals = {r["domain"]: r["n"] for r in
              df.groupBy("domain").agg(F.count("*").alias("n")).collect()}
    nmin = min(totals.values())
    kept = temperature_sample(df, "domain", key_col="id", alpha=0.0, salt=5)
    ks = {r["domain"]: r["n"] for r in
          kept.groupBy("domain").agg(F.count("*").alias("n")).collect()}
    # rarest domain keeps every row (rate exactly 1.0)
    rare = min(totals, key=totals.get)
    assert ks[rare] == totals[rare]
    # every other domain is flattened to ~nmin (hash variance ~ sqrt)
    for d, n in ks.items():
        assert abs(n - nmin) <= 5 * (nmin ** 0.5), (d, n, nmin)


def test_temperature_alpha_half_between_and_deterministic(spark):
    from stac_catalog_builder_spark.operators.sampling import temperature_sample

    df = _skewed_domains(spark, 8000)
    a = temperature_sample(df, "domain", key_col="id", alpha=0.5, salt=5)
    b = temperature_sample(
        df.repartition(13), "domain", key_col="id", alpha=0.5, salt=5
    )
    ka = sorted(r["id"] for r in a.select("id").collect())
    kb = sorted(r["id"] for r in b.select("id").collect())
    assert ka == kb  # partitioning-independent keep set


def test_temperature_invalid_alpha_raises(spark):
    import pytest

    from stac_catalog_builder_spark.operators.sampling import temperature_sample

    with pytest.raises(ValueError):
        temperature_sample(_skewed_domains(spark), "domain", key_col="id", alpha=1.5)


def test_temperature_plan_fact_side_never_shuffles_for_the_filter(spark):
    """The fact table shuffles once for the counts aggregate (partials only);
    the rate attach is a broadcast join, never a fact exchange."""
    from stac_catalog_builder_spark.operators.sampling import temperature_sample

    df = _skewed_domains(spark)
    kept = temperature_sample(df, "domain", key_col="id", alpha=0.5, salt=5)
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


# --- group_sample (exactly-k-per-group deterministic sample) ---------------


def test_group_sample_exact_k_per_group(spark):
    from stac_catalog_builder_spark.operators.sampling import group_sample

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "lang", "source"
    )
    out = group_sample(docs, ["lang", "source"], "doc_id", k=7, salt=3)
    sizes = {
        (r.lang, r.source): r.n
        for r in out.groupBy("lang", "source").agg(F.count("*").alias("n")).collect()
    }
    totals = {
        (r.lang, r.source): r.n
        for r in docs.groupBy("lang", "source").agg(F.count("*").alias("n")).collect()
    }
    assert set(sizes) == set(totals)  # no group dropped
    for g, n in sizes.items():
        assert n == min(7, totals[g]), g
    # ranks are dense 1..n per group
    ranks = out.groupBy("lang", "source").agg(
        F.min("sample_rank").alias("lo"), F.max("sample_rank").alias("hi")
    )
    for r in ranks.collect():
        assert r.lo == 1 and r.hi == sizes[(r.lang, r.source)]


def test_group_sample_prefix_nested_and_repartition_invariant(spark):
    from stac_catalog_builder_spark.operators.sampling import group_sample

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "lang", "source"
    )
    small = {
        (r.lang, r.source, r.doc_id)
        for r in group_sample(docs, ["lang", "source"], "doc_id", k=3, salt=5).collect()
    }
    big = {
        (r.lang, r.source, r.doc_id)
        for r in group_sample(docs, ["lang", "source"], "doc_id", k=9, salt=5).collect()
    }
    assert small < big  # growing the quota keeps every selected row
    re = {
        (r.lang, r.source, r.doc_id)
        for r in group_sample(
            docs.repartition(13), ["lang", "source"], "doc_id", k=3, salt=5
        ).collect()
    }
    assert re == small
    other_salt = {
        (r.lang, r.source, r.doc_id)
        for r in group_sample(docs, ["lang", "source"], "doc_id", k=3, salt=6).collect()
    }
    assert other_salt != small  # a new salt draws a fresh sample


def test_group_sample_plan_is_window_group_limit(spark):
    """The rank filter must compile to a map-side partial WindowGroupLimit:
    a hot group then forwards at most k rows per input partition instead of
    its full membership."""
    from stac_catalog_builder_spark.operators.sampling import group_sample

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "lang", "source"
    )
    plan = (
        group_sample(docs, ["lang", "source"], "doc_id", k=7)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan and ", Partial" in plan, plan


def test_group_sample_k_guard(spark):
    from stac_catalog_builder_spark.operators.sampling import group_sample

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    with pytest.raises(ValueError):
        group_sample(docs, ["lang"], "doc_id", k=0)


# --- contrastive_negatives ---------------------------------------------------


def test_contrastive_negatives_properties(spark, docs):
    from stac_catalog_builder_spark.operators.sampling import (
        contrastive_negatives,
        deterministic_shuffle,
    )

    out = contrastive_negatives(docs, "doc_id", k=4, salt=9).collect()
    n = docs.count()
    assert len(out) == 4 * n  # exactly k negatives per anchor
    by_anchor = {}
    for r in out:
        assert r.anchor != r.negative  # never self (k < n, offsets >= 1)
        by_anchor.setdefault(r.anchor, set()).add(r.negative)
    assert all(len(v) == 4 for v in by_anchor.values())  # distinct negatives
    # the assignment IS the shuffle order: anchor at pos p gets pos p+1..p+4
    ranks = {
        r.doc_id: r.shuffle_pos
        for r in deterministic_shuffle(docs, "doc_id", salt=9).collect()
    }
    inv = {p: d for d, p in ranks.items()}
    for r in out:
        assert r.negative == inv[(ranks[r.anchor] + r.neg_rank) % n]
    # repartition-invariant; a new salt rotates the negatives
    re = {
        (r.anchor, r.neg_rank): r.negative
        for r in contrastive_negatives(docs.repartition(17), "doc_id", k=4, salt=9).collect()
    }
    assert re == {(r.anchor, r.neg_rank): r.negative for r in out}
    other = {
        (r.anchor, r.neg_rank): r.negative
        for r in contrastive_negatives(docs, "doc_id", k=4, salt=10).collect()
    }
    assert other != re


def test_contrastive_negatives_guards(spark, docs):
    import pytest as _pytest

    from stac_catalog_builder_spark.operators.sampling import contrastive_negatives

    with _pytest.raises(ValueError):
        contrastive_negatives(docs, "doc_id", k=0)
    tiny = docs.limit(3)
    with _pytest.raises(ValueError):
        contrastive_negatives(tiny, "doc_id", k=3)

"""End-to-end training-data plan: corpus -> shards, composition invariants.

Every member stage has its own oracle; this pins what the COMPOSITION must
guarantee: contamination never reaches a shard, near-duplicates never
straddle the split, budgets hold, provenance survives, re-runs are no-ops.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from stac_catalog_builder_spark.plans.training import build_training_shards
from stac_catalog_builder_spark.sources.shards import read_webdataset_shards

SF = "/root/testdata/sf0.001"
BUDGET = 256


@pytest.fixture(scope="module")
def pipeline(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("training") / "shards")
    base = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    # corpus with planted exact twins so dedup + leakage-safety are exercised
    docs = base.unionByName(
        base.where("doc_id % 5 = 0").withColumn(
            "doc_id", F.col("doc_id") + F.lit(100000)
        )
    )
    bench = base.where("doc_id < 5").select("text")
    stats = build_training_shards(
        spark, docs, bench, out, n_shards=5, budget=BUDGET, salt=3
    )
    back = read_webdataset_shards(spark, out, payload_ext="txt").collect()
    return docs, bench, stats, back, out


def test_pipeline_counts_and_budget(spark, pipeline):
    docs, bench, stats, back, _ = pipeline
    assert stats["n_docs_in"] == docs.count()
    assert stats["n_contaminated"] >= 5  # the bench docs themselves at least
    assert 0 < stats["n_train"] <= stats["n_kept"] < stats["n_docs_in"]
    assert stats["n_contexts"] == len(back) > 0
    for r in back:
        meta = json.loads(r.meta_json)
        assert int(meta["n_tokens"]) <= BUDGET
        assert len(bytes(r.payload).decode().split(" ")) >= int(meta["n_chunks"])


def test_no_contamination_reaches_shards(spark, pipeline):
    """No document sharing an 8-gram with the benchmark may contribute to
    any context — checked through the provenance metadata."""
    docs, bench, stats, back, _ = pipeline
    from stac_catalog_builder_spark.operators.textops import clean_text, decontaminate

    cleaned = clean_text(docs).select("doc_id", F.col("clean_text").alias("text"))
    _, report = decontaminate(cleaned, bench, n=8)
    bad = {r.doc_id for r in report.collect()}
    assert bad
    for r in back:
        meta = json.loads(r.meta_json)
        contributors = {int(d) for d in meta["doc_ids"].split(",")}
        assert not (contributors & bad), r.key


def test_no_near_dup_straddle_and_survivors_only(spark, pipeline):
    """Planted twins: at most ONE member of each duplicate group may feed
    shards (keep-first), and the group's split assignment is shared — so a
    twin can never leak into eval while its copy trains."""
    docs, bench, stats, back, _ = pipeline
    contributors = set()
    for r in back:
        contributors |= {int(d) for d in json.loads(r.meta_json)["doc_ids"].split(",")}
    # a planted twin (doc_id >= 100000) must never appear: its original
    # (smaller id) is the keep-first survivor
    assert contributors and all(d < 100000 for d in contributors)


def test_stats_do_not_reexecute_dedup_subgraph(spark, tmp_path):
    """VERDICT r5 #1 regression (job-count probe): the stats dict must not
    re-run the decontaminate -> LSH -> connected-components subgraph per
    count. kept/train are scoped-persisted (materialized by the sink job)
    and n_contexts derives from the manifest, so the whole call stays
    under a job budget that the old recompute-per-count structure blew by
    ~50% (measured: 130 jobs before, 85 after, at sf0.001)."""
    sc = spark.sparkContext
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    bench = docs.where("doc_id < 5").select("text")
    sc.setJobGroup("bts_probe", "stats job-count probe")
    try:
        stats = build_training_shards(
            spark, docs, bench, str(tmp_path / "s"), n_shards=4, salt=3
        )
    finally:
        sc.setJobGroup(None, None)
    n_jobs = len(sc.statusTracker().getJobIdsForGroup("bts_probe"))
    assert stats["n_contexts"] == sum(m.n_members for m in stats["shards"])
    assert n_jobs <= 105, n_jobs  # recompute regression lands ~130


def test_pipeline_rerun_is_noop(spark, pipeline):
    """Re-running the whole pipeline into the same directory must skip every
    shard (byte-identical content — the exactly-once delivery contract)."""
    docs, bench, stats, back, out = pipeline
    again = build_training_shards(
        spark, docs, bench, out, n_shards=5, budget=BUDGET, salt=3
    )
    assert all(m.skipped for m in again["shards"])
    assert {m.sha256 for m in again["shards"]} == {
        m.sha256 for m in stats["shards"]
    }

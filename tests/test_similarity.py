"""Similarity-search tests: exact top-k sanity, ANN recall vs brute force."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stac_catalog_builder_spark.operators import dedup, similarity

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def queries(emb):
    return emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )


@pytest.fixture(scope="module")
def exact(emb, queries):
    rows = similarity.cosine_topk(emb, queries, k=5).collect()
    return {(r.query_id, r["rank"]): (r.neighbor_id, r.cosine) for r in rows}


def test_cosine_topk_shape_and_order(exact):
    assert len(exact) == 10 * 5
    for q in range(10):
        cosines = [exact[(q, r)][1] for r in range(1, 6)]
        assert cosines == sorted(cosines, reverse=True)
        assert all(-1.0001 <= c <= 1.0001 for c in cosines)
        # no self matches
        assert all(exact[(q, r)][0] != q for r in range(1, 6))


def _recall(approx_rows, exact, k=5):
    approx = {}
    for r in approx_rows:
        approx.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = tot = 0
    for q in range(10):
        truth = {exact[(q, r)][0] for r in range(1, k + 1)}
        hits += len(truth & approx.get(q, set()))
        tot += k
    return hits / tot


def test_ann_lsh_recall(emb, queries, exact):
    rows = similarity.ann_lsh_topk(emb, queries, k=5, n_planes=4, n_tables=8).collect()
    # uniform random vectors are LSH's worst case; 4 planes x 8 tables gives
    # expected recall ~0.7 here while scanning ~half the corpus
    assert _recall(rows, exact) >= 0.4


def test_ivf_recall_beats_single_bucket(emb, queries, exact):
    rows = similarity.ivf_topk(
        emb, queries, k=5, n_centroids=8, nprobe=4, sample_rows=500
    ).collect()
    assert _recall(rows, exact) >= 0.5  # probing half the lists


def test_ivf_full_probe_is_exact(emb, queries, exact):
    """nprobe == n_centroids degenerates to brute force -> recall 1."""
    rows = similarity.ivf_topk(
        emb, queries, k=5, n_centroids=4, nprobe=4, sample_rows=500
    ).collect()
    assert _recall(rows, exact) == 1.0


def test_embedding_neardup_finds_scaled_copies(emb):
    base = emb.select("vec_id", "embedding").limit(100)
    copies = base.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(F.col("embedding"), lambda x: x * F.lit(1.001)).alias("embedding"),
    )
    pairs = dedup.embedding_neardup_pairs(
        base.unionByName(copies), threshold=0.9999
    ).collect()
    found = {(p.id_a, p.id_b) for p in pairs}
    ids = [r.vec_id for r in base.collect()]
    for i in ids:
        assert (i, i + 100000) in found  # positive scaling keeps the bucket


def test_int8_quantization_preserves_topk_recall(spark):
    """int8-quantized embeddings (4x storage cut) must keep cosine top-5
    recall >= 0.9 against exact float top-5 on the synthetic corpus, and the
    codes must actually be int8 with per-vector scales."""
    from pyspark.sql import functions as F

    from stac_catalog_builder_spark.operators.similarity import (
        cosine_topk,
        dequantize_col,
        quantize_embeddings,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = quantize_embeddings(emb)
    assert dict(q.dtypes)["q_codes"] == "array<tinyint>"
    deq = q.select(
        "vec_id",
        dequantize_col(F.col("q_codes"), F.col("q_scale")).alias("embedding"),
    )
    queries = emb.where(F.col("vec_id") < 15).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(deq, queries, k=5).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, recall


def test_cosine_topk_survives_zero_norm_vectors(spark):
    """Zero-norm (failure-mode) embeddings produce NaN cosines; they must be
    demoted, never poison the per-batch k-th threshold (which would silently
    drop a query's real neighbors)."""
    from pyspark.sql import functions as F

    from stac_catalog_builder_spark.operators.similarity import cosine_topk

    rows = [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 0.0]), (3, [0.0, 0.0]),
            (4, [0.5, 0.5])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qs = emb.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    got = cosine_topk(emb.coalesce(1), qs, k=2).collect()
    assert [(r.rank, r.neighbor_id) for r in got] == [(1, 1), (2, 4)]


def test_cosine_topk_empty_queries_returns_empty(spark):
    """ADVICE r2: zero queries must return an empty frame with the output
    schema, not raise from np.stack([])."""
    from stac_catalog_builder_spark.operators.similarity import cosine_topk

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id bigint, embedding array<float>"
    )
    qs = spark.createDataFrame([], "query_id bigint, qvec array<float>")
    out = cosine_topk(emb, qs, k=3)
    assert out.count() == 0
    assert out.columns == ["query_id", "rank", "neighbor_id", "cosine"]
